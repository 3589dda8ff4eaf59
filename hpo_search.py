"""HPO driver CLI — the study driver the reference's README documents but
never committed (`/root/reference/README.md:11-12`: optuna_ocr.db,
"LSTM 2 512").

    python hpo_search.py --config configs/config.json --trials 20 \
        [--study ocr_hpo] [--storage-dir hpo] [--epochs-per-trial 5]

Each trial trains with sampled hyperparameters (lr, weight decay,
augmentation magnitudes, LSTM depth/width, optimizer/scheduler — the axes
visible in the reference's tuned config) over the full device mesh,
sequentially — or, with --parallel-trials N, N trials at a time, each on
its own 1/N submesh of the slice.  Uses Optuna + sqlite when installed,
otherwise the built-in searcher; results land in
<storage-dir>/<study>_results.json.
"""

import argparse
import json

from rcnn_ocr_tpu.hpo.driver import DEFAULT_SPACE, run_hpo


def main() -> int:
    ap = argparse.ArgumentParser(description="Hyperparameter search over run_training")
    ap.add_argument("--config", required=True, help="base training config JSON")
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--study", default="ocr_hpo")
    ap.add_argument("--storage-dir", default="hpo")
    ap.add_argument(
        "--epochs-per-trial", type=int, default=None,
        help="override epochs for each trial (default: config value)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--parallel-trials", type=int, default=1,
        help="run N trials concurrently, each on its own 1/N submesh of the "
        "slice (default 1: sequential trials over the full mesh)",
    )
    ap.add_argument(
        "--no-prune", action="store_true",
        help="disable epoch-level trial pruning (MedianPruner with Optuna, "
        "successive halving in the builtin backend)",
    )
    args = ap.parse_args()

    with open(args.config, "r", encoding="utf-8") as f:
        base = json.load(f)
    base.pop("exp_dir", None)  # each trial gets its own
    base.pop("resume_path", None)
    if args.epochs_per_trial is not None:
        base["epochs"] = args.epochs_per_trial

    out = run_hpo(
        base,
        n_trials=args.trials,
        study_name=args.study,
        storage_dir=args.storage_dir,
        space=DEFAULT_SPACE,
        seed=args.seed,
        parallel_trials=args.parallel_trials,
        prune=not args.no_prune,
    )
    n_pruned = sum(1 for t in out["trials"] if t.get("pruned"))
    if n_pruned:
        total_ep = sum(t.get("epochs_run") or 0 for t in out["trials"])
        print(f"pruned {n_pruned}/{len(out['trials'])} trials "
              f"({total_ep} total epochs run)")
    print(f"best value: {out['best_value']}")
    print(f"best params: {json.dumps(out['best_params'], indent=2)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
