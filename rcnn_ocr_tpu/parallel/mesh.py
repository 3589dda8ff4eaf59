"""Device mesh construction and sharding specs (the parallelism layer).

The reference has *no* distributed code of any kind (SURVEY.md §2.3); this
layer is designed fresh, TPU-first:

* **data parallelism** (the principal strategy): the batch is sharded over
  the ``data`` mesh axis; parameters are replicated; XLA turns the jitted
  train step's gradient reduction into ICI all-reduces automatically.
* **tensor parallelism** (optional, ``model`` axis): large kernels are
  sharded via GSPMD annotations (`NamedSharding` on the param tree); XLA's
  sharding propagation inserts the all-gathers/reduce-scatters.  With a
  46M-parameter model TP is about memory headroom and the HPO "LSTM 2 512"
  variants, not a throughput play.
* PP/SP/EP/CP are N/A for this workload (encoder T <= 32, decoder <= 41
  steps — see SURVEY.md §5.7); the variable-length story is width
  bucketing in the data layer.

Collectives ride ICI because every sharded axis lives inside one slice;
nothing here ever touches DCN.
"""

from __future__ import annotations

import contextlib
import re
import threading
import warnings
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DEVICE_SCOPE = threading.local()


@contextlib.contextmanager
def device_scope(devices: Sequence[Any]):
    """Pin :func:`make_mesh` (and everything built on it) to a device subset.

    Thread-local, so concurrent workloads in one process — e.g. parallel
    HPO trials (:mod:`rcnn_ocr_tpu.hpo.driver`) — each claim their own
    submesh of the slice without passing device lists through configs.
    """
    prev = getattr(_DEVICE_SCOPE, "devices", None)
    _DEVICE_SCOPE.devices = list(devices)
    try:
        yield
    finally:
        _DEVICE_SCOPE.devices = prev


def scoped_devices() -> Optional[list]:
    """The device subset pinned by :func:`device_scope` (None = all)."""
    return getattr(_DEVICE_SCOPE, "devices", None)


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` uses every device on the first axis (pure DP).  A shape
    whose product does not equal the device count falls back to pure DP over
    ALL devices (with a warning) — never raises, never silently drops chips.
    ``devices=None`` honors an enclosing :func:`device_scope`.
    """
    if devices is None:
        devices = scoped_devices()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp_shape = (n,) + (1,) * (len(axis_names) - 1)
    if shape is None:
        shape = dp_shape
    else:
        shape = tuple(int(s) for s in shape)
        if int(np.prod(shape)) != n:
            warnings.warn(
                f"mesh shape {shape} does not tile {n} device(s); "
                f"falling back to pure data-parallel {dp_shape}",
                stacklevel=2,
            )
            shape = dp_shape
    return Mesh(np.array(devices).reshape(shape), tuple(axis_names))


def data_axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(data_axis(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules: param-path regex -> PartitionSpec.  Paths are
# '/'-joined key sequences into the params pytree.  Everything unmatched is
# replicated.  The sharded dims are the big output dims (Megatron-style 1D).
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"enc_rnn\d+/w_ih$", P(None, None, "model")),  # [2, D, 4H] -> shard gates
    (r"enc_rnn\d+/w_hh$", P(None, None, "model")),
    (r"enc_rnn\d+/bias$", P(None, "model")),
    (r"enc_rnn\d+/proj/kernel$", P("model", None)),  # consume sharded 2H
    (r"attn/w_gen$", P(None, "model")),  # [H, V] -> vocab-sharded logits
    (r"attn/b_gen$", P("model")),
    (r"attn/w_emb$", P(None, "model")),
    (r"ctc_proj/kernel$", P(None, "model")),
    (r"ctc_proj/bias$", P("model")),
    (r"cnn/layer[34]_block\d+/conv\d/conv/kernel$", P(None, None, None, "model")),
)


def _iter_paths(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_paths(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, tree


def param_shardings(
    params: Any,
    mesh: Mesh,
    rules: Optional[Sequence[Tuple[str, P]]] = None,
) -> Any:
    """Map a params pytree to NamedShardings.

    With no ``model`` axis (or size-1), everything is replicated (pure DP).
    With rules, matching paths get their PartitionSpec — but only when the
    named dimension divides evenly; otherwise that param falls back to
    replication (keeps odd vocab sizes working on any mesh).
    """
    use_tp = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1
    if rules is None:
        rules = DEFAULT_TP_RULES if use_tp else ()

    compiled = [(re.compile(pat), spec) for pat, spec in rules] if use_tp else []
    model_size = mesh.shape.get("model", 1)

    def assign(path: str, leaf) -> NamedSharding:
        for pat, spec in compiled:
            if pat.search(path):
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    # divisibility against the axis the spec actually
                    # names (a custom rule may shard over any mesh axis,
                    # not just 'model')
                    axis_size = mesh.shape.get(axis, model_size)
                    if dim >= leaf.ndim or leaf.shape[dim] % axis_size != 0:
                        ok = False
                        break
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    flat = dict(_iter_paths(params))
    shardings = {path: assign(path, leaf) for path, leaf in flat.items()}

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: rebuild(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in tree.items()
            }
        return shardings[prefix]

    return rebuild(params)


def tp_report(shardings: Any) -> Dict[str, str]:
    """``{param_path: spec}`` for every param actually sharded on an axis.

    Divisibility fallbacks in :func:`param_shardings` silently replicate;
    this makes the outcome visible (used by the multichip dryrun and tests).
    """
    return {
        path: str(s.spec)
        for path, s in _iter_paths(shardings)
        if any(axis is not None for axis in s.spec)
    }


def tp_fallback_report(
    params: Any,
    mesh: Mesh,
    rules: Optional[Sequence[Tuple[str, P]]] = None,
) -> Dict[str, str]:
    """Params that MATCH a TP rule but fell back to replication.

    Classifies the replicated remainder of :func:`param_shardings`: a
    param is either (a) sharded, (b) rule-matched but indivisible on the
    model axis (THIS report — the silent-fallback set the round-4 verdict
    flagged), or (c) deliberately rule-excluded (BN scales, biases, SE
    bottlenecks, the small early-layer convs — sharding those buys
    nothing and costs collectives).  At the production shape (hidden 256,
    vocab 194) on the shipped data x model(2) mesh this set is EMPTY
    (asserted by the dryrun and tests/test_parallel.py); a model axis
    that does not divide the vocab head (e.g. 8 at vocab 194) lands the
    generator/projection here by design — pad the charset to a divisible
    vocab or use a smaller model axis.
    """
    use_tp = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1
    if not use_tp:
        return {}
    if rules is None:
        rules = DEFAULT_TP_RULES
    compiled = [re.compile(pat) for pat, _ in rules]
    # what param_shardings actually assigned (shared code path — the two
    # can't drift)
    assigned = param_shardings(params, mesh, rules)
    sharded = tp_report(assigned)

    out: Dict[str, str] = {}
    for path, leaf in _iter_paths(params):
        if path in sharded:
            continue
        if any(pat.search(path) for pat in compiled):
            out[path] = f"shape {tuple(leaf.shape)} indivisible on mesh " \
                        f"{dict(mesh.shape)}"
    return out


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put the array fields of a host batch with batch sharding."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def local_batch_rows(*arrays) -> list:
    """This process's rows of batch-sharded global arrays, row-aligned.

    Under multi-host, fetching a full batch-sharded output crashes (rows
    on other hosts are non-addressable).  This gathers only the
    ADDRESSABLE shards, sorted by global row offset and deduplicated (a
    data×model mesh replicates each row block over the model axis) — the
    same sort for every argument, so row ``i`` of one result corresponds
    to row ``i`` of the others whenever the inputs share the batch
    sharding (e.g. an eval step's decode output and the batch fields that
    produced it).
    """
    outs = []
    for arr in arrays:
        # contract check: inputs must be sharded on dim 0 (batch).  An
        # array sharded on some other dim has identical dim-0 slice
        # starts on every shard — the dedup below would then silently
        # keep ONE shard's data (a fraction of the rows) with no error.
        n_shards = len(arr.addressable_shards)
        starts = {s.index[0].start or 0 for s in arr.addressable_shards}
        if n_shards > 1 and len(starts) == 1 and any(
            (idx.start or 0) != 0
            for s in arr.addressable_shards
            for idx in s.index[1:]
        ):
            raise ValueError(
                "local_batch_rows expects batch-sharded (dim 0) arrays; "
                f"got an array sharded on a non-leading dim: {arr.sharding}"
            )
        seen = set()
        shards = []
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            if start in seen:
                continue
            seen.add(start)
            shards.append((start, np.asarray(s.data)))
        shards.sort(key=lambda t: t[0])
        outs.append(np.concatenate([d for _, d in shards], axis=0))
    return outs


def global_metric_sum(values: Sequence[float]) -> np.ndarray:
    """Sum a small host metric vector across processes (single-process:
    identity).  Every process receives the same global sums, so control
    decisions driven by validation metrics (best-slot saves, plateau
    schedulers, HPO pruning) stay bit-identical across hosts."""
    arr = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr)).sum(axis=0)


def make_process_local_batch(
    batch: Dict[str, Any], mesh: Mesh, microbatch: Optional[int] = None
) -> Dict[str, Any]:
    """Per-process batch rows -> globally sharded ``jax.Array``s (SURVEY §5.8).

    The multi-host-ready input feed: every process passes ONLY the rows its
    addressable devices consume (``global_batch / process_count`` of them,
    sampled by :class:`rcnn_ocr_tpu.data.loader.ProcessShardedBatchSampler`),
    and ``jax.make_array_from_process_local_data`` assembles the logically
    global array — no host ever holds or ships the full global batch.  With
    one process this is exactly ``device_put(v, batch_sharding(mesh))``
    (equivalence asserted in ``tests/test_parallel.py``), so training always
    runs through this path.

    ``microbatch=A`` builds the gradient-accumulation layout instead: each
    local array ``[B_local, ...]`` is viewed as ``[A, B_local/A, ...]`` and
    the global array is sharded ``P(None, data)`` — microbatch ``a`` of the
    scan in ``make_train_step(grad_accum=A)`` is then already resident,
    evenly spread over the data axis, with no in-program reshuffle.  (Under
    multi-host this assigns each process's a-th local slice to global
    microbatch ``a`` — a fixed permutation of the sampler's row order,
    which is itself arbitrary.)
    """
    pcount = jax.process_count()
    if microbatch and microbatch > 1:
        a = int(microbatch)
        sharding = NamedSharding(mesh, P(None, data_axis(mesh)))
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if v.shape[0] % a != 0:
                raise ValueError(
                    f"batch dim {v.shape[0]} of {k!r} is not divisible by "
                    f"grad_accum={a}"
                )
            v = v.reshape((a, v.shape[0] // a) + v.shape[1:])
            global_shape = (a, v.shape[1] * pcount) + v.shape[2:]
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, global_shape
            )
        return out
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        global_shape = (v.shape[0] * pcount,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(bs, v, global_shape)
    return out
