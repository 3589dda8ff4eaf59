"""JAX -> torch checkpoint export (`rcnn_ocr_tpu.interop.torch_export`).

The reverse of the import path: checkpoints trained in this framework must
load into the reference architecture (`/root/reference/model/model.py:166`)
with ``strict=True`` and decode identically.  Skipped when torch or the
reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

if not os.path.isdir(REFERENCE):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

NUM_CLASSES = 14
HIDDEN = 32
MAX_LEN = 5


@pytest.fixture(scope="module")
def ref_model_cls():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        class DropBlock2d(torch.nn.Identity):
            def __init__(self, p=0.0, block_size=5):
                super().__init__()

        tv_ops.DropBlock2d = DropBlock2d
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, REFERENCE)
    try:
        from model.model import RCNN as TorchRCNN  # noqa: PLC0415
    finally:
        sys.path.remove(REFERENCE)
    return TorchRCNN


@pytest.fixture(scope="module")
def jax_model():
    """A freshly-initialized JAX model (NOT torch-derived — the harder case)."""
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.models import RCNN as JaxRCNN

    model = JaxRCNN(
        num_classes=NUM_CLASSES, hidden_size=HIDDEN, sos_id=1, eos_id=2,
        pad_id=0, blank_id=None, dtype=jnp.float32,
    )
    x = np.zeros((1, 32, 64, 3), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(7)}, x, train=False, batch_max_length=MAX_LEN
    )
    # make batch stats non-trivial so running_mean/var transfer is exercised
    import jax.tree_util as jtu

    noise_rng = np.random.default_rng(11)
    variables = {
        "params": variables["params"],
        "batch_stats": jtu.tree_map(
            lambda v: np.asarray(v)
            + noise_rng.normal(0, 0.05, v.shape).astype(np.asarray(v).dtype),
            variables["batch_stats"],
        ),
    }
    return model, variables


def test_export_import_roundtrip(jax_model):
    """import(export(vars)) reproduces the variables tree exactly."""
    import jax.tree_util as jtu

    from rcnn_ocr_tpu.interop import export_torch_state_dict, import_torch_state_dict

    _, variables = jax_model
    sd = export_torch_state_dict(variables)
    back = import_torch_state_dict(sd, num_classes=NUM_CLASSES, hidden_size=HIDDEN)

    flat_a = jtu.tree_leaves_with_path(variables)
    flat_b = jtu.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va, np.float32), vb, err_msg=str(pa))


def test_export_loads_strict_and_decodes_identically(jax_model, ref_model_cls):
    """Exported state_dict strict-loads into the reference and argmax-agrees."""
    from rcnn_ocr_tpu.interop import export_torch_state_dict

    jmodel, variables = jax_model
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(variables).items()
    }
    tmodel = ref_model_cls(
        num_classes=NUM_CLASSES, hidden_size=HIDDEN, sos_id=1, eos_id=2, pad_id=0,
        blank_id=None,
    )
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), is_train=False,
            batch_max_length=MAX_LEN,
        ).numpy()
    j_logits = np.asarray(
        jmodel.apply(variables, x, train=False, batch_max_length=MAX_LEN)
    )
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=5e-4)
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_save_layouts_reopen(jax_model, tmp_path):
    """All three .pth layouts re-open through the import path AND load_model."""
    from rcnn_ocr_tpu.interop import import_torch_checkpoint, save_torch_checkpoint
    from rcnn_ocr_tpu.utils.common import load_model

    _, variables = jax_model
    itos = ["<PAD>", "<SOS>", "<EOS>"] + list("abcdefghijk")
    stoi = {s: i for i, s in enumerate(itos)}

    paths = {}
    for layout in ("full", "legacy", "bare"):
        p = str(tmp_path / f"{layout}.pth")
        save_torch_checkpoint(
            p, variables, layout=layout, itos=itos, stoi=stoi,
            config={"img_h": 32, "img_w": 64}, hidden_size=HIDDEN,
        )
        paths[layout] = p

    out_full = import_torch_checkpoint(paths["full"])
    assert out_full["itos"] == itos
    assert out_full["hidden_size"] == HIDDEN
    assert out_full["config"]["img_h"] == 32
    out_legacy = import_torch_checkpoint(paths["legacy"])
    assert out_legacy["hidden_size"] == HIDDEN
    out_bare = import_torch_checkpoint(paths["bare"], hidden_size=HIDDEN)
    for out in (out_full, out_legacy, out_bare):
        np.testing.assert_array_equal(
            out["variables"]["params"]["attn"]["w_gen"],
            np.asarray(variables["params"]["attn"]["w_gen"], np.float32),
        )

    # the framework's own loader round-trips the exported full checkpoint
    model, vars_back, charset = load_model(paths["full"])
    assert charset.num_classes == NUM_CLASSES
    assert model.hidden_size == HIDDEN
    np.testing.assert_array_equal(
        np.asarray(vars_back["params"]["attn"]["w_gen"]),
        np.asarray(variables["params"]["attn"]["w_gen"], np.float32),
    )


def test_ctc_head_skipped_and_lstm_layers_guard(jax_model):
    """ctc_proj params are not exported; lstm_layers != 2 raises."""
    from rcnn_ocr_tpu.interop import export_torch_state_dict

    _, variables = jax_model
    with_ctc = {
        "params": {**variables["params"], "ctc_proj": {"kernel": np.zeros((HIDDEN, NUM_CLASSES), np.float32), "bias": np.zeros((NUM_CLASSES,), np.float32)}},
        "batch_stats": variables["batch_stats"],
    }
    sd = export_torch_state_dict(with_ctc)
    assert not any(k.startswith("ctc") for k in sd)

    one_lstm = {
        "params": {k: v for k, v in variables["params"].items() if k != "enc_rnn1"},
        "batch_stats": variables["batch_stats"],
    }
    with pytest.raises(ValueError, match="exactly 2"):
        export_torch_state_dict(one_lstm)
