"""Model feature tests: scheduled sampling, dropblock, dtype policy, depth/width knobs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcnn_ocr_tpu.models import RCNN
from rcnn_ocr_tpu.models.dropblock import dropblock_2d


def _tiny(**kw):
    defaults = dict(num_classes=10, hidden_size=16, width_mult=0.0625, lstm_layers=1)
    defaults.update(kw)
    return RCNN(**defaults)


def test_scheduled_sampling_runs_and_shapes():
    model = _tiny(sampling_prob=0.5)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    text = jnp.ones((2, 5), jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, x, text=text, batch_max_length=4,
                   method=model.init_all)
    logits, _ = model.apply(
        v, x, text=text, train=True, batch_max_length=4,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    assert logits.shape == (2, 5, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_sampling_prob_zero_equals_teacher_forced():
    """sampling_prob=0 must take the pure teacher-forced scan path and give
    the same logits as the feedback-carrying path would with no sampling."""
    m0 = _tiny(sampling_prob=0.0, enc_dropout_p=0.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    text = jnp.ones((2, 5), jnp.int32)
    v = m0.init({"params": rng}, x, text=text, batch_max_length=4, method=m0.init_all)
    # eval mode (no dropout anywhere) -> deterministic
    a = m0.apply(v, x, text=text, train=False, batch_max_length=4)
    b = m0.apply(v, x, text=text, train=False, batch_max_length=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scheduled_sampling_grad_flows():
    """Gradients must flow through the sampling-mode scan (argmax feedback
    is non-differentiable but the logits path is)."""
    import numpy as np

    model = _tiny(sampling_prob=0.5, enc_dropout_p=0.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 32, 32, 3)) * 0.2
    text = jnp.ones((2, 5), jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, x, text=text, batch_max_length=4,
                   method=model.init_all)
    params = v["params"]
    rest = {k: val for k, val in v.items() if k != "params"}

    def loss(p):
        logits, _ = model.apply(
            {"params": p, **rest}, x, text=text, train=True, batch_max_length=4,
            rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
        )
        return jnp.mean(logits**2)

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["attn"]["w_gen"])).sum() > 0
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree_util.tree_leaves(g))


def test_dropblock_off_is_identity():
    x = jnp.ones((2, 8, 8, 4))
    out = dropblock_2d(jax.random.PRNGKey(0), x, p=0.0, block_size=3, train=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = dropblock_2d(jax.random.PRNGKey(0), x, p=0.5, block_size=3, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_dropblock_drops_blocks_and_rescales():
    x = jnp.ones((4, 16, 16, 8))
    out = np.asarray(dropblock_2d(jax.random.PRNGKey(3), x, p=0.3, block_size=4, train=True))
    assert (out == 0).any()  # something dropped
    kept = out[out > 0]
    # survivors never shrink; samples that did drop something rescale up
    assert kept.min() >= 1.0
    assert kept.max() > 1.0
    # expectation roughly preserved
    assert abs(out.mean() - 1.0) < 0.25


def test_dropblock_in_model_trains():
    model = _tiny(dropblock_p=0.2, dropblock_block_size=3)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 32, 32, 3)) * 0.3
    text = jnp.ones((2, 4), jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, x, text=text, batch_max_length=3,
                   method=model.init_all)
    logits, _ = model.apply(
        v, x, text=text, train=True, batch_max_length=3,
        rngs={"dropout": jax.random.PRNGKey(5)}, mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_bf16_policy_returns_f32_logits():
    model = _tiny(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": rng}, x, train=False, batch_max_length=3)
    # params stay fp32
    assert v["params"]["cnn"]["stem0"]["conv"]["kernel"].dtype == jnp.float32
    logits = model.apply(v, x, train=False, batch_max_length=3)
    assert logits.dtype == jnp.float32


@pytest.mark.parametrize("layers", [1, 3])
def test_lstm_depth_knob(layers):
    model = _tiny(lstm_layers=layers)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": rng}, x, train=False, batch_max_length=3)
    names = [k for k in v["params"] if k.startswith("enc_rnn")]
    assert len(names) == layers
