import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcnn_ocr_tpu.models import RCNN, SEResNet31


@pytest.fixture(scope="module")
def small_model():
    model = RCNN(num_classes=14, hidden_size=32, with_ctc_head=True, ctc_blank_id=0)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 64, 3))
    text = jnp.zeros((2, 6), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        x,
        text=text,
        batch_max_length=5,
        method=model.init_all,
    )
    return model, variables


@pytest.mark.parametrize(
    "h,w,expect_hw",
    [(32, 128, (1, 16)), (64, 128, (3, 16)), (32, 64, (1, 8))],
)
def test_backbone_downsampling(h, w, expect_hw):
    """CNN output is [B, H', W/8, 512] — W/8, not the reference comment's W/4."""
    model = SEResNet31()
    x = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, *expect_hw, 512)


def test_encode_shape(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 32, 64, 3))
    enc = model.apply(variables, x, train=False, method=model.encode)
    assert enc.shape == (2, 8, 32)  # T = W/8, hidden


def test_teacher_forced_logits_shape(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 32, 64, 3))
    text = jnp.zeros((2, 6), jnp.int32)
    logits = model.apply(
        variables,
        x,
        text=text,
        train=True,
        batch_max_length=5,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    assert logits.shape == (2, 6, 14)  # [B, max_len+1, V]


def test_greedy_logits_shape_and_jit(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 32, 64, 3))

    @jax.jit
    def decode(v, x):
        return model.apply(v, x, train=False, batch_max_length=5)

    logits = decode(variables, x)
    assert logits.shape == (2, 6, 14)
    assert np.isfinite(np.asarray(logits)).all()


def test_ctc_head_shape(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 32, 64, 3))
    logits = model.apply(variables, x, train=False, method=model.ctc_logits)
    assert logits.shape == (2, 8, 14)  # [B, T=W/8, V]


def test_blank_masking():
    model = RCNN(num_classes=14, hidden_size=32, blank_id=3)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 64, 3))
    variables = model.init({"params": rng}, x, train=False, batch_max_length=4)
    logits = model.apply(variables, x, train=False, batch_max_length=4)
    np.testing.assert_allclose(np.asarray(logits[..., 3]), -1e4)


def test_grad_flows(small_model):
    model, variables = small_model
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    x = jnp.ones((2, 32, 64, 3)) * 0.1
    text = jnp.ones((2, 6), jnp.int32)

    def loss_fn(p):
        logits, _ = model.apply(
            {"params": p, **other},
            x,
            text=text,
            train=True,
            batch_max_length=5,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return jnp.mean(logits**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the decoder generator and a conv kernel receive nonzero grads
    assert np.abs(np.asarray(g["attn"]["w_gen"])).sum() > 0
    assert np.abs(np.asarray(g["cnn"]["stem0"]["conv"]["kernel"])).sum() > 0
