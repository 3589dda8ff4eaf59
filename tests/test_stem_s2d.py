"""Space-to-depth stem conv rewrite (ops/stem.py): exactness vs the plain conv.

The rewrite is algebraic (extra kernel taps are zeros), so in fp32 the
outputs must agree to float reduction-order tolerance, at the op level and
through the full backbone.  TPU timing lives in tools/stem_experiments.py
(measured slower on v5e at 32x128 — kept as a shape-dependent option).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rcnn_ocr_tpu.ops.stem import depth_to_space, s2d_kernel, space_to_depth_pad1


def _conv3x3_p1(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_conv_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    want = _conv3x3_p1(x, k)
    got = depth_to_space(
        jax.lax.conv_general_dilated(
            space_to_depth_pad1(x), s2d_kernel(k), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_s2d_conv_exact_wide_channels():
    # non-trivial C (the rewrite is generic, not C=3 specific)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 10, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 16, 8)).astype(np.float32))
    want = _conv3x3_p1(x, k)
    got = depth_to_space(
        jax.lax.conv_general_dilated(
            space_to_depth_pad1(x), s2d_kernel(k), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_backbone_stem_s2d_matches_default():
    """SEResNet31(stem_s2d=True) == SEResNet31() at inference in fp32."""
    from rcnn_ocr_tpu.models.seresnet31 import SEResNet31

    kwargs = dict(width_mult=0.25, dtype=jnp.float32)
    base = SEResNet31(**kwargs)
    s2d = SEResNet31(**kwargs, stem_s2d=True)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 32, 64, 3)).astype(np.float32)
    )
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want = base.apply(variables, x, train=False)
    got = s2d.apply(variables, x, train=False)  # same variables tree
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_backbone_stem_s2d_train_mode_unchanged():
    """The rewrite is inference-only: train=True must use the plain conv
    (bit-identical outputs and BN stat updates regardless of the flag)."""
    from rcnn_ocr_tpu.models.seresnet31 import SEResNet31

    kwargs = dict(width_mult=0.25, dtype=jnp.float32)
    base = SEResNet31(**kwargs)
    s2d = SEResNet31(**kwargs, stem_s2d=True)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 32, 64, 3)).astype(np.float32)
    )
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want, want_vars = base.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    got, got_vars = s2d.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        want_vars, got_vars,
    )
