"""DropBlock2D regularizer in pure JAX.

TPU-native replacement for ``torchvision.ops.DropBlock2d``
(`/root/reference/model/seresnet31.py:2,49-53`; off by default,
``dropblock_p = 0.0``).  A Bernoulli seed map is max-pooled to square
blocks; surviving activations are rescaled to keep the expectation.
Operates on NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropblock_2d(
    rng: jax.Array,
    x: jax.Array,
    p: float,
    block_size: int,
    train: bool,
) -> jax.Array:
    """Apply DropBlock to NHWC ``x``.  No-op when ``p<=0`` or not training."""
    if not train or p <= 0.0:
        return x
    n, h, w, c = x.shape
    bs = min(block_size, h, w)
    # seed rate gamma such that the expected dropped fraction is ~p
    valid_h = max(h - bs + 1, 1)
    valid_w = max(w - bs + 1, 1)
    gamma = (p / (bs * bs)) * (h * w) / (valid_h * valid_w)
    seeds = jax.random.bernoulli(rng, gamma, (n, valid_h, valid_w, c))
    seeds = jnp.pad(
        seeds,
        ((0, 0), (bs // 2, h - valid_h - bs // 2), (bs // 2, w - valid_w - bs // 2), (0, 0)),
    )
    # expand each seed to a bs x bs block via max-pool
    block_mask = jax.lax.reduce_window(
        seeds.astype(x.dtype),
        0.0,
        jax.lax.max,
        window_dimensions=(1, bs, bs, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    keep = 1.0 - block_mask
    denom = jnp.maximum(keep.mean(axis=(1, 2), keepdims=True), 1e-6)
    return x * keep / denom
