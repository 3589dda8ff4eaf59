"""Fused squeeze-excite Pallas TPU kernel.

The SE block (`/root/reference/model/seresnet31.py:5-20`) is four tiny ops
— global avg-pool, two matmuls with ReLU/sigmoid, a broadcast multiply —
that each round-trip the [B, H, W, C] activation through HBM if compiled
naively.  This kernel runs the whole block in one VMEM residency: one read
of x, one write of x * gate.  (The matmuls are microscopic; the win is
memory traffic, which is what bounds this backbone on TPU.)

The op is differentiable via a custom VJP whose backward pass is plain XLA
(the backward is matmul-dominated and fuses fine); the forward Pallas
kernel is what sits on the inference hot path.

On non-TPU backends the kernel runs in Pallas interpret mode (tests), and
`se_scale_reference` provides the pure-jnp semantics both paths must match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def se_scale_reference(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA semantics: x * sigmoid(relu(mean_hw(x) @ w1) @ w2)."""
    m = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    y = jnp.maximum(m @ w1.astype(jnp.float32), 0.0)
    g = jax.nn.sigmoid(y @ w2.astype(jnp.float32))
    return x * g[:, None, None, :].astype(x.dtype)


def _se_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[:]  # [TB, H, W, C]
    m = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [TB, C]
    y = jnp.maximum(
        jnp.dot(m, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32),
        0.0,
    )
    g = jax.nn.sigmoid(
        jnp.dot(y, w2_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    )
    o_ref[:] = x * g[:, None, None, :].astype(x.dtype)


def _pick_batch_tile(batch: int, h: int, w: int, c: int, dtype) -> int:
    """Largest power-of-two batch tile dividing B that fits ~4MB of VMEM."""
    itemsize = jnp.dtype(dtype).itemsize
    budget = 4 * 1024 * 1024
    tile = 1
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if batch % cand == 0 and 2 * cand * h * w * c * itemsize <= budget:
            tile = cand
            break
    return tile


def _se_forward(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    batch, h, w, c = x.shape
    tile = _pick_batch_tile(batch, h, w, c, x.dtype)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _se_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(batch // tile,),
        in_specs=[
            pl.BlockSpec((tile, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, w1, w2)


@jax.custom_vjp
def se_scale(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    return _se_forward(x, w1, w2)


def _se_fwd(x, w1, w2):
    return _se_forward(x, w1, w2), (x, w1, w2)


def _se_bwd(residuals, dout):
    x, w1, w2 = residuals
    xf = x.astype(jnp.float32)
    df = dout.astype(jnp.float32)
    hw = x.shape[1] * x.shape[2]
    m = jnp.mean(xf, axis=(1, 2))  # [B, C]
    y_pre = m @ w1.astype(jnp.float32)
    y = jnp.maximum(y_pre, 0.0)
    g_pre = y @ w2.astype(jnp.float32)
    g = jax.nn.sigmoid(g_pre)

    dx_direct = df * g[:, None, None, :]
    dgate = jnp.sum(df * xf, axis=(1, 2))  # [B, C]
    dg_pre = dgate * g * (1.0 - g)
    dy = dg_pre @ w2.astype(jnp.float32).T
    dw2 = y.T @ dg_pre
    dy_pre = dy * (y_pre > 0.0)
    dm = dy_pre @ w1.astype(jnp.float32).T
    dw1 = m.T @ dy_pre
    dx = dx_direct + dm[:, None, None, :] / hw
    return dx.astype(x.dtype), dw1.astype(w1.dtype), dw2.astype(w2.dtype)


se_scale.defvjp(_se_fwd, _se_bwd)
