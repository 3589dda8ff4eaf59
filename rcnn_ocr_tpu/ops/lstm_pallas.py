"""Pallas TPU kernel for the bidirectional LSTM recurrence.

Consumes the precomputed input projections ``xs [T, 2, B, 4H]`` (both
directions, backward stream pre-flipped — see
`rcnn_ocr_tpu.models.lstm.BiLSTM`) and the hidden-to-hidden weights
``w_hh [2, H, 4H]``, and produces the hidden states ``ys [T, 2, B, H]``.

Design (cuDNN-fused-LSTM equivalent, TPU-shaped):

* grid = (batch_tiles, T): the Pallas pipeline streams one timestep block
  of ``xs`` HBM->VMEM while the previous step computes (automatic double
  buffering), so the recurrence never waits on HBM;
* h/c live in VMEM scratch across the whole T loop for a batch tile —
  zero HBM traffic for the carried state, the thing XLA's generic scan
  lowering cannot guarantee;
* both directions advance in the same step as one batched
  ``[2, TB, H] x [2, H, 4H]`` MXU contraction;
* gate order (i, f, g, o) matches the torch import path.

Differentiable via custom VJP: the backward runs `jax.vjp` over the
mathematically identical `lax.scan` reference (`_scan_reference`) —
a rematerialized backward, trading one forward recompute for not having to
hand-derive BPTT in the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ONE copy of the (i,f,g,o) gate contract — the exact ordering that makes
# torch checkpoint import work — shared with the XLA scan and the
# attention cell (models/lstm.py), so the BENCH_CHECK_PALLAS parity can
# never be broken by the two copies drifting.
from rcnn_ocr_tpu.models.lstm import lstm_cell_gates as _gates_update


def _scan_reference(xs: jnp.ndarray, w_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """lax.scan semantics both implementations must match."""
    _, _, batch, _ = xs.shape

    def step(carry, x_t):
        h, c = carry
        gates = x_t + jnp.einsum(
            "kbh,khg->kbg", h, w_hh, preferred_element_type=jnp.float32
        )
        h_new, c_new = _gates_update(gates, c, hidden)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((2, batch, hidden), jnp.float32)
    c0 = jnp.zeros((2, batch, hidden), jnp.float32)
    _, ys = jax.lax.scan(step, (h0, c0), xs)
    return ys


def _lstm_kernel(hidden: int, xs_ref, whh_ref, ys_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x_t = xs_ref[0].astype(jnp.float32)  # [2, TB, 4H]
    h = h_scr[:]
    gates = x_t + jax.lax.dot_general(
        h,
        whh_ref[:].astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    h_new, c_new = _gates_update(gates, c_scr[:], hidden)
    h_scr[:] = h_new
    c_scr[:] = c_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)


def _pick_batch_tile(batch: int, hidden: int) -> int:
    # ~2MB xs block budget at f32: 2 * TB * 4H * 4 bytes
    budget = 2 * 1024 * 1024
    for cand in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if batch % cand == 0 and 2 * cand * 4 * hidden * 4 <= budget:
            return cand
    return 1


def _bilstm_pallas(xs: jnp.ndarray, w_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    t_steps, _, batch, _ = xs.shape
    tile = _pick_batch_tile(batch, hidden)
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_lstm_kernel, hidden)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_steps, 2, batch, hidden), jnp.float32),
        grid=(batch // tile, t_steps),
        in_specs=[
            pl.BlockSpec(
                (1, 2, tile, 4 * hidden),
                lambda i, t: (t, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, tile, hidden), lambda i, t: (t, 0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile, hidden), jnp.float32),
            pltpu.VMEM((2, tile, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xs, w_hh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilstm_scan(xs: jnp.ndarray, w_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """Run the bidirectional LSTM recurrence; returns ys [T, 2, B, H] (f32)."""
    return _bilstm_pallas(xs, w_hh, hidden)


def _bilstm_fwd(xs, w_hh, hidden):
    return _bilstm_pallas(xs, w_hh, hidden), (xs, w_hh)


def _bilstm_bwd(hidden, residuals, dys):
    xs, w_hh = residuals
    # rematerialized backward through the scan reference
    _, vjp_fn = jax.vjp(lambda a, b: _scan_reference(a, b, hidden), xs, w_hh)
    dxs, dw_hh = vjp_fn(dys)
    return dxs, dw_hh


bilstm_scan.defvjp(_bilstm_fwd, _bilstm_bwd)
