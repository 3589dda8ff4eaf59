"""Bidirectional LSTM as a fused `lax.scan` (TPU-native cuDNN replacement).

The reference wraps cuDNN's fused bidirectional LSTM
(`/root/reference/model/model.py:8-20`).  On TPU the same computation is
expressed so the MXU sees large matmuls:

* the input projection ``x @ W_ih`` for *all* timesteps and *both*
  directions is one einsum outside the recurrence;
* the scan body only does the hidden-to-hidden matmul, batched over the
  two directions (``[2,B,H] x [2,H,4H]``), so each step is a single fused
  MXU call instead of two;
* the reverse direction is handled by flipping its precomputed input
  projection in time, so both directions advance in the same scan.

Gate order is torch's (i, f, g, o) so reference checkpoints import 1:1
(``w_ih``/``w_hh`` transposed, ``b = b_ih + b_hh``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def lstm_cell_gates(gates: jnp.ndarray, c: jnp.ndarray, hidden: int):
    """Apply the (i, f, g, o) LSTM nonlinearity.  ``gates``: [..., 4H]."""
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class BiLSTM(nn.Module):
    """1-layer bidirectional LSTM + Linear(2H -> out).

    Mirrors the reference ``BidirectionalLSTM`` block
    (`/root/reference/model/model.py:8-20`): LSTM over [B, T, D], concat of
    forward/backward hidden states, then a Linear projection.
    """

    hidden_size: int
    out_size: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch, time, in_dim = x.shape
        hidden = self.hidden_size
        k_init = nn.initializers.lecun_normal()

        # [2, D, 4H]: dir 0 = forward, dir 1 = backward (torch order)
        w_ih = self.param("w_ih", k_init, (2, in_dim, 4 * hidden), jnp.float32)
        w_hh = self.param("w_hh", k_init, (2, hidden, 4 * hidden), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (2, 4 * hidden), jnp.float32)

        dt = self.dtype
        xc = x.astype(dt)
        # one big MXU matmul for every timestep of both directions
        x_proj = jnp.einsum(
            "btd,kdg->kbtg", xc, w_ih.astype(dt), preferred_element_type=jnp.float32
        ) + bias[:, None, None, :]
        # time-major xs with the backward stream pre-flipped:
        # xs[t, 0] = proj_fw[t], xs[t, 1] = proj_bw[T-1-t]
        xs = jnp.stack([x_proj[0], jnp.flip(x_proj[1], axis=1)], axis=0)
        xs = jnp.transpose(xs, (2, 0, 1, 3))  # [T, 2, B, 4H]

        w_hh_c = w_hh.astype(dt)

        def step(carry, x_t):
            h, c = carry  # [2, B, H] fp32
            gates = x_t + jnp.einsum(
                "kbh,khg->kbg", h.astype(dt), w_hh_c, preferred_element_type=jnp.float32
            )
            h_new, c_new = lstm_cell_gates(gates, c, hidden)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((2, batch, hidden), jnp.float32)
        c0 = jnp.zeros((2, batch, hidden), jnp.float32)
        if self.use_pallas:
            from rcnn_ocr_tpu.ops.lstm_pallas import bilstm_scan

            ys = bilstm_scan(xs, w_hh_c, hidden)
        else:
            _, ys = jax.lax.scan(step, (h0, c0), xs)  # [T, 2, B, H]

        fw = jnp.transpose(ys[:, 0], (1, 0, 2))  # [B, T, H]
        bw = jnp.transpose(jnp.flip(ys[:, 1], axis=0), (1, 0, 2))
        h_cat = jnp.concatenate([fw, bw], axis=-1).astype(dt)  # [B, T, 2H]

        out = nn.Dense(
            self.out_size, dtype=dt, param_dtype=jnp.float32, name="proj"
        )(h_cat)
        return out
