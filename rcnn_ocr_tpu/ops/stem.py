"""Space-to-depth stem convolution (exact algebraic rewrite).

The backbone stem's first convolution (3x3, stride 1, pad 1, C=3 input —
`/root/reference/model/seresnet31.py:81-84`) is MXU-hostile: its implicit
GEMM contracts over only kh*kw*C = 27 elements, so the systolic array runs
mostly on padding.  The standard TPU fix is space-to-depth: rewrite the
conv to operate on a 2x2-block-flattened image, which quarters the spatial
positions and 4x-es both contraction depth and output channels — identical
arithmetic (the extra kernel taps are zeros), better tiling.

    y = conv3x3_p1(x, K)
      = depth_to_space( conv2x2_valid( space_to_depth(pad1(x)), S2D(K) ) )

`s2d_kernel` builds S2D(K) from the ORIGINAL [3,3,C,F] parameter at trace
time, so checkpoints, the torch importer, and the int8 path are untouched.
Exactness is asserted in tests/test_stem_s2d.py; the rewrite only changes
float reduction order.

Measured on one v5e chip (tools/stem_experiments.py) — see PERF.md.
"""

from __future__ import annotations

import jax.numpy as jnp


def s2d_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,F] conv3x3-pad1 kernel -> [2,2,4C,4F] block-2 s2d kernel.

    Output-channel group (dp*2+dq)*F+o computes the original output at row
    parity dp / column parity dq; input-channel group (sr*2+sc)*C+c reads
    the padded input at parities (sr, sc).
    """
    kh, kw, c, f = k.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"s2d rewrite expects a 3x3 kernel, got {kh}x{kw}")
    groups = []
    for dp in range(2):
        for dq in range(2):
            # pad the kernel to 4x4 at offset (dp, dq), then s2d it: tap
            # (u, v) lands at block (a, b), parity (sr, sc) with
            # dp+u = 2a+sr, dq+v = 2b+sc — exactly the input's s2d indexing.
            kp = jnp.zeros((4, 4, c, f), k.dtype).at[dp:dp + 3, dq:dq + 3].set(k)
            kp = kp.reshape(2, 2, 2, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
            groups.append(kp.reshape(2, 2, 4 * c, f))
    return jnp.concatenate(groups, axis=-1)


def space_to_depth_pad1(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> pad 1 -> block-2 s2d [B,(H+2)/2,(W+2)/2,4C]."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(b, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h + 2) // 2, (w + 2) // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,4F] (parity-major channel groups) -> [B,2H,2W,F]."""
    b, h, w, c4 = y.shape
    f = c4 // 4
    y = y.reshape(b, h, w, 2, 2, f).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, f)
