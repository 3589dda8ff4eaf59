"""Locate where uint8-fed and float32-fed eval programs diverge on TPU.

The 256-entry LUT makes device_normalize(u8) bit-exact vs the host fp32
formula (normalize_exactness_probe: 0/256).  Yet val_feed_bench still sees
decode flips.  Hypotheses:
  A) data: normalized bits differ inside the full program (fusion rewrites
     the gather) -> check normalized output bits within each program.
  B) program: identical input bits, but the u8-specialized and
     f32-specialized compiled programs produce different logits (layout /
     fusion choices change accumulation) -> feed the SAME f32 bits to the
     f32 program and compare with the u8 program's logits.
"""
import os, sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rcnn_ocr_tpu.models import RCNN
from rcnn_ocr_tpu.ops.augment import device_normalize

img_h, img_w, max_len = 32, 128, 12
B = 64
model = RCNN(num_classes=40, hidden_size=256, width_mult=1.0,
             sos_id=1, eos_id=2, pad_id=0, blank_id=None,
             dtype=jnp.bfloat16, use_pallas=False)
rng = jax.random.PRNGKey(0)
variables = model.init({"params": rng},
                       jnp.zeros((2, img_h, img_w, 3), jnp.float32),
                       text=jnp.zeros((2, max_len + 1), jnp.int32),
                       batch_max_length=max_len, method=model.init_all)
variables = jax.device_put(variables)

@jax.jit
def fwd(variables, images):
    x = device_normalize(images)
    logits = model.apply(variables, x, train=False, batch_max_length=max_len)
    return x, logits

rng_np = np.random.default_rng(0)
u8 = rng_np.integers(0, 256, (B, img_h, img_w, 3), dtype=np.uint8)
f32 = (u8.astype(np.float32) / np.float32(255.0) - np.float32(0.5)) / np.float32(0.5)

xu, lu = (np.asarray(o) for o in fwd(variables, jnp.asarray(u8)))
xf, lf = (np.asarray(o) for o in fwd(variables, jnp.asarray(f32)))

norm_mism = np.flatnonzero(xu.view(np.uint32) != xf.view(np.uint32))
print(f"normalized-x f32-bit mismatches: {norm_mism.size}/{xu.size}")
if norm_mism.size:
    flat_u, flat_f = xu.ravel(), xf.ravel()
    pix = u8.ravel()[norm_mism[:10]]
    print("  first pixels:", pix.tolist(),
          "u8-path:", flat_u[norm_mism[:5]].tolist(),
          "f32-path:", flat_f[norm_mism[:5]].tolist())

dl = np.abs(lu.astype(np.float64) - lf.astype(np.float64))
print(f"logits: max|diff|={dl.max():.3e}  mean|diff|={dl.mean():.3e}  "
      f"bit-equal={np.array_equal(lu, lf)}")
au, af = lu.argmax(-1), lf.argmax(-1)
print(f"argmax flips: {(au != af).sum()}/{au.size} "
      f"rows-affected={np.any(au != af, axis=-1).sum()}/{B}")

# B) same f32 bits through the SAME program twice -> determinism check
lf2 = np.asarray(fwd(variables, jnp.asarray(f32))[1])
print(f"f32-program determinism: bit-equal={np.array_equal(lf, lf2)}")

# feed the u8-program's own normalized output back through the f32 program:
# if THIS equals lf (it must, xu==xf) yet lu!=lf, divergence is program-level
lxu = np.asarray(fwd(variables, jnp.asarray(xu))[1])
print(f"f32-program(on u8-path normalized bits) vs f32-program(f32 feed): "
      f"bit-equal={np.array_equal(lxu, lf)}")
print(f"f32-program(on u8-path normalized bits) vs u8-program: "
      f"bit-equal={np.array_equal(lxu, lu)}  "
      f"max|diff|={np.abs(lxu.astype(np.float64)-lu.astype(np.float64)).max():.3e}")
print("platform=", jax.devices()[0].platform)
