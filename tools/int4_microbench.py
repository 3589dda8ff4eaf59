"""int4 vs int8 MXU rate on the layer3 conv/GEMM shape (one chip)."""
import sys, os
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here)); sys.path.insert(0, _here)
import jax, jax.numpy as jnp, numpy as np
from _bench_util import time_fn as _time_fn

B, H, W, C = 2048, 4, 16, 512
rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(-8, 8, size=(B, H, W, C), dtype=np.int8))
k8 = jnp.asarray(rng.integers(-8, 8, size=(3, 3, C, C), dtype=np.int8))
m8 = jnp.asarray(rng.integers(-8, 8, size=(B * H * W, 9 * C), dtype=np.int8))
w8 = jnp.asarray(rng.integers(-8, 8, size=(9 * C, C), dtype=np.int8))

def conv_fn(dt):
    @jax.jit
    def f(x, k):
        y = jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.max(jnp.abs(y))
    return f

def mm_fn(dt):
    @jax.jit
    def f(m, w):
        y = jax.lax.dot_general(m.astype(dt), w.astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.max(jnp.abs(y))
    return f

flops_conv = 2 * B * H * W * 9 * C * C
flops_mm = 2 * (B * H * W) * (9 * C) * C
for name, fn, args, fl in [
    ("conv_int8", conv_fn(jnp.int8), (x8, k8), flops_conv),
    ("conv_int4", conv_fn(jnp.int4), (x8, k8), flops_conv),
    ("mm_int8", mm_fn(jnp.int8), (m8, w8), flops_mm),
    ("mm_int4", mm_fn(jnp.int4), (m8, w8), flops_mm),
]:
    try:
        dt = _time_fn(fn, *args)
        print(f"{name}: {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TOP/s")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")
