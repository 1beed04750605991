"""Micro-bench the fused frontend kernel stages on the TPU.

Run from the repo root (the axon TPU backend only registers there):
    python scripts/kernel_microbench.py

Times (bs 256, 1 s @ 16 kHz, bf16 compute):
  - fused op forward alone
  - fused op fwd+bwd (custom VJP)
  - full Leaf forward
  - full Leaf fwd+bwd
so the XLA-side share (PCEN, filter gen, combine) and the bwd share are
separable. Uses distinct buffers + chained accumulator (tunnel-safe).
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from leaf_tpu.frontend import Leaf
from leaf_tpu.ops.fused_frontend import fused_gabor_sqmod_lowpass

B, SR = 256, 16000
STEPS, WARMUP, NBUF = 40, 6, 8

rng = np.random.RandomState(0)
xs = [jnp.asarray(rng.randn(B, SR).astype("float32") * 0.1) for _ in range(NBUF)]
xs_bf = [x.astype(jnp.bfloat16) for x in xs]

# frozen filter bank + windows (static shapes, differentiable args)
gabor = jnp.asarray(rng.randn(401, 80).astype("float32") * 0.05)
windows = jnp.asarray(np.abs(rng.randn(40, 401)).astype("float32") * 0.01)


def timed(fn, inputs, steps=STEPS, warmup=WARMUP):
    acc = jnp.zeros((), jnp.float32)
    for i in range(warmup):
        acc = acc + fn(inputs[i % NBUF])
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(steps):
        acc = acc + fn(inputs[i % NBUF])
    v = float(acc)
    dt = time.perf_counter() - t0
    assert v == v
    return dt / steps * 1e3  # ms/step


def make_op_fwd(dt):
    @jax.jit
    def op_fwd(x):
        o = fused_gabor_sqmod_lowpass(x.astype(dt), gabor.astype(dt), windows)
        return jnp.sum(o)
    return op_fwd


def make_op_fwdbwd(dt):
    @jax.jit
    def op_fwdbwd(x):
        def loss(g, w):
            return jnp.sum(fused_gabor_sqmod_lowpass(
                x.astype(dt), g.astype(dt), w) ** 2)
        l, (dg, dw) = jax.value_and_grad(loss, argnums=(0, 1))(gabor, windows)
        return l + jnp.sum(dg) + jnp.sum(dw)
    return op_fwdbwd


leaf = Leaf(compute_dtype=jnp.bfloat16)
params = leaf.init(jax.random.PRNGKey(0), xs[0])


@jax.jit
def leaf_fwd(x):
    return jnp.sum(leaf.apply(params, x))


@jax.jit
def leaf_fwdbwd(x):
    def loss(p):
        return jnp.sum(leaf.apply(p, x) ** 2)
    l, g = jax.value_and_grad(loss)(params)
    return l + jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)


for name, fn in [("op_fwd_bf16", make_op_fwd(jnp.bfloat16)),
                 ("op_fwdbwd_bf16", make_op_fwdbwd(jnp.bfloat16)),
                 ("op_fwd_f32", make_op_fwd(jnp.float32)),
                 ("op_fwdbwd_f32", make_op_fwdbwd(jnp.float32)),
                 ("leaf_fwd", leaf_fwd), ("leaf_fwdbwd", leaf_fwdbwd)]:
    ms = timed(fn, xs)
    print(f"{name:12s} {ms:7.3f} ms/step   ({B/ms*1e3:9.1f} clips/s)")
