"""Trace the fused op fwd+bwd and dump per-op device durations.

Run from the repo root: python scripts/kernel_profile.py
Parses the perfetto trace jax.profiler writes and aggregates event
durations by name — the `jvp__`/`transpose_jvp___` rows are the forward/
backward Pallas group kernels; `fusion` rows are the XLA glue.
"""
import glob
import gzip
import json
import os
import shutil
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from leaf_tpu.ops.fused_frontend import fused_gabor_sqmod_lowpass

B, SR = 256, 16000
rng = np.random.RandomState(0)
xs = [jnp.asarray(rng.randn(B, SR).astype("float32") * 0.1).astype(jnp.bfloat16)
      for _ in range(4)]
gabor = jnp.asarray(rng.randn(401, 80).astype("float32") * 0.05)
windows = jnp.asarray(np.abs(rng.randn(40, 401)).astype("float32") * 0.01)


@jax.jit
def op_fwdbwd(x):
    def loss(g, w):
        return jnp.sum(fused_gabor_sqmod_lowpass(
            x, g.astype(jnp.bfloat16), w) ** 2)
    l, (dg, dw) = jax.value_and_grad(loss, argnums=(0, 1))(gabor, windows)
    return l + jnp.sum(dg) + jnp.sum(dw)


acc = jnp.zeros((), jnp.float32)
for i in range(4):
    acc = acc + op_fwdbwd(xs[i])
float(acc)

tdir = "/tmp/ktrace"
shutil.rmtree(tdir, ignore_errors=True)
with jax.profiler.trace(tdir):
    acc = jnp.zeros((), jnp.float32)
    for i in range(4):
        acc = acc + op_fwdbwd(xs[i])
    float(acc)

# parse the perfetto trace
files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, file=sys.stderr)
agg = {}
for f in files:
    data = json.load(gzip.open(f))
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid = ev.get("pid", -1)
            agg.setdefault(name, [0, 0.0])
            agg[name][0] += 1
            agg[name][1] += ev["dur"]
items = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
for name, (n, dur) in items:
    print(f"{dur/1e3:9.3f} ms  x{n:5d}  {name[:110]}")
