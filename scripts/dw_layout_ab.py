"""A/B: depthwise-conv LAYOUT (NHWC vs NCHW) + backward attribution.

The round-3 step profile (BASELINE.md) leaves one identified backbone gap:
depthwise bwd 1.33 ms vs a ~0.9 ms HBM floor. The shift-multiply and
hybrid custom-VJP formulations are closed as measured-WORSE (dw_ab.py);
this script probes the remaining axis — the conv's data layout — and
attributes the backward between dx (transposed conv) and dw (batch-
contraction conv) per site, so a targeted fix (or a "measured NEUTRAL,
closed" verdict) is evidence-based.

For every distinct depthwise site in EffNet-b0 at the flagship input it
times, bf16, noop-subtracted, health-gated:
  - fwd / fwd+bwd in NHWC (the current nn.Conv lowering)
  - fwd / fwd+bwd in NCHW (same math, channel-major residents)
  - fwd+dx only and fwd+dw only in NHWC (backward attribution)

Run: python scripts/dw_layout_ab.py [--batch 256] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dw_ab import B0_DW_SHAPES, dw_conv  # noqa: E402
from dw_ab import N_INNER  # noqa: E402


def timed_chained(per_iter, x0, outer=8):
    """Device ms per application of ``per_iter(x_i) -> scalar``.

    dw_ab.timed_inner wall-times ONE fori_loop dispatch per reading —
    fine at the 2.5 ms RTT it was written under, meaningless at the
    ~30 ms RTT of the latency-only tunnel regime (the subtraction of two
    RTT-dominated walls is pure noise; measured sign flips). Here all
    ``outer`` dispatches chain through one accumulator and are enqueued
    WITHOUT blocking (the bench.py `_timed_loop` discipline): one barrier
    at the end, so the per-call RTT amortizes ``outer``-fold and the
    measurement is device-rate-bound. Callers still subtract a noop."""
    import time as _t

    @jax.jit
    def run(x, seed, acc):
        def body(i, a):
            xi = x * (1.0 + (seed + i).astype(x.dtype) * 1e-7)
            return a + per_iter(xi)
        return jax.lax.fori_loop(0, N_INNER, body, acc)

    acc = jnp.zeros((), jnp.float32)
    float(run(x0, jnp.zeros((), x0.dtype), acc))  # compile
    best = float("inf")
    for rep in range(2):
        acc = jnp.zeros((), jnp.float32)
        t0 = _t.perf_counter()
        for o in range(outer):
            acc = run(x0, jnp.asarray(rep * outer + o + 1, x0.dtype), acc)
        v = float(acc)
        dt = _t.perf_counter() - t0
        assert v == v
        best = min(best, dt)
    return best / (outer * N_INNER) * 1e3


def dw_conv_nchw(x, w, stride):
    """Same grouped conv with channel-major residents: x (B, C, H, W),
    kernel (k, k, 1, C) as in flax."""
    c = x.shape[1]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--skip-health", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if not args.skip_health:
        from bench import tunnel_health_probe
        print(f"device_health_tflops: {tunnel_health_probe()}")

    rng = np.random.RandomState(0)
    cols = ["nhwc fwd", "nchw fwd", "nhwc f+b", "nchw f+b",
            "nhwc f+dx", "nhwc f+dw"]
    tot = {c: 0.0 for c in cols}
    print(f"{'shape':>26} " + " ".join(f"{c:>10}" for c in cols)
          + f"   (ms, bs {args.batch}, noop-subtracted)")
    for h, wd, c, k, s, reps in B0_DW_SHAPES:
        w = jnp.asarray(rng.randn(k, k, 1, c).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        x = jnp.asarray(
            rng.randn(args.batch, h, wd, c).astype(np.float32) * 0.1,
            jnp.bfloat16)
        xc = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W) resident

        def noop(xi):
            return jnp.sum(xi.astype(jnp.float32))

        base = timed_chained(noop, x)
        base_c = timed_chained(noop, xc)

        def fwd_nhwc(xi):
            return jnp.sum(dw_conv(xi, w, s).astype(jnp.float32))

        def fwd_nchw(xi):
            return jnp.sum(dw_conv_nchw(xi, w, s).astype(jnp.float32))

        def fb_nhwc(xi):
            def loss(xx, ww):
                return jnp.sum(dw_conv(xx, ww, s).astype(jnp.float32))
            l, (dx, dw_) = jax.value_and_grad(loss, argnums=(0, 1))(xi, w)
            return l + jnp.sum(dx.astype(jnp.float32)) \
                + jnp.sum(dw_.astype(jnp.float32))

        def fb_nchw(xi):
            def loss(xx, ww):
                return jnp.sum(dw_conv_nchw(xx, ww, s).astype(jnp.float32))
            l, (dx, dw_) = jax.value_and_grad(loss, argnums=(0, 1))(xi, w)
            return l + jnp.sum(dx.astype(jnp.float32)) \
                + jnp.sum(dw_.astype(jnp.float32))

        def f_dx(xi):
            def loss(xx):
                return jnp.sum(dw_conv(xx, w, s).astype(jnp.float32))
            l, dx = jax.value_and_grad(loss)(xi)
            return l + jnp.sum(dx.astype(jnp.float32))

        def f_dw(xi):
            def loss(ww):
                return jnp.sum(dw_conv(xi, ww, s).astype(jnp.float32))
            l, dw_ = jax.value_and_grad(loss)(w)
            return l + jnp.sum(dw_.astype(jnp.float32))

        res = {
            "nhwc fwd": timed_chained(fwd_nhwc, x) - base,
            "nchw fwd": timed_chained(fwd_nchw, xc) - base_c,
            "nhwc f+b": timed_chained(fb_nhwc, x) - base,
            "nchw f+b": timed_chained(fb_nchw, xc) - base_c,
            "nhwc f+dx": timed_chained(f_dx, x) - base,
            "nhwc f+dw": timed_chained(f_dw, x) - base,
        }
        for kk in cols:
            tot[kk] += res[kk] * reps
        print(f"{str((h, wd, c, k, s)):>26} "
              + " ".join(f"{res[kk]:>10.4f}" for kk in cols)
              + (f"  x{reps}" if reps > 1 else ""))
    print(f"{'TOTAL (x reps)':>26} "
          + " ".join(f"{tot[kk]:>10.4f}" for kk in cols))


if __name__ == "__main__":
    main()
