"""A/B: XLA grouped-conv depthwise vs a shift-multiply formulation.

The round-3 step profile (BASELINE.md) attributes 1.87 ms of the
backbone's 3.44 ms to the 48 depthwise convs: fwd 0.54 ms (≈ its HBM
floor) but bwd 1.33 ms vs a ~0.9 ms floor — XLA's transposed-conv
backward is ~1.5× off floor at EffNet-b0's small-spatial shapes. A
depthwise conv is just K·K shifted elementwise multiply-adds, which XLA
can fuse into bandwidth-bound loops with no conv machinery; autodiff of
that form gives dx as shifted pads and dw as K·K fused multiply-reduces.

This script times both formulations, fwd and fwd+bwd (grads wrt x and w),
for every distinct depthwise shape in EffNet-b0 at the flagship input
(bs 256, 1 s @ 16 kHz → (100, 40) spectrogram), bf16, health-gated.

Run: python scripts/dw_ab.py [--batch 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# (H, W, C, k, stride, repeats) — every depthwise site in EffNet-b0 at
# (100, 40) input (25 ms hop → 100 frames, 40 mel bins), NHWC.
B0_DW_SHAPES = [
    (50, 20, 32, 3, 1, 1),    # block 1
    (50, 20, 96, 3, 2, 1),    # block 2 reduce
    (25, 10, 144, 3, 1, 1),   # block 2
    (25, 10, 144, 5, 2, 1),   # block 3 reduce
    (13, 5, 240, 5, 1, 1),    # block 3
    (13, 5, 240, 3, 2, 1),    # block 4 reduce
    (7, 3, 480, 3, 1, 2),     # block 4
    (7, 3, 480, 5, 1, 1),     # block 5 reduce (stride 1)
    (7, 3, 672, 5, 1, 2),     # block 5
    (7, 3, 672, 5, 2, 1),     # block 6 reduce
    (4, 2, 1152, 5, 1, 3),    # block 6
    (4, 2, 1152, 3, 1, 1),    # block 7
]


def _same_pads(size: int, k: int, stride: int):
    """TF-SAME padding (what flax 'SAME' computes for known sizes)."""
    out = -(-size // stride)
    pad = max(0, (out - 1) * stride + k - size)
    return pad // 2, pad - pad // 2


def dw_conv(x, w, stride):
    """Current formulation: lax grouped conv, kernel (k, k, 1, C) — a
    plain same-dtype conv, exactly what flax nn.Conv(feature_group_count=C,
    dtype=bf16) lowers to in models/efficientnet.py:200-207."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def dw_shift(x, w, stride):
    """Shift-multiply formulation: y = Σ_{i,j} w[i,j,c] · x_pad slices."""
    b, h, wd, c = x.shape
    k = w.shape[0]
    ph = _same_pads(h, k, stride)
    pw = _same_pads(wd, k, stride)
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    oh = -(-h // stride)
    ow = -(-wd // stride)
    acc = jnp.zeros((b, oh, ow, c), jnp.float32)
    for i in range(k):
        for j in range(k):
            sl = jax.lax.slice(
                xp, (0, i, j, 0),
                (b, i + (oh - 1) * stride + 1, j + (ow - 1) * stride + 1, c),
                (1, stride, stride, 1))
            acc = acc + sl.astype(jnp.float32) * w[i, j, 0].astype(jnp.float32)
    return acc.astype(x.dtype)


def make_dw_hybrid(stride):
    """Shift-multiply FORWARD (≈6× faster than the grouped conv at these
    shapes) + the grouped conv's own linear-transpose BACKWARD (XLA's
    transposed-conv dx/dw, which beats autodiff-of-shifts ~5×)."""
    @jax.custom_vjp
    def f(x, w):
        return dw_shift(x, w, stride)

    def fwd(x, w):
        return f(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        dy = dy.astype(x.dtype)
        dx = jax.linear_transpose(
            lambda xx: dw_conv(xx, w, stride), x)(dy)[0]
        dw_ = jax.linear_transpose(
            lambda ww: dw_conv(x, ww, stride), w)(dy)[0]
        return dx, dw_

    f.defvjp(fwd, bwd)
    return f


N_INNER = 50


def timed_inner(per_iter, x0, outer=4):
    """Device time per application of ``per_iter(x_i) -> scalar``.

    The op runs N_INNER times inside ONE jitted fori_loop (per-call
    dispatch over the tunneled backend costs ~2.5 ms — wall-timing a
    ~0.1 ms op per call is meaningless). Each iteration sees
    x·(1 + i·1e-7) so no iteration is loop-invariant; callers subtract a
    noop baseline (same loop, identity op) to remove that multiply + the
    loop overhead."""
    @jax.jit
    def run(x, seed):
        def body(i, acc):
            xi = x * (1.0 + (seed + i).astype(x.dtype) * 1e-7)
            return acc + per_iter(xi)
        return jax.lax.fori_loop(
            0, N_INNER, body, jnp.zeros((), jnp.float32))

    float(run(x0, jnp.zeros((), x0.dtype)))  # compile
    best = np.inf
    for o in range(outer):
        seed = jnp.asarray(o + 1, x0.dtype)
        t0 = time.perf_counter()
        v = float(run(x0, seed))
        dt = time.perf_counter() - t0
        assert v == v
        best = min(best, dt)
    return best / N_INNER * 1e3


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
    tot = {"conv": [0.0, 0.0], "shift": [0.0, 0.0], "hybrid": [0.0, 0.0]}
    print(f"{'shape':>26}  {'conv fwd':>9} {'shift fwd':>9} "
          f"{'conv f+b':>9} {'shift f+b':>9} {'hyb f+b':>9}   (ms, bs "
          f"{args.batch}, noop-subtracted)")
    for h, wd, c, k, s, reps in B0_DW_SHAPES:
        w = jnp.asarray(rng.randn(k, k, 1, c).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        x0 = jnp.asarray(rng.randn(args.batch, h, wd, c)
                         .astype(np.float32), jnp.bfloat16)
        # parity first (f32 on small batch)
        xs = x0[:8].astype(jnp.float32)
        ws = w.astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(dw_conv(xs, ws, s)), np.asarray(dw_shift(xs, ws, s)),
            atol=1e-4, rtol=1e-3)

        t_noop = timed_inner(
            lambda xi: jnp.sum(xi.astype(jnp.float32)), x0)
        hyb = make_dw_hybrid(s)
        # hybrid grads ≡ conv grads (same transposed ops; f32 small batch)
        gc = jax.grad(lambda xx, ww: jnp.sum(dw_conv(xx, ww, s)
                                             .astype(jnp.float32) ** 2),
                      argnums=(0, 1))(xs, ws)
        gh = jax.grad(lambda xx, ww: jnp.sum(hyb(xx, ww)
                                             .astype(jnp.float32) ** 2),
                      argnums=(0, 1))(xs, ws)
        for a, b in zip(gc, gh):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-2)
        row = []
        impls = (("conv", lambda xx, ww: dw_conv(xx, ww, s)),
                 ("shift", lambda xx, ww: dw_shift(xx, ww, s)),
                 ("hybrid", hyb))
        for name, impl in impls:
            def loss(xx, ww, impl=impl):
                return jnp.sum(impl(xx, ww).astype(jnp.float32) ** 2)

            def fb(xi, loss=loss):
                l, (gx, gw) = jax.value_and_grad(
                    loss, argnums=(0, 1))(xi, w)
                return (l + jnp.sum(gx.astype(jnp.float32))
                        + jnp.sum(gw.astype(jnp.float32)))

            t_f = max(0.0, timed_inner(
                lambda xi, impl=impl: jnp.sum(
                    impl(xi, w).astype(jnp.float32)), x0) - t_noop)
            t_fb = max(0.0, timed_inner(fb, x0) - t_noop)
            tot[name][0] += t_f * reps
            tot[name][1] += t_fb * reps
            row += [t_f, t_fb]
        print(f"({h:3d},{wd:3d},{c:4d}) k{k} s{s} x{reps}: "
              f"{row[0]:9.3f} {row[2]:9.3f} {row[1]:9.3f} {row[3]:9.3f} "
              f"{row[5]:9.3f}   [noop {t_noop:.3f}]")
    print(f"{'TOTAL (×repeats)':>26}  conv fwd {tot['conv'][0]:.3f} "
          f"shift fwd {tot['shift'][0]:.3f} hybrid fwd {tot['hybrid'][0]:.3f}"
          f"  conv f+b {tot['conv'][1]:.3f} "
          f"shift f+b {tot['shift'][1]:.3f} hybrid f+b {tot['hybrid'][1]:.3f}")


if __name__ == "__main__":
    main()
