"""A/B: per-call train steps vs a lax.scan-fused multi-step program.

The full-step profile (BASELINE.md round-3 table) shows 13.67 ms of
device-busy work inside a healthy ~16 ms wall step — ~2.3 ms/step of
dispatch overhead that one host→device execute call per step cannot hide
over the tunneled backend. The TPU-idiomatic fix is to fuse K optimizer
steps into ONE compiled program with ``lax.scan`` (the standard JAX
"multiple steps per jit call" pattern): the host dispatches once per K
steps and the device runs the step bodies back-to-back.

This sweeps the flagship train step (Leaf + EffNet-b0, bf16) at
K ∈ {1, 4, 8, 16} on the real chip via ``bench.bench_ours`` (one timing
discipline: distinct buffers, chained on-device state, health gate).

Run: python scripts/scan_ab.py [--steps 48] [--batch 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-health", action="store_true")
    args = ap.parse_args()

    from bench import bench_ours, tunnel_health_probe

    if not args.skip_health:
        print(f"device_health_tflops: {tunnel_health_probe()}")

    for k in args.ks:
        # best of N reps: tunnel run-to-run is ±3-5%
        rates = [bench_ours(args.batch, args.steps, bf16=True,
                            steps_per_call=k) for _ in range(args.reps)]
        best = max(rates)
        print(f"K={k:3d}: {args.batch * 1e3 / best:7.2f} ms/step "
              f"{best:9.0f} clips/s   "
              f"(runs: {', '.join(f'{r:.0f}' for r in rates)})")


if __name__ == "__main__":
    main()
