"""Serving-latency benchmark: per-batch-bucket inference cost on device.

The reference has no serving story (deployment = "load the checkpoint and
call forward", reference README.md:94-114); leaf_tpu exports AOT
artifacts per batch bucket (leaf_tpu/serving.py). This script measures
what a serving replica actually pays per request at each bucket, on the
flagship Leaf + EfficientNet-b0 model:

- **device-busy ms/exec** — summed from the trace's device "XLA Ops"
  thread, stable against tunnel-link slumps (see step_profile.py);
  this is the per-request accelerator cost and the number a capacity
  plan should use;
- **wall ms p50** — host-observed round trip with a per-call host
  transfer barrier; over the axon tunnel this includes link latency, so
  it is reported next to a health probe reading and is only meaningful
  on a healthy link (real TPU hosts do not have the tunnel hop).

Run from the repo root on the real chip:
    python scripts/serving_latency.py [--buckets 1,8,64,256] [--f32]
Smoke on CPU: python scripts/serving_latency.py --platform cpu \
    --arch cifar_resnet:20 --buckets 1,8
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=str, default="1,8,64,256")
    ap.add_argument("--wall-reps", type=int, default=30)
    ap.add_argument("--trace-execs", type=int, default=8)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--arch", type=str, default="efficientnet:b0")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from step_profile import build_programs, trace_program, parse_trace
    from bench import tunnel_health_probe

    platform = jax.devices()[0].platform
    health = None
    if platform == "tpu":
        health = tunnel_health_probe(max_wait_s=0.0)

    for b in [int(s) for s in args.buckets.split(",")]:
        _, _, run_infer = build_programs(b, bf16=not args.f32,
                                         arch=args.arch)
        key = jax.random.PRNGKey(0)
        xs = [jax.random.normal(key, (b, 16000), jnp.float32) * (0.1 + 1e-4 * i)
              for i in range(args.trace_execs)]

        tdir = f"/tmp/serving_lat_b{b}"
        trace_program(run_infer, xs, tdir)
        agg = parse_trace(tdir)
        busy_ms = sum(v[1] for v in agg.values()) / 1000 / args.trace_execs

        # Wall p50: per-call barrier (float() — block_until_ready does not
        # block through the tunnel, CLAUDE.md).
        walls = []
        for i in range(args.wall_reps):
            x = xs[i % len(xs)] * (1 + 1e-5 * i)  # distinct: no memoization
            t0 = time.perf_counter()
            float(run_infer(x))
            walls.append((time.perf_counter() - t0) * 1000)
        line = {
            "metric": f"serving_latency_{platform}",
            "batch": b,
            "device_busy_ms": round(busy_ms, 3),
            "wall_ms_p50": round(statistics.median(walls), 2),
            "wall_ms_min": round(min(walls), 2),
            "clips_per_sec_busy": round(b / (busy_ms / 1000), 1),
        }
        if health is not None:
            line["device_health_tflops"] = health
        print(json.dumps(line))


if __name__ == "__main__":
    main()
