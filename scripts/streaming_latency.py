"""Streaming-frontend latency benchmark: per-chunk cost on device.

The reference has no streaming story (long clips are re-padded
independent 1 s windows, reference test.py:57-71); leaf_tpu streams the
frontend exactly via LeafStreamer (leaf_tpu/frontend/streaming.py). This
script measures what a live-audio replica pays per chunk at several
chunk sizes, batch = number of concurrent streams:

- **device-busy ms/chunk** — summed from the trace's device "XLA Ops"
  thread (slump-stable, see step_profile.py): the accelerator cost per
  chunk a capacity plan should use;
- **wall ms p50** — host round trip per chunk call (tunnel-inflated;
  meaningful on real TPU hosts only);
- **real-time factor** — (chunk seconds of audio per stream × streams) /
  device-busy seconds: how many seconds of audio one chip ingests per
  second at that configuration.

Run from the repo root on the real chip:
    python scripts/streaming_latency.py [--chunks 640,1600,4800] [--batch 8]
Smoke on CPU: python scripts/streaming_latency.py --platform cpu \
    --chunks 1600 --batch 2 --wall-reps 4
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
    ap.add_argument("--chunks", type=str, default="640,1600,4800,16000")
    ap.add_argument("--batch", type=int, default=8,
                    help="concurrent streams per replica")
    ap.add_argument("--wall-reps", type=int, default=30)
    ap.add_argument("--trace-execs", type=int, default=8)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from step_profile import trace_program, parse_trace
    from bench import tunnel_health_probe
    from leaf_tpu.frontend import Leaf, LeafStreamer

    platform = jax.devices()[0].platform
    health = None
    if platform == "tpu":
        health = tunnel_health_probe(max_wait_s=0.0)

    sr = 16000
    leaf = Leaf(use_fused_kernel="off")
    variables = leaf.init(jax.random.PRNGKey(0),
                          jnp.zeros((args.batch, sr)))
    rng = np.random.RandomState(0)

    for chunk in [int(s) for s in args.chunks.split(",")]:
        streamer = LeafStreamer(leaf, variables, chunk_size=chunk)
        # warm past the first-call variant so we measure steady state
        streamer.process(jnp.asarray(
            rng.randn(args.batch, chunk).astype(np.float32) * 0.1))
        cell = streamer._cell("steady")
        tail_len = streamer.geometry["tail"]

        def run_chunk(x_work, _cell=cell, _v=variables, _s=streamer._pcen_s):
            frames, _ = _cell(_v, x_work, _s)
            return frames.sum()

        xs = [jnp.asarray(rng.randn(args.batch, tail_len + chunk)
                          .astype(np.float32) * 0.1)
              for _ in range(args.trace_execs)]

        tdir = f"/tmp/stream_lat_c{chunk}"
        trace_program(run_chunk, xs, tdir)
        agg = parse_trace(tdir)
        busy_ms = sum(v[1] for v in agg.values()) / 1000 / args.trace_execs

        walls = []
        for i in range(args.wall_reps):
            x = xs[i % len(xs)] * (1 + 1e-5 * i)  # distinct: no memoization
            t0 = time.perf_counter()
            float(run_chunk(x))
            walls.append((time.perf_counter() - t0) * 1000)

        audio_s = chunk / sr * args.batch
        line = {
            "metric": f"streaming_frontend_latency_{platform}",
            "chunk_samples": chunk,
            "streams": args.batch,
            "device_busy_ms": round(busy_ms, 3),
            "wall_ms_p50": round(statistics.median(walls), 2),
            "realtime_factor_busy": round(audio_s / (busy_ms / 1000), 1),
        }
        if health is not None:
            line["device_health_tflops"] = health
        print(json.dumps(line))


if __name__ == "__main__":
    main()
