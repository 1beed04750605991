"""Trace-based A/B of single-step vs lax.scan-fused K-step training.

Wall-clock A/B over the tunnel (scripts/scan_ab.py) needs a healthy link;
this variant needs only the device trace, whose per-op durations and
module spans are slump-stable (BASELINE.md round-3 methodology). For each
program it reports, per OPTIMIZER STEP:

- device-busy ms (sum of 'XLA Ops' rows / steps) — pure compute;
- module-span ms ('XLA Modules' span / steps) — compute + every inter-op
  gap INSIDE one program execution, i.e. the device wall excluding
  host-side dispatch between executions.

The scan fusion's claim is exactly that: K steps inside ONE module span
pay host dispatch once, so wall/step on any host approaches
module_span/K. If multi's module-span/step ≈ single's busy/step, the
~2.3 ms/step dispatch gap (BASELINE.md) is fully hidden.

Run: python scripts/scan_profile.py [--batch 256] [--k 8] [--steps 8]
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from step_profile import build_programs, parse_trace, trace_program  # noqa: E402

SR = 16000


def parse_module_spans(tdir: str):
    """Total 'XLA Modules' span us + count over device threads."""
    total, count = 0.0, 0
    for f in glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        evs = data.get("traceEvents", [])
        pid_names = {m.get("pid"): m.get("args", {}).get("name", "")
                     for m in evs
                     if m.get("ph") == "M" and m.get("name") == "process_name"}
        tid_names = {(m.get("pid"), m.get("tid")):
                     m.get("args", {}).get("name", "")
                     for m in evs
                     if m.get("ph") == "M" and m.get("name") == "thread_name"}
        for ev in evs:
            if ev.get("ph") == "X" and "dur" in ev:
                proc = pid_names.get(ev.get("pid"), "")
                thread = tid_names.get((ev.get("pid"), ev.get("tid")), "")
                if (("TPU" in proc or "/device:" in proc)
                        and thread == "XLA Modules"):
                    total += ev["dur"]
                    count += 1
    return total, count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8,
                    help="single-step executions to trace (multi traces "
                         "max(2, steps//k) executions)")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--arch", type=str, default="efficientnet:b0")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bench import _flagship_cfg
    from leaf_tpu.training import (TrainState, make_train_multistep,
                                   optimization_helper)
    from leaf_tpu.models import Classifier

    rng0 = np.random.RandomState(0)
    xs = [jnp.asarray(rng0.randn(args.batch, SR).astype("float32") * 0.1)
          for _ in range(args.steps)]

    def busy_ms(tdir):
        # exclude `while.N` rows: the scan's while instruction is a
        # CONTAINER span on the XLA Ops thread covering its body ops —
        # summing it double-counts every fused step.
        agg = parse_trace(tdir)
        return sum(v[1] for k, v in agg.items()
                   if not k.startswith("while.")) / 1e3

    run_train, _, _ = build_programs(args.batch, bf16=not args.f32,
                                     arch=args.arch)
    tdir = trace_program(run_train, xs, "/tmp/tr_single")
    busy = busy_ms(tdir) / args.steps
    mod, nmod = parse_module_spans(tdir)
    mod_per = mod / 1e3 / args.steps  # total module time per step
    print(f"single-step: busy {busy:.3f} ms/step, module span "
          f"{mod_per:.3f} ms/step ({nmod} modules over {args.steps} execs)")

    # K-fused program (fresh state; same model family/config)
    cfg = _flagship_cfg(not args.f32)
    a, _, depth = args.arch.partition(":")
    cfg["model"]["arch"] = a
    cfg["model"]["model_depth"] = int(depth) if depth.isdigit() else depth
    model = Classifier(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, xs[0], train=False)
    tx, _, _ = optimization_helper(cfg, num_tr_steps_per_epoch=100,
                                   num_epochs=100)
    holder = [TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)]
    multi = make_train_multistep(args.k, "multiclass", donate=True)
    ys = jnp.tile(jnp.asarray(np.arange(args.batch, dtype=np.int32) % 35),
                  (args.k, 1))
    key = jax.random.PRNGKey(1)
    xks = [jnp.asarray(
        rng0.randn(args.k, args.batch, SR).astype("float32") * 0.1)
        for _ in range(2)]

    def run_multi(xx):
        st, m = multi(holder[0], xx, ys, key)
        holder[0] = st
        return m["loss"]

    n_exec = max(2, args.steps // args.k)
    tdir = trace_program(run_multi, [xks[i % 2] for i in range(n_exec)],
                         "/tmp/tr_multi")
    n_steps = n_exec * args.k
    busy_k = busy_ms(tdir) / n_steps
    mod, nmod = parse_module_spans(tdir)
    mod_per_k = mod / 1e3 / n_steps
    print(f"K={args.k} fused:  busy {busy_k:.3f} ms/step, module span "
          f"{mod_per_k:.3f} ms/step ({nmod} modules over {n_exec} execs)")
    print(f"\nper-step deltas (fused - single): busy {busy_k - busy:+.3f} "
          f"ms, module span {mod_per_k - mod_per:+.3f} ms")
    print("module span excludes host dispatch between executions; the "
          "fused program pays that once per K steps.")


if __name__ == "__main__":
    main()
