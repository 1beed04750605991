"""Per-op device profile of the FULL flagship train step (VERDICT r2 #2).

Where kernel_profile.py dissects only the fused frontend op, this traces
the complete jitted train step (Leaf + EfficientNet-b0, bs 256, bf16 —
exactly bench.py's headline program) and attributes device time:

- name-level: top-N XLA ops by total device duration;
- category rollup: pallas frontend kernels vs convolutions vs fusions vs
  copies/transposes vs infeed, via name patterns;
- program-level cross-check: traces the frontend-only fwd+bwd and the
  inference-only programs in the same session, so
  step ≈ frontend + (backbone fwd+bwd + optimizer) can be checked against
  the name-level sums (the reference has no equivalent tooling; its hot
  loop is train_xla.py:259-294).

Run from the repo root on the real chip: python scripts/step_profile.py
[--steps 8] [--batch 256] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SR = 16000


def build_programs(batch: int, bf16: bool = True,
                   arch: str = "efficientnet:b0", t_samples: int = SR):
    """(train_step_fn, frontend_fn, infer_fn) closures over fresh buffers —
    each takes an input batch so the tunnel cannot memoize repeats."""
    from bench import _flagship_cfg
    from leaf_tpu.models import Classifier
    from leaf_tpu.frontend import Leaf
    from leaf_tpu.training import (TrainState, make_train_step,
                                   optimization_helper)

    cfg = _flagship_cfg(bf16)
    a, _, depth = arch.partition(":")
    cfg["model"]["arch"] = a
    cfg["model"]["model_depth"] = int(depth) if depth.isdigit() else depth
    model = Classifier(cfg=cfg)
    x0 = jnp.zeros((batch, t_samples), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, x0, train=False)
    tx, _, _ = optimization_helper(cfg, num_tr_steps_per_epoch=100,
                                   num_epochs=100)
    state_holder = [TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)]
    train_step = make_train_step("multiclass", donate=True)
    ys = jnp.asarray(np.arange(batch, dtype=np.int32) % 35)
    rng = jax.random.PRNGKey(1)

    def run_train(xx):
        new_state, metrics = train_step(state_holder[0], xx, ys, rng)
        state_holder[0] = new_state
        return metrics["loss"]

    fe = Leaf(compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    fe_params = fe.init(jax.random.PRNGKey(0), x0)

    @jax.jit
    def run_frontend(xx):
        def loss(pp):
            return jnp.sum(fe.apply(pp, xx) ** 2)
        l, g = jax.value_and_grad(loss)(fe_params)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), g, 0.0)

    infer_model = Classifier(cfg=cfg)

    @jax.jit
    def run_infer(xx):
        return jnp.sum(infer_model.apply(variables, xx, train=False))

    return run_train, run_frontend, run_infer


def trace_program(fn, xs, tdir: str):
    """Warm up, then trace `len(xs)` executions; returns the trace dir."""
    acc = jnp.zeros((), jnp.float32)
    for x in xs[:2]:
        acc = acc + fn(x)
    float(acc)  # tunnel barrier: only a host transfer truly blocks
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        acc = jnp.zeros((), jnp.float32)
        for x in xs:
            acc = acc + fn(x)
        float(acc)
    return tdir


def parse_trace(tdir: str):
    """name → [count, total_us, tf_op] over device OP events only.

    TPU traces expose three device threads: 'Steps' (one span per
    execution), 'XLA Modules' (one span per compiled program — it covers
    every op INCLUDING inter-op gaps), and 'XLA Ops' (the real per-op
    rows). Only 'XLA Ops' rows are device-busy time; summing the others
    double-counts and, over the tunnel, absorbs dispatch gaps (measured:
    a 45 ms/exec "total" against 14.2 ms of actual op time during a
    link slump where every op row matched healthy-tunnel durations).
    Falls back to all complete events (with a warning) when no device
    op thread exists, e.g. CPU-backend smoke runs.
    """
    agg, agg_all = {}, {}
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
                name = ev.get("name", "?")
                tf_op = ev.get("args", {}).get("tf_op", "")
                agg_all.setdefault(name, [0, 0.0, tf_op])
                agg_all[name][0] += 1
                agg_all[name][1] += ev["dur"]
                proc = pid_names.get(ev.get("pid"), "")
                thread = tid_names.get((ev.get("pid"), ev.get("tid")), "")
                if (("TPU" in proc or "/device:" in proc)
                        and thread == "XLA Ops"):
                    agg.setdefault(name, [0, 0.0, tf_op])
                    agg[name][0] += 1
                    agg[name][1] += ev["dur"]
    if not agg:
        print("WARNING: no device 'XLA Ops' rows in trace; reporting ALL "
              "events (host threads included)", file=sys.stderr)
        return agg_all
    return agg


def categorize(agg):
    """Category rollup, keyed primarily on each op's jaxpr path (tf_op):
    '/features/' is the frontend (Pallas custom-calls are the >0.2 ms
    rows; everything else on that path is XLA glue — Toeplitz slices,
    the slot-expand/split chain, segment sums), '/model/' is the
    backbone (+ the optimizer update fusions, which inherit /model/
    paths from the parameters they touch)."""
    cats = {}

    def add(label, dur):
        cats[label] = cats.get(label, 0.0) + dur

    for name, (n, dur, tf_op) in agg.items():
        per = dur / max(n, 1)
        if "/features/" in tf_op:
            if name.startswith(("features", "jvp", "transpose_jvp")) \
                    and per > 200:
                add("frontend pallas kernels", dur)
            else:
                add("frontend XLA glue", dur)
        elif "/model/" in tf_op:
            if re.search(r"conv", tf_op):
                add("backbone conv paths (+fused BN stats/opt)", dur)
            elif re.search(r"bn|batch_norm|reduce", tf_op):
                add("backbone BN/reduce paths", dur)
            else:
                add("backbone other (+optimizer fusions)", dur)
        elif re.search(r"copy|slice", name):
            add("async copies / state streaming", dur)
        elif re.search(r"adam|scale_by|count", tf_op, re.I):
            add("optimizer (tagged)", dur)
        else:
            add("other", dur)
    return cats


def report(title, agg, n_execs, top=40):
    total = sum(v[1] for v in agg.values())
    n_ops = sum(v[0] for v in agg.values())
    print(f"\n=== {title}: device-busy {total/1e3:.3f} ms over {n_execs} "
          f"execs = {total/1e3/n_execs:.3f} ms/exec "
          f"({n_ops/n_execs:.0f} ops/exec) ===")
    for label, dur in sorted(categorize(agg).items(), key=lambda kv: -kv[1]):
        print(f"  {dur/1e3/n_execs:8.3f} ms/exec  {label}")
    print(f"  top {top} ops:")
    for name, (n, dur, tf_op) in sorted(
            agg.items(), key=lambda kv: -kv[1][1])[:top]:
        print(f"  {dur/1e3/n_execs:8.3f} ms/exec  x{n:4d}  {name[:44]:46s}"
              f" {tf_op[:60]}")
    return total / 1e3 / n_execs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--clip_seconds", type=float, default=1.0,
                    help="clip length in seconds at 16 kHz (3 = VoxCeleb "
                         "shape, 10 = AudioSet shape)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--arch", type=str, default="efficientnet:b0",
                    help="backbone 'arch:depth'; cifar_resnet:20 for "
                         "fast CPU smoke runs")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu for smoke runs; "
                         "env vars are too late — sitecustomize pre-"
                         "imports jax with the tunneled TPU backend)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rng = np.random.RandomState(0)
    t_samples = int(SR * args.clip_seconds)
    xs = [jnp.asarray(
        rng.randn(args.batch, t_samples).astype("float32") * 0.1)
        for _ in range(args.steps)]
    run_train, run_frontend, run_infer = build_programs(
        args.batch, bf16=not args.f32, arch=args.arch, t_samples=t_samples)

    t_fe = report("frontend fwd+bwd",
                  parse_trace(trace_program(run_frontend, xs, "/tmp/tr_fe")),
                  args.steps, args.top)
    t_inf = report("inference (full model fwd)",
                   parse_trace(trace_program(run_infer, xs, "/tmp/tr_inf")),
                   args.steps, args.top)
    t_step = report("FULL train step",
                    parse_trace(trace_program(run_train, xs, "/tmp/tr_step")),
                    args.steps, args.top)
    print(f"\ncross-check: step {t_step:.3f} ms vs frontend {t_fe:.3f} "
          f"+ (backbone fwd+bwd + optimizer) {t_step - t_fe:.3f} ms; "
          f"full-model fwd (incl. frontend fwd) {t_inf:.3f} ms")

    # Record the trace-predicted step times for the DEFAULT headline config
    # so bench.py's floor cross-check derives from a measured artifact
    # instead of a hand-pinned constant (which goes stale-slow after every
    # kernel win and re-admits degraded captures — round 3's failure mode).
    dev = jax.devices()[0]
    if (dev.platform == "tpu" and args.batch == 256 and not args.f32
            and args.arch == "efficientnet:b0" and args.clip_seconds == 1.0):
        import datetime
        from bench import BASELINE_FILE, PIPELINED_GAP_MS
        rec = {}
        if os.path.exists(BASELINE_FILE):
            rec = json.load(open(BASELINE_FILE))
        rec.setdefault("trace_predicted", {})[dev.device_kind] = {
            "step_busy_ms": round(t_step, 3),
            "frontend_fwdbwd_busy_ms": round(t_fe, 3),
            "inference_busy_ms": round(t_inf, 3),
            "step_wall_ms": round(t_step + PIPELINED_GAP_MS, 3),
            "recorded_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
        }
        json.dump(rec, open(BASELINE_FILE, "w"), indent=2)
        print(f"recorded trace-predicted step wall "
              f"{t_step + PIPELINED_GAP_MS:.2f} ms (busy {t_step:.2f} + "
              f"pipelined gap {PIPELINED_GAP_MS}) for '{dev.device_kind}' "
              f"in {BASELINE_FILE}")


if __name__ == "__main__":
    main()
