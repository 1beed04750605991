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
                   arch: str = "efficientnet:b0"):
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
    x0 = jnp.zeros((batch, SR), jnp.float32)
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
    """name → [count, total_us] over device-side complete events.

    Device rows live under processes named like '/device:TPU:0' (or
    'TPU:0 …'); if no such process exists in the trace (e.g. CPU-backend
    smoke runs), fall back to ALL complete events with a warning — the
    totals then include host threads and overcount.
    """
    agg, agg_all = {}, {}
    for f in glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        pid_names = {m.get("pid"): m.get("args", {}).get("name", "")
                     for m in data.get("traceEvents", [])
                     if m.get("ph") == "M" and m.get("name") == "process_name"}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                agg_all.setdefault(name, [0, 0.0])
                agg_all[name][0] += 1
                agg_all[name][1] += ev["dur"]
                proc = pid_names.get(ev.get("pid"), "")
                if "TPU" in proc or "/device:" in proc:
                    agg.setdefault(name, [0, 0.0])
                    agg[name][0] += 1
                    agg[name][1] += ev["dur"]
    if not agg:
        print("WARNING: no device-process rows in trace; reporting ALL "
              "events (host threads included)", file=sys.stderr)
        return agg_all
    return agg


_CATEGORIES = [
    # (label, regex on op name) — first match wins
    ("frontend pallas fwd", re.compile(r"jvp__|fused_gabor", re.I)),
    ("frontend pallas bwd", re.compile(r"transpose_jvp|_bwd|vjp", re.I)),
    ("convolution (backbone)", re.compile(r"convolution|conv_general", re.I)),
    ("matmul/dot", re.compile(r"\bdot\b|dot_general|matmul", re.I)),
    ("copy/transpose/reshape", re.compile(r"copy|transpose|reshape|bitcast")),
    ("reduce", re.compile(r"reduce")),
    ("fusion (elementwise glue)", re.compile(r"fusion")),
    ("infeed/outfeed/transfer", re.compile(r"infeed|outfeed|transfer", re.I)),
]


def categorize(agg):
    cats, other = {}, 0.0
    for name, (n, dur) in agg.items():
        for label, pat in _CATEGORIES:
            if pat.search(name):
                cats[label] = cats.get(label, 0.0) + dur
                break
        else:
            other += dur
    cats["other"] = other
    return cats


def report(title, agg, n_execs, top=40):
    total = sum(d for _, d in agg.values())
    print(f"\n=== {title}: total device {total/1e3:.3f} ms over {n_execs} "
          f"execs = {total/1e3/n_execs:.3f} ms/exec ===")
    for label, dur in sorted(categorize(agg).items(), key=lambda kv: -kv[1]):
        print(f"  {dur/1e3/n_execs:8.3f} ms/exec  {label}")
    print(f"  top {top} ops:")
    for name, (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]:
        print(f"  {dur/1e3/n_execs:8.3f} ms/exec  x{n:4d}  {name[:100]}")
    return total / 1e3 / n_execs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
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
    xs = [jnp.asarray(rng.randn(args.batch, SR).astype("float32") * 0.1)
          for _ in range(args.steps)]
    run_train, run_frontend, run_infer = build_programs(
        args.batch, bf16=not args.f32, arch=args.arch)

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


if __name__ == "__main__":
    main()
