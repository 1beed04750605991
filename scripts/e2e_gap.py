"""Decompose the end-to-end vs device-step throughput gap (VERDICT r2 #4).

train.py runs ~7.5k clips/s over the tunneled chip while the pure device
step runs ~15.8k. This measures, in ONE session on the same dataset and
flagship model (Leaf + EfficientNet-b0, bs 256, bf16):

  loader_only      host pipeline rate (decode/cache + crop + collate)
  h2d_only         host→device transfer per batch (f32 vs int16 wire)
  step_only        pure device train-step rate (bench.py's headline)
  e2e_sync         loader + synchronous place + step (no overlap)
  e2e_prefetch     train.py's actual path: prefetch_to_device overlap

If e2e_prefetch ≈ 1/(1/step_only_rate + h2d_ms) the transfer is NOT
overlapping compute (the tunnel serializes puts with execution — real TPU
hosts don't); if e2e_prefetch ≈ step_only the feed is fully hidden, which
is the MpDeviceLoader behavior the design targets (reference:
train_xla.py:195-196).

Run from the repo root: python scripts/e2e_gap.py [--clips 4096]
Writes JSON to stdout; paste the table into BASELINE.md.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SR = 16000


def make_dataset(root: str, n_clips: int):
    """Unique 1 s tone WAVs (35 classes) + manifest + label map."""
    import pandas as pd
    from leaf_tpu.data.audio import write_wav
    rng = np.random.RandomState(0)
    files, labels = [], []
    t = np.arange(SR) / SR
    for i in range(n_clips):
        f0 = 200.0 + 13.7 * i  # unique per clip — no two batches equal
        x = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.randn(SR)
        p = os.path.join(root, f"clip{i:05d}.wav")
        write_wav(p, x.astype(np.float32), SR)
        files.append(p)
        labels.append(f"class{i % 35}")
    pd.DataFrame({"files": files, "labels": labels}).to_csv(
        os.path.join(root, "train.csv"), index=False)
    with open(os.path.join(root, "lbl.json"), "w") as f:
        json.dump({f"class{i}": i for i in range(35)}, f)


def build_loader(root: str, batch: int, wire: str):
    from leaf_tpu.data import RawWaveformDataset, setup_dataloaders
    from leaf_tpu.data.transforms import leaf_host_crop_transforms
    ac = {"sample_rate": SR, "min_duration": 1.0, "random_clip_size": 1.0,
          "val_clip_size": 1.0, "normalize": False, "feature": "raw"}
    ds = RawWaveformDataset(
        os.path.join(root, "train.csv"), os.path.join(root, "lbl.json"), ac,
        mode="multiclass", transform=leaf_host_crop_transforms(True, SR),
        in_memory=True, wire_dtype=wire)
    tr, _ = setup_dataloaders(ds, ds, batch, target_len=SR,
                              val_target_len=SR, multiclass=True,
                              num_workers=2, need_val=False)
    return tr


def timed_epochs(fn, loader, epochs: int, batch: int):
    """Run fn over `epochs` full passes, return clips/s of the LAST pass
    (first passes warm the in-memory cache / compile)."""
    rate = 0.0
    for ep in range(epochs):
        loader.set_epoch(ep)
        t0 = time.perf_counter()
        n = fn(loader)
        dt = time.perf_counter() - t0
        rate = n * batch / dt
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--root", type=str, default=None,
                    help="reuse an existing generated dataset dir")
    ap.add_argument("--arch", type=str, default="efficientnet:b0",
                    help="backbone 'arch:depth' — default the flagship; "
                         "use cifar_resnet:20 for fast CPU smoke runs")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu for smoke runs; "
                         "env vars are too late — sitecustomize pre-"
                         "imports jax with the tunneled TPU backend)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from bench import _flagship_cfg
    from leaf_tpu.models import Classifier
    from leaf_tpu.training import (TrainState, make_train_step,
                                   optimization_helper)
    from leaf_tpu.parallel import make_mesh, shard_batch
    from leaf_tpu.data.loader import prefetch_to_device
    from leaf_tpu.data.device_augment import leaf_device_augment

    root = args.root or tempfile.mkdtemp(prefix="e2e_gap_")
    if not os.path.exists(os.path.join(root, "train.csv")):
        print(f"generating {args.clips} clips in {root}", file=sys.stderr)
        make_dataset(root, args.clips)

    mesh = make_mesh()
    cfg = _flagship_cfg(bf16=True)
    arch, _, depth = args.arch.partition(":")
    cfg["model"]["arch"] = arch
    cfg["model"]["model_depth"] = int(depth) if depth.isdigit() else depth
    model = Classifier(cfg=cfg)
    x0 = jnp.zeros((args.batch, SR), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, x0, train=False)
    tx, _, _ = optimization_helper(cfg, num_tr_steps_per_epoch=100,
                                   num_epochs=100)

    def fresh_state():
        # deep-copy the buffers: the train step donates its state, so each
        # measurement needs params/stats the previous one didn't consume
        v = jax.tree_util.tree_map(jnp.array, variables)
        return TrainState.create(
            apply_fn=model.apply, params=v["params"],
            batch_stats=v["batch_stats"], tx=tx)

    train_step = make_train_step("multiclass", donate=True,
                                 augment_fn=leaf_device_augment)
    rng = jax.random.PRNGKey(1)

    def place(batch_tuple):
        bx, by = batch_tuple
        return (shard_batch(mesh, jnp.asarray(bx)),
                shard_batch(mesh, jnp.asarray(by)))

    out = {"batch": args.batch, "clips": args.clips,
           "device": jax.devices()[0].device_kind}

    for wire in ("int16", "float32"):
        loader = build_loader(root, args.batch, wire)

        # -- loader only (host pipeline; epoch 1 warms the in-memory cache)
        def loader_only(ld):
            n = 0
            for bx, by in ld:
                n += 1
            return n
        out[f"loader_only_clips_per_sec_{wire}"] = round(
            timed_epochs(loader_only, loader, args.epochs, args.batch), 1)

        # -- h2d only: place each host batch, force completion via a
        # 1-element readback (block_until_ready does not block through
        # the tunnel). Batches are unique within the epoch → no caching.
        host_batches = list(loader)
        t0 = time.perf_counter()
        for hb in host_batches:
            dx, dy = place(hb)
            float(dx[0, 0])
        dt = time.perf_counter() - t0
        out[f"h2d_ms_per_batch_{wire}"] = round(
            dt / len(host_batches) * 1e3, 2)
        out[f"h2d_only_clips_per_sec_{wire}"] = round(
            len(host_batches) * args.batch / dt, 1)

        # -- pure device step rate on pre-staged unique device batches
        if "step_only_clips_per_sec" not in out:
            dev_batches = [place(hb) for hb in host_batches[:8]]
            float(dev_batches[-1][0][0, 0])
            state = fresh_state()
            state, m = train_step(state, *dev_batches[0], rng)  # compile
            float(m["loss"])
            t0 = time.perf_counter()
            steps = 0
            for rep in range(3):
                for dx, dy in dev_batches:
                    state, m = train_step(state, dx, dy, rng)
                    steps += 1
            float(m["loss"])
            dt = time.perf_counter() - t0
            out["step_only_clips_per_sec"] = round(
                steps * args.batch / dt, 1)

        # -- e2e without overlap (synchronous place)
        def e2e_sync(ld):
            st = [fresh_state()]
            n = 0
            m = None
            for hb in ld:
                dx, dy = place(hb)
                st[0], m = train_step(st[0], dx, dy, rng)
                n += 1
            float(m["loss"])
            return n
        out[f"e2e_sync_clips_per_sec_{wire}"] = round(
            timed_epochs(e2e_sync, loader, 2, args.batch), 1)

        # -- e2e with prefetch_to_device (train.py's actual path)
        def e2e_prefetch(ld):
            st = [fresh_state()]
            n = 0
            m = None
            for dx, dy in prefetch_to_device(iter(ld), place):
                st[0], m = train_step(st[0], dx, dy, rng)
                n += 1
            float(m["loss"])
            return n
        out[f"e2e_prefetch_clips_per_sec_{wire}"] = round(
            timed_epochs(e2e_prefetch, loader, 2, args.batch), 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
