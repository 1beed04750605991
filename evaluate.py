#!/usr/bin/env python
"""Evaluate a trained checkpoint on a test manifest — the TPU-native
replacement for the reference's test.py.

Long clips are replicate-padded up to a whole number of seconds, chunked into
1-second windows, and scored as the MEAN of per-window logits
(reference: test.py:57-71,126-128) — this is how the 94.5% SCv2 number is
measured. Multiclass reports accuracy; multilabel reports mAP/mAUC/d-prime
(test.py:139-155). Results go to <exp_dir>/results.txt, skipped if present
(test.py:88-91).

Example:
  python evaluate.py --exp_dir ./exp_scv2_b0 --meta_dir ~/scv2/meta \
      --test_csv_name test.csv
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_csv_name", type=str, required=True)
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--meta_dir", type=str, required=True)
    p.add_argument("--metrics", type=str, default="multiclass",
                   choices=["multiclass", "multilabel"])
    p.add_argument("--separator", type=str, default=",")
    p.add_argument("--ckpt", type=str, default=None,
                   help="explicit checkpoint dir (default: best by val_acc)")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--compilation_cache_dir", type=str,
                   default=os.path.expanduser("~/.cache/leaf_tpu_xla"),
                   help="persistent XLA compile cache; '' disables")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard window batches over the first N devices "
                        "(default: all). An improvement over the reference's "
                        "single-core batch_size=1 test.py — AudioSet-scale "
                        "test sets keep the whole mesh busy.")
    p.add_argument("--bn_recalibrate", type=int, default=0, metavar="N",
                   help="before scoring, re-estimate the BatchNorm running "
                        "statistics from N train-manifest batches with "
                        "frozen parameters (momentum 0.99 lags short runs; "
                        "~400 batches recover 98%% of the gap). 0 = off.")
    p.add_argument("--train_csv_name", type=str, default="train.csv",
                   help="train manifest (under --meta_dir) to draw "
                        "--bn_recalibrate batches from")
    p.add_argument("--recal_batch_size", type=int, default=256)
    return p.parse_args()


def pad_to_windows(signal: np.ndarray, sr: int) -> np.ndarray:
    """(T,) → (n_windows, sr): replicate-pad to ceil(T/sr)·sr, centered,
    then reshape into 1 s windows (reference: test.py:57-71)."""
    t = signal.shape[-1]
    size = int(math.ceil(t / sr) * sr)
    padding = size - t
    offset = padding // 2
    signal = np.pad(signal, (offset, padding - offset), mode="edge")
    return signal.reshape(-1, sr)


def main(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    if args.compilation_cache_dir:
        os.makedirs(args.compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from leaf_tpu.data import RawWaveformDataset
    from leaf_tpu.data.transforms import Compose, PeakNormalization
    from leaf_tpu.models import Classifier
    from leaf_tpu.training import TrainState
    from leaf_tpu.training.checkpoint import (best_checkpoint,
                                              load_checkpoint, load_hparams)
    from leaf_tpu.training.metrics import (calculate_mAP, calculate_stats,
                                           d_prime)
    import optax

    cfg = load_hparams(args.exp_dir)
    ckpt = args.ckpt or best_checkpoint(args.exp_dir)
    assert ckpt, f"no checkpoint found under {args.exp_dir}"
    ckpt_name = os.path.basename(ckpt)
    res_path = os.path.join(args.exp_dir, "results.txt")
    if os.path.exists(res_path):
        print(f"{res_path} exists, skipping (reference test.py:88-91)")
        return

    ac = cfg["audio_config"]
    sr = int(ac["sample_rate"])
    val_tfs = Compose([PeakNormalization(sr=sr)])
    test_set = RawWaveformDataset(
        os.path.join(args.meta_dir, args.test_csv_name),
        os.path.join(args.meta_dir, "lbl_map.json"),
        ac, mode=args.metrics, transform=val_tfs, is_val=True,
        delimiter=args.separator)

    model = Classifier(cfg=cfg)
    sample = jnp.zeros((1, sr), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, sample, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=optax.identity())
    state, meta = load_checkpoint(ckpt, state, with_opt=False)
    print(f"loaded {ckpt} (val metric {meta.get('val_acc', 'n/a')})")

    # Mesh-parallel inference (↑ over the reference's batch_size=1 single
    # core, test.py:110-128): params replicated, window batches sharded over
    # the 'data' axis — identical logits, n_devices× the window throughput.
    from leaf_tpu.parallel import make_mesh, shard_batch, shard_params
    mesh = make_mesh(args.n_devices)
    n_dev = mesh.devices.size
    if n_dev > 1:
        print(f"sharding inference over {n_dev} devices")
        state = state.replace(
            params=shard_params(mesh, state.params),
            batch_stats=shard_params(mesh, state.batch_stats))

    if args.bn_recalibrate > 0:
        # Fix stale running stats post hoc (the checkpoint's params may be
        # far ahead of its momentum-0.99 BN statistics — see
        # training/bn_recalibrate.py): frozen-param train-mode passes over
        # random train-manifest crops, peak-normalized like training.
        from leaf_tpu.data import setup_dataloaders
        from leaf_tpu.data.device_augment import peak_normalize
        from leaf_tpu.data.transforms import leaf_host_crop_transforms
        from leaf_tpu.training.bn_recalibrate import recalibrate_batch_stats

        tr_clip = int(float(ac.get("random_clip_size", 1.0)) * sr)
        recal_set = RawWaveformDataset(
            os.path.join(args.meta_dir, args.train_csv_name),
            os.path.join(args.meta_dir, "lbl_map.json"),
            ac, mode=args.metrics,
            transform=leaf_host_crop_transforms(True, tr_clip),
            delimiter=args.separator)
        recal_loader, _ = setup_dataloaders(
            recal_set, None, args.recal_batch_size, target_len=tr_clip,
            multiclass=args.metrics == "multiclass", num_workers=2,
            need_val=False)

        def recal_batches(n):
            done = 0
            while done < n:
                for bx, _ in iter(recal_loader):
                    yield jnp.asarray(bx)
                    done += 1
                    if done >= n:
                        return

        print(f"recalibrating BN stats on {args.bn_recalibrate} batches "
              f"of {args.recal_batch_size} from {args.train_csv_name}")
        state = recalibrate_batch_stats(
            state, recal_batches(args.bn_recalibrate),
            jax.random.PRNGKey(0),
            preprocess=lambda _, x: peak_normalize(x))

    @jax.jit
    def forward(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    def run_windows(flat: np.ndarray) -> np.ndarray:
        """Forward (n, sr) windows, zero-padding n up to the mesh multiple
        (pad rows' logits are dropped; BN uses running stats, so pad rows
        cannot affect real ones)."""
        n = flat.shape[0]
        pad = (-n) % n_dev
        if pad:
            flat = np.concatenate(
                [flat, np.zeros((pad,) + flat.shape[1:], flat.dtype)])
        xb = (shard_batch(mesh, jnp.asarray(flat)) if n_dev > 1
              else jnp.asarray(flat))
        # f32 for the host-side metric math: under compute_dtype=bfloat16
        # the logits come back as ml_dtypes.bfloat16, which numpy keeps
        # but sklearn's check_array rejects as a non-numeric dtype
        out = forward(state.params, state.batch_stats, xb)
        return np.asarray(out.astype(jnp.float32))[:n]

    # Bucket clips by window count so each unique shape compiles ONCE and
    # clips batch together — the reference evaluates clip-by-clip at
    # batch_size=1 (test.py:116), which on an accelerator retraces per
    # length and starves the chip. Identical numbers, batched execution.
    buckets = {}
    for i in range(len(test_set)):
        x, y = test_set[i]
        windows = pad_to_windows(np.asarray(x), sr)
        buckets.setdefault(windows.shape[0], []).append((windows, y, i))

    n_done = 0
    results = [None] * len(test_set)
    max_clips_per_batch = max(64, 8 * n_dev)
    with mesh:
        for n_windows, items in sorted(buckets.items()):
            for start in range(0, len(items), max_clips_per_batch):
                chunk = items[start:start + max_clips_per_batch]
                stacked = np.stack([w for w, _, _ in chunk])
                b, nw = stacked.shape[:2]
                logits = run_windows(stacked.reshape(b * nw, sr))
                mean_logits = logits.reshape(b, nw, -1).mean(axis=1)
                for (win, y, idx), ml in zip(chunk, mean_logits):
                    results[idx] = (ml, y)
                n_done += len(chunk)
                if n_done % 512 < max_clips_per_batch:
                    print(f"{n_done}/{len(test_set)}")

    all_preds, all_gts = [], []
    for ml, y in results:
        if args.metrics == "multiclass":
            all_preds.append(int(np.argmax(ml)))
            all_gts.append(int(y))
        else:
            all_preds.append(
                np.asarray(jax.nn.sigmoid(jnp.asarray(ml)))[None])
            all_gts.append(np.asarray(y, dtype=np.float32)[None])

    if args.metrics == "multiclass":
        acc = float(np.mean(np.asarray(all_preds) == np.asarray(all_gts)))
        print(f"Accuracy: {acc:.4f}")
        with open(res_path, "w") as fd:
            fd.write("model,acc,ckpt\n")
            fd.write(f"{cfg['model']['arch']},{acc},{ckpt_name}\n")
    else:
        macro_mAP = calculate_mAP(all_preds, all_gts, mode="macro")
        preds = np.concatenate(all_preds)
        gts = np.concatenate(all_gts)
        stats = calculate_stats(preds, gts)
        mAUC = float(np.mean([s["auc"] for s in stats]))
        dp = d_prime(mAUC)
        print(f"mAP: {macro_mAP:.5f}\nmAUC: {mAUC:.5f}\ndprime: {dp:.5f}")
        with open(res_path, "w") as fd:
            fd.write("model,mAP,mAUC,dprime,ckpt\n")
            fd.write(f"{cfg['model']['arch']},{macro_mAP},{mAUC},{dp},"
                     f"{ckpt_name}\n")


if __name__ == "__main__":
    main(parse_args())
