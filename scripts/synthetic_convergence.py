"""End-to-end convergence run of the FLAGSHIP recipe on synthetic audio.

Real-data accuracy parity (SCv2 94.5 ± 0.3, reference README.md:75) needs
the datasets, which this environment cannot fetch (zero egress). This is
the strongest available on-hardware proxy: the actual `train.py` +
`evaluate.py` CLIs, the actual flagship cfg shape (Leaf + EfficientNet-b0,
Adam + warmup-cosine, bs 256 — cfgs/speechcommands/
efficientnet-b0-leaf-default.cfg), on a 35-class synthetic tone task that
REQUIRES learning (class = frequency band; per-clip random frequency
offset within the band, random gain, phase, and noise), run to
convergence on the device and scored by the same 1 s-window mean-logit
evaluation as the reference's test.py.

A run that reaches ≥95% test accuracy proves the full optimization path —
fused kernels' gradients, bf16 policy, schedule, checkpointing, eval —
trains a classifier end-to-end on the hardware, leaving dataset access as
the only missing piece of the 94.5% reproduction.

Three workload shapes, matching the reference's result families
(README.md:73-78):
  --arch efficientnet:b0 --task multiclass   (flagship, SCv2-shaped)
  --arch resnet:18       --task multiclass   (README.md:76 family)
  --arch efficientnet:b0 --task multilabel   (AudioSet-shaped: 1-3 tones
      per clip, k-hot labels, BCE loss, scored by mAP/mAUC/d-prime)

Run: python scripts/synthetic_convergence.py [--epochs 12] [--clips 2560]
Prints one JSON line with the final train/val/test accuracies.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SR = 16000
N_CLASSES = 35


def _tone(rng, c, t):
    """One tone from class-c's frequency band; the network must resolve
    the band through the random offset, gain, phase, and noise."""
    f0 = 200.0 + 150.0 * c + rng.uniform(-40.0, 40.0)
    amp = rng.uniform(0.1, 0.5)
    phase = rng.uniform(0, 2 * np.pi)
    return amp * np.sin(2 * np.pi * f0 * t + phase)


def make_split(root: str, name: str, n_clips: int, seed: int,
               task: str = "multiclass"):
    import pandas as pd
    from leaf_tpu.data.audio import write_wav
    rng = np.random.RandomState(seed)
    files, labels = [], []
    t = np.arange(SR) / SR
    csv_path = os.path.join(root, f"{name}.csv")
    if os.path.exists(csv_path):
        # deterministic per (name, seed, n_clips, task): reuse the cached
        # split when rerunning in the same --root (e.g. epoch sweeps).
        # The generation params ride along as extra manifest columns
        # (ignored by the dataset reader) so a rerun with a different
        # --task/--seed regenerates instead of silently training on the
        # stale split (clip counts alone can't tell them apart).
        prev = pd.read_csv(csv_path)
        if (len(prev) == n_clips and "task" in prev
                and prev["task"].iloc[0] == task
                and int(prev["seed"].iloc[0]) == seed):
            return
    os.makedirs(os.path.join(root, name), exist_ok=True)
    for i in range(n_clips):
        if task == "multilabel":
            # AudioSet-shaped: 1-3 simultaneous band tones, k-hot label
            # ('|'-delimited — commas would collide with the CSV)
            k = rng.randint(1, 4)
            cs = sorted(rng.choice(N_CLASSES, size=k, replace=False)
                        .tolist())
            x = sum(_tone(rng, c, t) for c in cs) + 0.05 * rng.randn(SR)
            labels.append("|".join(f"class{c}" for c in cs))
        else:
            c = i % N_CLASSES
            x = _tone(rng, c, t) + 0.05 * rng.randn(SR)
            labels.append(f"class{c}")
        p = os.path.join(root, name, f"clip{i:05d}.wav")
        write_wav(p, x.astype(np.float32), SR)
        files.append(p)
    pd.DataFrame({"files": files, "labels": labels,
                  "task": task, "seed": seed}).to_csv(
        os.path.join(root, f"{name}.csv"), index=False)


CFG = """frontend:
    name: leaf
    default_args: True
model:
    arch: {arch}
    num_classes: 35
    model_depth: {depth}
    pool: avgpool
    type: {task}
opt:
    optimizer: Adam
    lr: 1e-3
    momentum: 0.9
    scheduler: warmupcosine
    warmup_epochs: {warmup}
    weight_decay: 1e-4
    batch_size: {batch}
audio_config:
    feature: raw
    normalize: False
    sample_rate: 16000
    min_duration: 1
    random_clip_size: 1
    val_clip_size: 1
    mixup: False
data:
    meta_root: "{root}"
    is_lmdb: False
    in_memory: True
    train_manifest: "{train_csv}"
    val_manifest: "{val_csv}"
    test_manifest: "{test_csv}"
    label_map: lbl_map.json
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=2560)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--arch", type=str, default="efficientnet:b0",
                    help="'efficientnet:b0', 'resnet:18', 'cifar_resnet:20'")
    ap.add_argument("--task", type=str, default="multiclass",
                    choices=["multiclass", "multilabel"])
    ap.add_argument("--root", type=str, default=None,
                    help="dataset/exp dir (default: fresh tempdir)")
    ap.add_argument("--bn_recalibrate", type=int, default=0,
                    help="pass --bn_recalibrate N to evaluate.py: re-"
                         "estimate the BN running stats from N train "
                         "batches before scoring (the recorded fix for "
                         "the momentum-0.99 EMA lag on short runs — "
                         "CONVERGENCE.md's 40-epoch flagship row)")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse --root's existing expdir checkpoint and "
                         "only run evaluate.py (e.g. to score the same "
                         "run with and without --bn_recalibrate)")
    args = ap.parse_args()

    arch, depth = args.arch.split(":")
    root = args.root or tempfile.mkdtemp(prefix="leaf_convergence_")
    os.makedirs(root, exist_ok=True)
    print(f"dataset/exp root: {root}", file=sys.stderr)
    # Split names are task-keyed: the cached-split reuse in make_split
    # matches on row count alone, and multiclass/multilabel splits of the
    # same --clips would otherwise silently alias in a shared --root.
    tr, va, te = (f"{n}_{args.task}" for n in ("train", "val", "test"))
    make_split(root, tr, args.clips, seed=0, task=args.task)
    make_split(root, va, max(args.batch, args.clips // 8), seed=1,
               task=args.task)
    make_split(root, te, max(args.batch, args.clips // 8), seed=2,
               task=args.task)
    with open(os.path.join(root, "lbl_map.json"), "w") as f:
        json.dump({f"class{i}": i for i in range(N_CLASSES)}, f)
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root, batch=args.batch,
                           warmup=max(1, args.epochs // 6),
                           arch=arch, depth=depth, task=args.task,
                           train_csv=f"{tr}.csv", val_csv=f"{va}.csv",
                           test_csv=f"{te}.csv"))

    env = dict(os.environ)
    # expdir is (arch, task)-keyed for the same reason the splits are:
    # a reused --root must not alias runs (evaluate.py skips when the
    # expdir's results.txt already exists, reference test.py:88-91).
    expdir = os.path.join(root, f"exp_{arch}{depth}_{args.task}")
    cmd = [sys.executable, "train.py", "--cfg_file", cfg_path,
           "--expdir", expdir, "--epochs", str(args.epochs),
           "--num_workers", "2", "--log_steps", "10", "--bf16",
           "--labels_delimiter", "|",
           # EffNet's BN 0.99-EMA needs ~1000 steps before eval-mode
           # running stats calibrate (the reference's own recipe is 100
           # epochs); per-epoch orbax saves would dominate these short
           # synthetic epochs, so checkpoint sparsely (best epochs and
           # the last always save).
           "--save_every", str(max(1, args.epochs // 8))]
    if args.platform:
        cmd += ["--platform", args.platform]
    accs, train_s = [], 0.0
    if not args.skip_train:
        t0 = time.time()
        r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), env=env, capture_output=True,
            text=True)
        train_s = time.time() - t0
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-2000:])
        r.check_returncode()
        accs = re.findall(r"val_(?:acc|mAP)[=: ]+([0-9.]+)", r.stdout)

    cmd = [sys.executable, "evaluate.py", "--test_csv_name", f"{te}.csv",
           "--exp_dir", expdir, "--meta_dir", root,
           "--metrics", args.task, "--separator", "|"]
    if args.bn_recalibrate:
        # a reused --root must re-score: drop the skip-if-present marker
        res_txt = os.path.join(expdir, "results.txt")
        if args.skip_train and os.path.exists(res_txt):
            os.remove(res_txt)
        cmd += ["--bn_recalibrate", str(args.bn_recalibrate),
                "--train_csv_name", f"{tr}.csv"]
    if args.platform:
        cmd += ["--platform", args.platform]
    r2 = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), env=env, capture_output=True, text=True)
    sys.stderr.write(r2.stdout[-2000:] + r2.stderr[-1000:])
    r2.check_returncode()
    if args.task == "multilabel":
        m = re.search(r"mAP[=: ]+([0-9.]+)", r2.stdout)
        extra = {k: float(v) for k, v in re.findall(
            r"(mAUC|dprime)[=: ]+([0-9.]+)", r2.stdout)}
    else:
        m = re.search(r"accuracy[=: ]+([0-9.]+)", r2.stdout, re.IGNORECASE)
        extra = {}
    print(json.dumps({
        "metric": f"synthetic_convergence_test_"
                  f"{'mAP' if args.task == 'multilabel' else 'acc'}",
        "value": float(m.group(1)) if m else None,
        "final_val_metric": float(accs[-1]) if accs else None,
        "arch": args.arch, "task": args.task,
        "epochs": args.epochs,
        "train_clips": args.clips,
        "train_wall_s": round(train_s, 1),
        "bn_recalibrate": args.bn_recalibrate,
        **extra,
    }))


if __name__ == "__main__":
    main()
