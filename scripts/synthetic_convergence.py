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


def make_split(root: str, name: str, n_clips: int, seed: int):
    import pandas as pd
    from leaf_tpu.data.audio import write_wav
    rng = np.random.RandomState(seed)
    files, labels = [], []
    t = np.arange(SR) / SR
    os.makedirs(os.path.join(root, name), exist_ok=True)
    for i in range(n_clips):
        c = i % N_CLASSES
        # class = frequency band, 150 Hz apart; the network must resolve
        # the band through the random offset, gain, phase, and noise
        f0 = 200.0 + 150.0 * c + rng.uniform(-40.0, 40.0)
        amp = rng.uniform(0.1, 0.5)
        phase = rng.uniform(0, 2 * np.pi)
        x = amp * np.sin(2 * np.pi * f0 * t + phase) \
            + 0.05 * rng.randn(SR)
        p = os.path.join(root, name, f"clip{i:05d}.wav")
        write_wav(p, x.astype(np.float32), SR)
        files.append(p)
        labels.append(f"class{c}")
    pd.DataFrame({"files": files, "labels": labels}).to_csv(
        os.path.join(root, f"{name}.csv"), index=False)


CFG = """frontend:
    name: leaf
    default_args: True
model:
    arch: efficientnet
    num_classes: 35
    model_depth: b0
    pool: avgpool
    type: multiclass
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
    train_manifest: "train.csv"
    val_manifest: "val.csv"
    test_manifest: "test.csv"
    label_map: lbl_map.json
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=2560)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--root", type=str, default=None,
                    help="dataset/exp dir (default: fresh tempdir)")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="leaf_convergence_")
    os.makedirs(root, exist_ok=True)
    print(f"dataset/exp root: {root}", file=sys.stderr)
    make_split(root, "train", args.clips, seed=0)
    make_split(root, "val", max(args.batch, args.clips // 8), seed=1)
    make_split(root, "test", max(args.batch, args.clips // 8), seed=2)
    with open(os.path.join(root, "lbl_map.json"), "w") as f:
        json.dump({f"class{i}": i for i in range(N_CLASSES)}, f)
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root, batch=args.batch,
                           warmup=max(1, args.epochs // 6)))

    env = dict(os.environ)
    expdir = os.path.join(root, "exp")
    cmd = [sys.executable, "train.py", "--cfg_file", cfg_path,
           "--expdir", expdir, "--epochs", str(args.epochs),
           "--num_workers", "2", "--log_steps", "10", "--bf16"]
    if args.platform:
        cmd += ["--platform", args.platform]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), env=env, capture_output=True, text=True)
    train_s = time.time() - t0
    sys.stderr.write(r.stdout[-4000:] + r.stderr[-2000:])
    r.check_returncode()
    accs = re.findall(r"val_acc[=: ]+([0-9.]+)", r.stdout)

    cmd = [sys.executable, "evaluate.py", "--test_csv_name", "test.csv",
           "--exp_dir", expdir, "--meta_dir", root]
    if args.platform:
        cmd += ["--platform", args.platform]
    r2 = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), env=env, capture_output=True, text=True)
    sys.stderr.write(r2.stdout[-2000:] + r2.stderr[-1000:])
    r2.check_returncode()
    m = re.search(r"accuracy[=: ]+([0-9.]+)", r2.stdout, re.IGNORECASE)
    print(json.dumps({
        "metric": "synthetic_convergence_test_acc",
        "value": float(m.group(1)) if m else None,
        "final_val_acc": float(accs[-1]) if accs else None,
        "epochs": args.epochs,
        "train_clips": args.clips,
        "train_wall_s": round(train_s, 1),
    }))


if __name__ == "__main__":
    main()
