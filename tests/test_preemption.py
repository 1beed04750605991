"""Preemption-safe checkpointing: SIGTERM mid-epoch → clean save + resume.

The reference has NO preemption handling (SURVEY §5 failure detection:
resume is manual via --continue_from_ckpt, reference train_xla.py:202-205).
Here train.py installs a SIGTERM handler that finishes the in-flight step,
writes epoch_{e}_preempt with meta epoch e-1, and exits 0; a follow-up run
with --continue_from_ckpt latest redoes the interrupted epoch.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 16000


def make_tiny_exp(tmp_path, lbl_name="lbl.json"):
    """Tiny on-disk experiment: 24 tone WAVs, 3 classes, cifar_resnet20
    cfg with 0.25 s clips — shared by the preemption and evaluate tests."""
    from leaf_tpu.data.audio import write_wav
    rng = np.random.RandomState(0)
    files, labels = [], []
    for i in range(24):
        n = int(0.4 * SR)
        x = 0.3 * np.sin(2 * np.pi * (300 + 100 * (i % 3))
                         * np.arange(n) / SR)
        x += 0.01 * rng.randn(n)
        p = tmp_path / f"c{i}.wav"
        write_wav(str(p), x.astype(np.float32), SR)
        files.append(str(p))
        labels.append(f"class{i % 3}")
    import pandas as pd
    pd.DataFrame({"files": files, "labels": labels}).to_csv(
        tmp_path / "train.csv", index=False)
    pd.DataFrame({"files": files[:6], "labels": labels[:6]}).to_csv(
        tmp_path / "val.csv", index=False)
    (tmp_path / lbl_name).write_text(
        json.dumps({f"class{i}": i for i in range(3)}))
    cfg = f"""frontend:
    name: leaf
    default_args: False
    n_filters: 40
model:
    arch: cifar_resnet
    model_depth: 20
    num_classes: 3
    type: multiclass
opt:
    optimizer: Adam
    lr: 1e-3
    weight_decay: 0
    scheduler: warmupcosine
    warmup_epochs: 1
    batch_size: 4
audio_config:
    feature: raw
    normalize: False
    sample_rate: {SR}
    min_duration: 0.25
    random_clip_size: 0.25
    val_clip_size: 0.25
data:
    meta_root: "{tmp_path}"
    is_lmdb: False
    train_manifest: train.csv
    val_manifest: val.csv
    test_manifest: None
    label_map: {lbl_name}
"""
    (tmp_path / "cfg.cfg").write_text(cfg)
    return tmp_path


@pytest.fixture
def tiny_exp(tmp_path):
    return make_tiny_exp(tmp_path)


def _run_args(tmp_path, expdir, epochs, extra=()):
    return [sys.executable, "-u", os.path.join(REPO, "train.py"),
            "--cfg_file", str(tmp_path / "cfg.cfg"),
            "--expdir", str(expdir), "--epochs", str(epochs),
            "--num_workers", "1", "--log_steps", "1",
            "--platform", "cpu", "--no_wandb", *extra]


def test_sigterm_checkpoints_and_resumes(tiny_exp, tmp_path):
    expdir = tmp_path / "exp"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)

    proc = subprocess.Popen(
        _run_args(tiny_exp, expdir, epochs=50),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO)
    # wait until a couple of train steps have run, then SIGTERM
    lines = []
    deadline = time.time() + 420
    stepped = 0
    for line in proc.stdout:
        lines.append(line)
        if " step " in line and "rate" in line:
            stepped += 1
            if stepped >= 2:
                proc.send_signal(signal.SIGTERM)
                break
        assert time.time() < deadline, "".join(lines[-20:])
    rest, _ = proc.communicate(timeout=300)
    lines.append(rest or "")
    out = "".join(lines)
    assert proc.returncode == 0, out[-3000:]
    assert "SIGTERM: checkpointed mid-epoch" in out, out[-3000:]

    preempts = [d for d in os.listdir(expdir) if d.endswith("_preempt")]
    assert preempts, os.listdir(expdir)
    meta = json.load(open(expdir / preempts[0] / "meta.json"))
    assert meta["epoch"] == -1  # interrupted epoch 0 → resume redoes it

    from leaf_tpu.training.checkpoint import latest_checkpoint
    assert latest_checkpoint(str(expdir)).endswith("_preempt")

    # resume: must pick the preempt save and start at epoch 0 again
    res = subprocess.run(
        _run_args(tiny_exp, expdir, epochs=1,
                  extra=("--continue_from_ckpt", "latest")),
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    assert "resumed from" in res.stdout and "_preempt" in res.stdout, \
        res.stdout[-3000:]
    assert "at epoch 0" in res.stdout, res.stdout[-2000:]
    assert "done." in res.stdout


def test_best_checkpoint_never_returns_preempt_save(tmp_path):
    """A preempt snapshot (val_acc=-1) must not win best_checkpoint even
    when it is the ONLY checkpoint — evaluate.py/export_serving.py would
    otherwise silently serve a mid-epoch model (advisor r2 finding)."""
    from leaf_tpu.training.checkpoint import best_checkpoint
    d = tmp_path / "epoch_000_preempt"
    d.mkdir()
    (d / "meta.json").write_text(json.dumps({"epoch": -1, "val_acc": -1.0}))
    assert best_checkpoint(str(tmp_path)) is None
    # once a completed epoch exists, it wins
    d2 = tmp_path / "epoch_000"
    d2.mkdir()
    (d2 / "meta.json").write_text(json.dumps({"epoch": 0, "val_acc": 0.3}))
    assert best_checkpoint(str(tmp_path)).endswith("epoch_000")


def test_rewind_steps_resets_schedule_clock():
    """rewind_steps must rewind state.step AND every optax count so a
    preempt-resume that redoes the epoch does not run warmupcosine ahead."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import tree_util
    from leaf_tpu.training.state import TrainState, rewind_steps

    params = {"w": jnp.ones((3,))}
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.scale_by_adam(),
                     optax.scale_by_schedule(lambda s: -1e-3))
    state = TrainState.create(apply_fn=lambda *a: None, params=params,
                              batch_stats={}, tx=tx)
    for _ in range(7):
        state = state.apply_gradients(grads={"w": jnp.ones((3,))})
    state = rewind_steps(state, 5)
    assert int(state.step) == 2

    counts = [leaf for path, leaf in
              tree_util.tree_flatten_with_path(state.opt_state)[0]
              if path and isinstance(path[-1], tree_util.GetAttrKey)
              and path[-1].name == "count"]
    assert counts and all(int(c) == 2 for c in counts)
    # moments untouched
    mu = state.opt_state[1].mu["w"]
    assert float(jnp.abs(mu).sum()) > 0
    # never below zero
    state = rewind_steps(state, 100)
    assert int(state.step) == 0


def test_latest_prefers_completed_epoch_over_preempt(tmp_path):
    from leaf_tpu.training.checkpoint import latest_checkpoint
    for name, epoch in (("epoch_005", 5), ("epoch_006_preempt", 5),
                        ("epoch_006", 6)):
        d = tmp_path / name
        d.mkdir()
        (d / "meta.json").write_text(json.dumps({"epoch": epoch}))
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_006")
    # without the completed epoch 6, the preempt save is newest
    import shutil
    shutil.rmtree(tmp_path / "epoch_006")
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_006_preempt")
