"""evaluate.py integration: train 1 epoch, evaluate the checkpoint.

Covers the reference test.py flow end-to-end (reference: test.py:74-155):
best-checkpoint selection, 1 s-window mean-logits scoring, results.txt
write, and the skip-if-results-exist behavior.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_preemption import make_tiny_exp, _run_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 16000


@pytest.fixture
def trained_exp(tmp_path):
    root = make_tiny_exp(tmp_path, lbl_name="lbl_map.json")
    # test manifest: reuse the training files (tiny smoke; accuracy is
    # whatever the 1-epoch model gives — the flow is what's under test)
    import pandas as pd
    df = pd.read_csv(root / "train.csv")
    df.iloc[:8].to_csv(root / "test.csv", index=False)
    expdir = tmp_path / "exp"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(_run_args(root, expdir, epochs=1),
                         capture_output=True, text=True, timeout=420,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    return root, expdir, env


def test_evaluate_writes_results_and_skips_if_present(trained_exp):
    root, expdir, env = trained_exp
    args = [sys.executable, "-u", os.path.join(REPO, "evaluate.py"),
            "--exp_dir", str(expdir), "--meta_dir", str(root),
            "--test_csv_name", "test.csv", "--metrics", "multiclass",
            "--platform", "cpu"]
    res = subprocess.run(args, capture_output=True, text=True, timeout=420,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    res_path = os.path.join(expdir, "results.txt")
    assert os.path.exists(res_path), res.stdout[-2000:]
    body = open(res_path).read()
    # CSV: "model,acc,ckpt" header + one row (reference results.txt role)
    lines = [ln for ln in body.strip().splitlines() if ln]
    assert lines[0].split(",")[1] == "acc", body
    acc = float(lines[1].split(",")[1])
    assert 0.0 <= acc <= 1.0, body
    assert "epoch_" in lines[1], body

    # second run must skip (reference test.py:88-91)
    res2 = subprocess.run(args, capture_output=True, text=True, timeout=420,
                          env=env, cwd=REPO)
    assert res2.returncode == 0
    assert "skipping" in res2.stdout, res2.stdout[-2000:]
    assert open(res_path).read() == body  # unchanged

    # --bn_recalibrate N: pre-eval BN-statistics re-estimation from the
    # train manifest (frozen params). Reuses the fixture's checkpoint; the
    # tiny 1-epoch model's accuracy may move, but the flow must complete
    # and still write a well-formed results row.
    os.remove(res_path)
    res3 = subprocess.run(args + ["--bn_recalibrate", "2",
                                  "--recal_batch_size", "4"],
                          capture_output=True, text=True, timeout=420,
                          env=env, cwd=REPO)
    assert res3.returncode == 0, res3.stdout[-3000:] + res3.stderr[-2000:]
    assert "recalibrating BN stats on 2 batches" in res3.stdout, \
        res3.stdout[-2000:]
    lines3 = open(res_path).read().strip().splitlines()
    acc3 = float(lines3[1].split(",")[1])
    assert 0.0 <= acc3 <= 1.0


def test_mesh_parallel_evaluate_matches_single_device(trained_exp):
    """evaluate.py sharded over an 8-fake-device mesh must reproduce the
    single-device results.txt exactly (an ↑ over the reference's
    batch_size=1 test.py; window batches shard over 'data', pad rows
    dropped)."""
    root, expdir, env = trained_exp
    base = [sys.executable, "-u", os.path.join(REPO, "evaluate.py"),
            "--exp_dir", str(expdir), "--meta_dir", str(root),
            "--test_csv_name", "test.csv", "--metrics", "multiclass",
            "--platform", "cpu"]
    res_path = os.path.join(expdir, "results.txt")

    res1 = subprocess.run(base, capture_output=True, text=True, timeout=420,
                          env=env, cwd=REPO)
    assert res1.returncode == 0, res1.stdout[-3000:] + res1.stderr[-2000:]
    single = open(res_path).read()
    os.remove(res_path)

    env8 = {**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    res8 = subprocess.run(base, capture_output=True, text=True, timeout=420,
                          env=env8, cwd=REPO)
    assert res8.returncode == 0, res8.stdout[-3000:] + res8.stderr[-2000:]
    assert "sharding inference over 8 devices" in res8.stdout, \
        res8.stdout[-2000:]
    assert open(res_path).read() == single
