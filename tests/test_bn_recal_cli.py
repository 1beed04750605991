"""train.py --bn_recalibrate integration.

The library utility (training/bn_recalibrate.py) is unit-tested in
tests/test_training.py::TestBnRecalibration; this covers the CLI wiring:
before each validation pass the driver re-walks N train batches with
frozen parameters (cycling the loader when the epoch is shorter) and the
run completes with finite metrics. The fix it exposes is the reference's
momentum-0.99 BN-statistics lag (reference models/efficientnet/
utils.py:519-521; CONVERGENCE.md records the victim run).
"""

import os
import re
import subprocess
import sys

import numpy as np

from tests.test_preemption import make_tiny_exp, _run_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bn_recalibrate_runs_before_validation(tmp_path):
    root = make_tiny_exp(tmp_path)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)

    expdir = tmp_path / "exp_recal"
    # 8 batches > the 6-step epoch: exercises the loader-cycling path.
    res = subprocess.run(
        _run_args(root, expdir, epochs=1, extra=("--bn_recalibrate", "8")),
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    assert "recalibrated BN stats on 8 train batches" in res.stdout, \
        res.stdout[-2000:]

    m = re.search(r"val_acc (\d+\.\d+)", res.stdout)
    assert m, res.stdout[-2000:]
    assert np.isfinite(float(m.group(1)))
    assert os.path.exists(expdir / "epoch_000")
