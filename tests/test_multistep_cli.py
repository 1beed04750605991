"""train.py --steps_per_call integration.

Numerical equivalence of the K-fused program (including the remainder
fallback and the augment/int16-wire ingredients the driver adds) is
asserted in-process in tests/test_training.py — subprocess-level param
comparison is invalid here because the host transform pipeline is not
run-to-run bit-deterministic (two IDENTICAL K=1 runs of this tiny
experiment differ by ~1e-3 in params: threaded loaders consume host RNG
in timing-dependent order, same as the reference's DataLoader workers).
This test covers what only the CLI can: the grouped feed drives a full
epoch (4-group + 2 remainder singles), the steps_done accounting yields
the right step count/metrics, and the checkpoint loads back.
"""

import os
import re
import subprocess

import numpy as np

from tests.test_preemption import make_tiny_exp, _run_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_steps_per_call_runs_epoch_and_checkpoints(tmp_path):
    root = make_tiny_exp(tmp_path)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)

    expdir = tmp_path / "exp_k4"
    res = subprocess.run(
        _run_args(root, expdir, epochs=1, extra=("--steps_per_call", "4")),
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]

    # 24 clips / batch 4 = 6 steps: one fused 4-group, then 2 singles.
    # The "step N/6" log lines must show the true optimizer-step indices
    # (the fused call reports the index of its LAST inner step).
    steps = [int(m.group(1)) for m in
             re.finditer(r"step (\d+)/6 ", res.stdout)]
    assert steps and steps[-1] == 5, res.stdout[-2000:]

    m = re.search(r"tr_loss (\d+\.\d+)", res.stdout)
    assert m, res.stdout[-2000:]
    assert np.isfinite(float(m.group(1)))

    from leaf_tpu.training.checkpoint import _restore_raw
    restored, meta = _restore_raw(str(expdir / "epoch_000"))
    assert meta["epoch"] == 0
    assert restored["step"] == 6  # all 6 optimizer steps ran
