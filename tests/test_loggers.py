"""Observability tests: RateTracker, TrainLogger, profile_trace."""

import os
import time

import pytest

from leaf_tpu.training.loggers import RateTracker, TrainLogger, profile_trace


class TestRateTracker:
    def test_rates(self):
        t = RateTracker()
        t.add(100)
        time.sleep(0.6)
        t.add(100)
        assert t.rate() > 0
        assert 100 < t.global_rate() < 100000
        t.reset()
        assert t.global_rate() == 0 or t.global_rate() < 1e9


class TestTrainLogger:
    def test_master_only_writes(self, tmp_path, capsys):
        lg = TrainLogger(str(tmp_path), is_master=True, use_tensorboard=True)
        lg.print("hello")
        lg.log_scalars({"train/loss": 1.0}, step=0)
        lg.close()
        assert "hello" in capsys.readouterr().out
        assert os.path.isdir(tmp_path / "tb")

    def test_log_histograms_writes_events(self, tmp_path):
        """wandb.watch(log='all') equivalent: histogram_tree output must
        round-trip through add_histogram_raw into a tb event file."""
        pytest.importorskip("tensorboardX")
        import numpy as np
        from leaf_tpu.training.histograms import histogram_tree
        tree = {"dense": {"kernel": np.random.RandomState(0)
                          .randn(8, 4).astype(np.float32)}}
        hists = histogram_tree(tree, prefix="params/")
        assert set(hists) == {"params/dense/kernel"}
        lg = TrainLogger(str(tmp_path), is_master=True, use_tensorboard=True)
        lg.log_histograms(hists, step=3)
        lg.close()
        events = [f for f in os.listdir(tmp_path / "tb")
                  if "tfevents" in f]
        assert events
        size = sum(os.path.getsize(tmp_path / "tb" / f) for f in events)
        assert size > 100  # the histo summary actually serialized

    def test_log_histograms_large_constant_tensor(self, tmp_path):
        """Constant tensor with |value| >> 1: the bucket-edge epsilon must
        be relative (np.nextafter), not absolute — lo + 1e-12 == lo at
        1e5, which produced 65 identical bucket_limits."""
        pytest.importorskip("tensorboardX")
        import numpy as np
        from leaf_tpu.training.histograms import histogram_tree
        hists = histogram_tree({"w": np.full((7,), 1e5, np.float32)})
        lg = TrainLogger(str(tmp_path), is_master=True, use_tensorboard=True)
        lg.log_histograms(hists, step=0)  # raised/garbled before the fix
        lg.close()
        (counts, lo, hi, s, ssq) = hists["w"]
        lo, hi = float(lo), float(hi)
        edge_hi = hi if hi > lo else lo + max(abs(lo), 1.0) * 1e-6
        edges = np.linspace(lo, edge_hi, np.asarray(counts).shape[0] + 1)
        assert np.all(np.diff(edges) > 0)

    def test_log_histograms_non_master_noop(self, tmp_path):
        import numpy as np
        from leaf_tpu.training.histograms import histogram_tree
        lg = TrainLogger(str(tmp_path / "x"), is_master=False)
        lg.log_histograms(histogram_tree({"w": np.ones(3, np.float32)}), 0)
        assert not os.path.exists(tmp_path / "x")

    def test_non_master_silent(self, tmp_path, capsys):
        lg = TrainLogger(str(tmp_path / "x"), is_master=False)
        lg.print("nope")
        lg.log_scalars({"a": 1.0}, step=0)
        lg.close()
        assert capsys.readouterr().out == ""
        assert not os.path.exists(tmp_path / "x")


class TestProfileTrace:
    def test_trace_writes_files(self, tmp_path):
        import jax
        import jax.numpy as jnp
        with profile_trace(str(tmp_path / "prof")):
            x = jnp.ones((128, 128))
            (x @ x).block_until_ready()
        # jax profiler writes a plugins/profile dir
        found = list((tmp_path / "prof").rglob("*")) \
            if (tmp_path / "prof").exists() else []
        assert found, "no profiler output written"

    def test_none_logdir_noop(self):
        with profile_trace(None):
            pass
