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


class TestWandbPath:
    """Execute the wandb branches under a recording fake module — wandb is
    not installed in this image, so without the mock these lines (init,
    log, Histogram, finish; reference train_xla.py:222-225,243-244,349-350)
    would never run."""

    @pytest.fixture
    def fake_wandb(self, monkeypatch):
        import sys
        import types

        calls = {"init": [], "log": [], "finish": 0, "hist": []}
        mod = types.ModuleType("wandb")

        def init(**kw):
            calls["init"].append(kw)

        def log(data, step=None):
            calls["log"].append((data, step))

        class Histogram:
            def __init__(self, np_histogram=None):
                calls["hist"].append(np_histogram)
                self.np_histogram = np_histogram

        def finish():
            calls["finish"] += 1

        mod.init, mod.log, mod.Histogram, mod.finish = (
            init, log, Histogram, finish)
        monkeypatch.setitem(sys.modules, "wandb", mod)
        return calls

    def test_scalars_and_finish(self, tmp_path, fake_wandb):
        cfg = {"project": "leaf", "group": None, "tags": ["a", "b"]}
        lg = TrainLogger(str(tmp_path), is_master=True,
                         use_tensorboard=False, wandb_config=cfg)
        assert fake_wandb["init"] == [cfg]
        lg.log_scalars({"train/loss": 0.5, "lr": 1e-3}, step=7)
        lg.close()
        assert fake_wandb["log"] == [({"train/loss": 0.5, "lr": 1e-3}, 7)]
        assert fake_wandb["finish"] == 1

    def test_histograms_via_wandb(self, tmp_path, fake_wandb):
        """wandb.watch(log='all') equivalent: on-device histogram tuples
        must reach wandb.Histogram as a valid (counts, edges) pair, with
        the constant-tensor relative-epsilon branch producing strictly
        increasing edges."""
        import numpy as np
        from leaf_tpu.training.histograms import histogram_tree
        hists = histogram_tree({
            "w": np.random.RandomState(0).randn(32).astype(np.float32),
            "const": np.full((5,), 1e5, np.float32),
        })
        lg = TrainLogger(str(tmp_path), is_master=True,
                         use_tensorboard=False, wandb_config={"project": "x"})
        lg.log_histograms(hists, step=2)
        lg.close()
        assert len(fake_wandb["hist"]) == 2
        for counts, edges in fake_wandb["hist"]:
            counts = np.asarray(counts)
            edges = np.asarray(edges)
            assert edges.shape[0] == counts.shape[0] + 1
            assert np.all(np.diff(edges) > 0)
        # every histogram log carried the step for wandb's monotone axis
        assert all(step == 2 for _, step in fake_wandb["log"])

    def test_non_master_never_inits(self, tmp_path, fake_wandb):
        lg = TrainLogger(str(tmp_path / "x"), is_master=False,
                         wandb_config={"project": "x"})
        lg.log_scalars({"a": 1.0}, 0)
        lg.close()
        assert fake_wandb["init"] == [] and fake_wandb["log"] == []


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
