"""Training-stack tests: config schema, schedules, plateau controller,
torch-parity of optimizer semantics, jitted train/eval steps end-to-end,
metrics vs sklearn direct computation."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.training import (
    ReduceLROnPlateau,
    TrainState,
    get_config,
    make_eval_step,
    make_train_step,
    mixup,
    optimization_helper,
)
from leaf_tpu.training.optim import step_schedule, warmup_cosine_schedule
from leaf_tpu.training import metrics as M


CFG_YAML = """
frontend:
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
    warmup_epochs: 10
    weight_decay: 1e-4
    batch_size: 256
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
    train_manifest: "train.csv"
    val_manifest: "val.csv"
    test_manifest: None
    label_map: lbl_map.json
"""


class TestConfig:
    def test_flagship_cfg_roundtrip(self, tmp_path):
        cfg_file = tmp_path / "exp.cfg"
        cfg_file.write_text(CFG_YAML.format(root=str(tmp_path)))
        cfg = get_config(str(cfg_file))
        # compulsory values survive
        assert cfg["model"]["arch"] == "efficientnet"
        assert cfg["opt"]["batch_size"] == 256
        # optional defaults injected (reference config_parser.py:64-84)
        assert cfg["opt"]["gamma"] == 0.1
        assert cfg["opt"]["agc_clip_factor"] == 0.01
        assert cfg["audio_config"]["mixup"] is False
        # data paths resolved against meta_root
        assert cfg["data"]["train"] == str(tmp_path / "train.csv")
        assert cfg["data"]["labels"] == str(tmp_path / "lbl_map.json")
        # 'None' test manifest dropped
        assert "test" not in cfg["data"]

    def test_missing_section_raises(self, tmp_path):
        cfg_file = tmp_path / "bad.cfg"
        cfg_file.write_text("frontend:\n    name: leaf\n")
        with pytest.raises(KeyError):
            get_config(str(cfg_file))


class TestSchedules:
    def test_warmup_cosine_matches_hf_formula(self):
        lr, warm, total = 1e-3, 100, 1000
        sched = warmup_cosine_schedule(lr, warm, total)
        # linear warmup
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(50)), lr * 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), lr, rtol=1e-6)
        # cosine half-way: progress=(550-100)/900=0.5 → 0.5·lr
        np.testing.assert_allclose(float(sched(550)), lr * 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(sched(1000)), 0.0, atol=1e-9)

    def test_step_schedule(self):
        sched = step_schedule(1e-2, step_size_epochs=30, gamma=0.1,
                              steps_per_epoch=10)
        np.testing.assert_allclose(float(sched(0)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(sched(299)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(sched(300)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(600)), 1e-4, rtol=1e-6)

    def test_plateau_reduces_after_patience(self):
        ctl = ReduceLROnPlateau(base_lr=1.0, factor=0.1, patience=2)
        assert ctl.step(0.5) == 1.0  # new best
        assert ctl.step(0.5) == 1.0  # bad 1
        assert ctl.step(0.5) == 1.0  # bad 2
        assert ctl.step(0.5) == pytest.approx(0.1)  # bad 3 > patience
        # state dict round trip
        state = ctl.state_dict()
        ctl2 = ReduceLROnPlateau(base_lr=1.0)
        ctl2.load_state_dict(state)
        assert ctl2.lr == pytest.approx(0.1)

    def test_plateau_min_lr(self):
        ctl = ReduceLROnPlateau(base_lr=1e-5, factor=0.1, patience=0)
        ctl.step(1.0)
        for _ in range(5):
            ctl.step(0.0)
        assert ctl.lr == pytest.approx(1e-6)

    @pytest.mark.parametrize("mode", ["max", "min"])
    def test_plateau_matches_torch_on_signed_metrics(self, mode):
        """Torch-parity including NEGATIVE metrics (torch rel-threshold mode
        compares against best·(1±eps) unconditionally); regression for the
        best<=0 deviation documented in round 1."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(7)
        # signed metric walk crossing zero, incl. near-threshold values
        metrics = np.concatenate([
            rng.uniform(-2, 2, 40),
            [-10.0, -10.04, -10.06, -9.99, 0.0, 0.0, 0.004, 0.006],
        ])
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode=mode, factor=0.1, patience=3, threshold=5e-3,
            threshold_mode="rel", min_lr=1e-6)
        ours = ReduceLROnPlateau(base_lr=1.0, factor=0.1, patience=3,
                                 threshold=5e-3, mode=mode)
        for m in metrics:
            tsched.step(float(m))
            our_lr = ours.step(float(m))
            assert our_lr == pytest.approx(opt.param_groups[0]["lr"]), m


class TestOptimizerParity:
    """Our optax chains must match torch optimizer semantics step-for-step."""

    def _torch_reference(self, opt_name, lr, wd, steps, grads_np, w0):
        import torch
        w = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float64))
        if opt_name == "Adam":
            opt = torch.optim.Adam([w], lr=lr, weight_decay=wd)
        else:
            opt = torch.optim.SGD([w], lr=lr, weight_decay=wd,
                                  momentum=0.9, nesterov=True)
        out = []
        for g in grads_np:
            opt.zero_grad()
            w.grad = torch.tensor(g, dtype=torch.float64)
            opt.step()
            out.append(w.detach().numpy().copy())
        return np.array(out)

    @pytest.mark.parametrize("opt_name", ["Adam", "SGD"])
    def test_matches_torch(self, opt_name):
        rng = np.random.RandomState(0)
        w0 = rng.randn(5)
        grads_np = rng.randn(8, 5)
        lr, wd = 1e-2, 1e-4
        torch_traj = self._torch_reference(opt_name, lr, wd, 8, grads_np, w0)

        cfg = {"opt": {"optimizer": opt_name, "lr": lr, "weight_decay": wd,
                       "momentum": 0.9, "nesterov": True,
                       "scheduler": "step", "step_size": 1000, "gamma": 0.1}}
        tx, _, _ = optimization_helper(cfg, num_tr_steps_per_epoch=1)
        params = jnp.asarray(w0)
        opt_state = tx.init(params)
        ours = []
        for g in grads_np:
            updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
            params = params + updates
            ours.append(np.asarray(params))
        # float32 on our side vs float64 torch — tolerances accordingly
        np.testing.assert_allclose(np.array(ours), torch_traj,
                                   rtol=2e-4, atol=2e-6)

    def test_reduce_scheduler_injects_lr(self):
        cfg = {"opt": {"optimizer": "SGD", "lr": 0.1, "momentum": 0.0,
                       "nesterov": False, "scheduler": "reduce",
                       "weight_decay": 0.0, "gamma": 0.5, "patience": 0}}
        tx, ctl, name = optimization_helper(cfg)
        assert name == "reduce" and ctl is not None
        params = jnp.ones(3)
        opt_state = tx.init(params)
        g = jnp.ones(3)
        updates, opt_state = tx.update(g, opt_state, params)
        np.testing.assert_allclose(np.asarray(updates), -0.1, rtol=1e-6)
        # plateau → halve lr, inject, next update uses it
        ctl.step(1.0)
        new_lr = ctl.step(0.0)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr)
        updates, opt_state = tx.update(g, opt_state, params)
        np.testing.assert_allclose(np.asarray(updates), -0.05, rtol=1e-6)


def _tiny_classifier_state(model_type="multiclass", num_classes=5,
                           scheduler="warmupcosine"):
    from leaf_tpu.models import Classifier
    cfg = {
        "frontend": {"name": "leaf", "default_args": True},
        "audio_config": {"sample_rate": 16000},
        "model": {"arch": "cifar_resnet", "model_depth": 20,
                  "num_classes": num_classes, "type": model_type},
        "opt": {"optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-4,
                "scheduler": scheduler, "warmup_epochs": 1,
                "batch_size": 4},
    }
    model = Classifier(cfg=cfg)
    x = jnp.zeros((4, 16000), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx, ctl, _ = optimization_helper(
        cfg, num_tr_steps_per_epoch=2, num_epochs=2)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)
    return state, cfg


class TestSteps:
    def test_train_step_multiclass_learns(self):
        state, _ = _tiny_classifier_state()
        step = make_train_step("multiclass")
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = jnp.array([0, 1, 2, 3])
        rng = jax.random.PRNGKey(7)
        losses = []
        for i in range(4):
            state, metrics = step(state, x, y, rng)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 4
        assert losses[-1] < losses[0], losses  # memorizing 4 samples
        assert np.isfinite(losses).all()

    def test_multistep_matches_sequential_single_steps(self):
        """make_train_multistep(K) (one lax.scan-fused program) must be
        numerically identical to K sequential make_train_step calls: same
        final params/opt-state/batch_stats, loss mean, and correct/count
        sums — the per-step PRNG folds on state.step in both paths."""
        from leaf_tpu.training import make_train_multistep

        k = 3
        state_a, _ = _tiny_classifier_state()
        state_b, _ = _tiny_classifier_state()
        rng = jax.random.PRNGKey(7)
        rs = np.random.RandomState(11)
        xs = jnp.asarray(rs.randn(k, 4, 16000).astype(np.float32) * 0.1)
        ys = jnp.asarray(rs.randint(0, 5, size=(k, 4)).astype(np.int32))

        step = make_train_step("multiclass", donate=False)
        losses, corrects, counts = [], 0, 0
        for i in range(k):
            state_a, m = step(state_a, xs[i], ys[i], rng)
            losses.append(float(m["loss"]))
            corrects += int(m["correct"])
            counts += int(m["count"])

        multi = make_train_multistep(k, "multiclass", donate=False)
        state_b, mm = multi(state_b, xs, ys, rng)

        assert int(state_b.step) == int(state_a.step) == k
        np.testing.assert_allclose(float(mm["loss"]), np.mean(losses),
                                   rtol=1e-6)
        assert int(mm["correct"]) == corrects
        assert int(mm["count"]) == counts
        # The scan-fused program fuses/reassociates differently from the
        # per-step program; Adam's rsqrt amplifies that f32 noise to ~3e-5
        # on params after 3 steps (measured on CPU). Logic errors (wrong
        # RNG fold, stale state, reordered batches) produce O(1e-2) drift.
        for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=2e-4, rtol=1e-4)
        for la, lb in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                          jax.tree_util.tree_leaves(state_b.batch_stats)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=5e-5, rtol=1e-4)

    def test_multistep_remainder_path_with_augment_and_wire(self):
        """The driver's full K-fused epoch shape — one fused K-group then
        remainder singles — with the ingredients train.py adds on top of
        the plain step (on-device augment + int16 wire batches) must track
        the all-singles run: mean loss to ~1e-4 rel, params within the
        Adam-amplified fusion-noise envelope (measured ~7e-4 after 6
        steps; wiring bugs — skipped/reordered batches, wrong RNG fold —
        give O(1e-1))."""
        from leaf_tpu.data.device_augment import leaf_device_augment
        from leaf_tpu.training import make_train_multistep

        k, n = 4, 6
        state_a, _ = _tiny_classifier_state()
        state_b, _ = _tiny_classifier_state()
        rng = jax.random.PRNGKey(7)
        rs = np.random.RandomState(11)
        xs = (rs.randn(n, 4, 16000) * 3000).astype(np.int16)
        ys = rs.randint(0, 5, size=(n, 4)).astype(np.int32)

        step = make_train_step("multiclass", donate=False,
                               augment_fn=leaf_device_augment)
        single_losses = []
        for i in range(n):
            state_a, m = step(state_a, jnp.asarray(xs[i]),
                              jnp.asarray(ys[i]), rng)
            single_losses.append(float(m["loss"]))

        multi = make_train_multistep(k, "multiclass", donate=False,
                                     augment_fn=leaf_device_augment)
        state_b, mm = multi(state_b, jnp.asarray(xs[:k]),
                            jnp.asarray(ys[:k]), rng)
        np.testing.assert_allclose(float(mm["loss"]),
                                   np.mean(single_losses[:k]), rtol=1e-3)
        for i in range(k, n):
            state_b, _ = step(state_b, jnp.asarray(xs[i]),
                              jnp.asarray(ys[i]), rng)

        assert int(state_b.step) == int(state_a.step) == n
        for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=5e-3, rtol=1e-2)

    def test_train_step_int16_wire_matches_float(self):
        # int16 wire batches (waveform_from_wire in-step decode) must give
        # the SAME loss as the float32 path — the scale 1/32768 is exact.
        state_f, _ = _tiny_classifier_state()
        state_i, _ = _tiny_classifier_state()
        step = make_train_step("multiclass", donate=False)
        x16 = (np.clip(np.random.RandomState(3).randn(4, 16000) * 0.1,
                       -1, 1) * 32768).clip(-32768, 32767).astype(np.int16)
        xf = jnp.asarray(x16.astype(np.float32) / 32768.0)
        y = jnp.array([0, 1, 2, 3])
        rng = jax.random.PRNGKey(7)
        state_f, mf = step(state_f, xf, y, rng)
        state_i, mi = step(state_i, jnp.asarray(x16), y, rng)
        assert float(mf["loss"]) == float(mi["loss"])

    def test_train_step_watch_norms(self):
        """wandb.watch(model) equivalent (reference train_xla.py:243-244):
        watch_norms=True must add finite, positive global + per-submodule
        param/grad L2 norms, and the global ones must equal the norms of
        the actual trees."""
        import optax
        state, _ = _tiny_classifier_state()
        step = make_train_step("multiclass", donate=False, watch_norms=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = jnp.array([0, 1, 2, 3])
        new_state, metrics = step(state, x, y, jax.random.PRNGKey(7))
        for key in ("grad_norm", "param_norm", "grad_norm/features",
                    "grad_norm/model", "param_norm/features",
                    "param_norm/model"):
            v = float(metrics[key])
            assert np.isfinite(v) and v > 0, (key, v)
        np.testing.assert_allclose(
            float(metrics["param_norm"]),
            float(optax.global_norm(new_state.params)), rtol=1e-5)
        # sub-norms compose into the global norm
        np.testing.assert_allclose(
            float(metrics["grad_norm"]),
            float(np.hypot(float(metrics["grad_norm/features"]),
                           float(metrics["grad_norm/model"]))), rtol=1e-5)
        # default: no extra metrics, no extra cost
        plain = make_train_step("multiclass", donate=False)
        _, m2 = plain(state, x, y, jax.random.PRNGKey(7))
        assert set(m2) == {"loss", "correct", "count"}

    def test_train_step_watch_histograms(self):
        """wandb.watch(log='all') equivalent: watch_histograms=True must
        stash the grad pytree in metrics['_grads'] (same treedef as
        params), and histogram_tree must produce np.histogram-agreeing
        bucket counts for params and grads in one device program."""
        from leaf_tpu.training.histograms import histogram_tree
        state, _ = _tiny_classifier_state()
        step = make_train_step("multiclass", donate=False,
                               watch_histograms=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = jnp.array([0, 1, 2, 3])
        new_state, metrics = step(state, x, y, jax.random.PRNGKey(7))
        grads = metrics["_grads"]
        assert (jax.tree_util.tree_structure(grads)
                == jax.tree_util.tree_structure(state.params))
        hists = histogram_tree(new_state.params, prefix="params/")
        hists.update(histogram_tree(grads, prefix="grads/"))
        assert any(k.startswith("params/") for k in hists)
        assert any(k.startswith("grads/") for k in hists)
        n_leaves = len(jax.tree_util.tree_leaves(state.params))
        assert len(hists) == 2 * n_leaves
        for tag, (counts, lo, hi, s, ssq) in hists.items():
            counts = np.asarray(counts)
            leaf_n = counts.sum()
            assert leaf_n > 0, tag
            assert float(lo) <= float(hi), tag
            assert np.isfinite([float(lo), float(hi), float(s),
                                float(ssq)]).all(), tag
        # cross-check one tensor against np.histogram on identical edges
        leaf = np.asarray(
            jax.tree_util.tree_leaves(new_state.params)[0], np.float32)
        counts, lo, hi, s, ssq = next(
            v for k, v in hists.items() if k.startswith("params/"))
        np_counts, _ = np.histogram(
            leaf.ravel(), bins=np.asarray(counts).shape[0],
            range=(float(lo), float(hi)))
        np.testing.assert_array_equal(np.asarray(counts), np_counts)
        np.testing.assert_allclose(float(s), leaf.sum(), rtol=1e-4)

    def test_histogram_constant_tensor(self):
        """A constant tensor must not NaN: everything in bucket 0."""
        from leaf_tpu.training.histograms import tensor_histogram
        counts, lo, hi, s, ssq = tensor_histogram(jnp.full((37,), 2.5))
        counts = np.asarray(counts)
        assert counts[0] == 37 and counts[1:].sum() == 0
        assert float(lo) == float(hi) == 2.5
        assert np.isclose(float(s), 37 * 2.5)

    def test_train_step_multilabel_with_mixup(self):
        state, _ = _tiny_classifier_state("multilabel")
        step = make_train_step("multilabel", mixup_alpha=1.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = (jax.random.uniform(jax.random.PRNGKey(2), (4, 5)) > 0.5
             ).astype(jnp.float32)
        state, metrics = step(state, x, y, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(metrics["correct"]) == 0  # undefined for multilabel

    def test_eval_step_multilabel_sigmoid_range(self):
        state, _ = _tiny_classifier_state("multilabel")
        estep = make_eval_step("multilabel")
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = jnp.zeros((4, 5), jnp.float32)
        m = estep(state, x, y)
        out = np.asarray(m["outputs"])
        assert out.shape == (4, 5) and (out >= 0).all() and (out <= 1).all()

    def test_mixup_fresh_lambda_per_call(self):
        # The reference's fixed seed gives identical lam each call
        # (mixup.py:15-17) — we must NOT replicate that.
        x = jnp.ones((8, 100, 1))
        y = jnp.ones((8, 3))
        _, _, _, lam1 = mixup(jax.random.PRNGKey(0), x, y, 1.0, "multiclass")
        _, _, _, lam2 = mixup(jax.random.PRNGKey(1), x, y, 1.0, "multiclass")
        assert not np.allclose(np.asarray(lam1), np.asarray(lam2))

    def test_mixup_multilabel_convexity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 50, 1))
        y = (jax.random.uniform(jax.random.PRNGKey(1), (8, 3)) > 0.5
             ).astype(jnp.float32)
        mx, my, _, _ = mixup(jax.random.PRNGKey(2), x, y, 1.0, "multilabel")
        assert mx.shape == x.shape and my.shape == y.shape
        assert float(my.min()) >= 0.0 and float(my.max()) <= 1.0


class TestMetrics:
    def test_accuracy_topk(self):
        logits = np.array([[0.1, 0.9, 0.0, 0.0, 0.0],
                           [0.9, 0.1, 0.0, 0.0, 0.0],
                           [0.0, 0.0, 0.8, 0.1, 0.1],
                           [0.3, 0.2, 0.1, 0.25, 0.15]])
        target = np.array([1, 0, 2, 3])
        (top1, top5), _ = M.accuracy(logits, target, topk=(1, 5))
        assert top1 == pytest.approx(75.0)
        assert top5 == pytest.approx(100.0)

    def test_d_prime(self):
        assert M.d_prime(0.5) == pytest.approx(0.0, abs=1e-9)
        assert M.d_prime(0.9) == pytest.approx(1.812387, rel=1e-4)

    def test_map_binarizes_mixup_targets(self):
        rng = np.random.RandomState(0)
        preds = [rng.rand(16, 4)]
        soft = [np.clip(rng.rand(16, 4), 0, 1)]
        hard = [(soft[0] >= 0.5).astype(np.float64)]
        assert M.calculate_mAP(preds, soft, mixup=True) == pytest.approx(
            M.calculate_mAP(preds, hard, mixup=False))

    def test_calculate_stats_keys(self):
        rng = np.random.RandomState(0)
        out = rng.rand(64, 3)
        tgt = (rng.rand(64, 3) > 0.5).astype(int)
        stats = M.calculate_stats(out, tgt)
        assert len(stats) == 3
        assert set(stats[0]) == {"precisions", "recalls", "AP", "fpr",
                                 "fnr", "auc"}

    def test_mean_confidence_interval(self):
        m, h = M.mean_confidence_interval([94.2, 94.5, 94.8, 94.4, 94.6])
        assert m == pytest.approx(94.5)
        assert 0 < h < 1


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from leaf_tpu.training.checkpoint import (
            best_checkpoint, load_checkpoint, save_checkpoint,
            save_hparams, load_hparams)
        state, cfg = _tiny_classifier_state()
        step = make_train_step("multiclass")
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = jnp.array([0, 1, 2, 3])
        state, _ = step(state, x, y, jax.random.PRNGKey(0))

        save_checkpoint(str(tmp_path), state, 0, 1.0, 0.5, 0.60)
        save_checkpoint(str(tmp_path), state, 1, 0.9, 0.6, 0.75)
        save_hparams(str(tmp_path), {"model": {"arch": "cifar_resnet"}})

        best = best_checkpoint(str(tmp_path))
        assert best.endswith("epoch_001")

        fresh, _ = _tiny_classifier_state()
        restored, meta = load_checkpoint(best, fresh)
        assert meta["val_acc"] == 0.75
        assert int(restored.step) == 1
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
        assert load_hparams(str(tmp_path))["model"]["arch"] == "cifar_resnet"


class TestLatestCheckpoint:
    def test_latest_resolution(self, tmp_path):
        from leaf_tpu.training.checkpoint import (latest_checkpoint,
                                                  save_checkpoint)
        assert latest_checkpoint(str(tmp_path)) is None
        state, _ = _tiny_classifier_state()
        save_checkpoint(str(tmp_path), state, 0, 1.0, 0.1, 0.2)
        save_checkpoint(str(tmp_path), state, 3, 0.5, 0.5, 0.6)
        save_checkpoint(str(tmp_path), state, 1, 0.8, 0.3, 0.9)
        assert latest_checkpoint(str(tmp_path)).endswith("epoch_003")


class TestPretrainedBackbone:
    def test_backbone_surgery_keeps_fresh_head(self, tmp_path):
        """load_pretrained_backbone ≙ the reference's fc-swap surgery
        (model_helper.py:78-94): backbone weights transfer, head stays."""
        from leaf_tpu.training.checkpoint import (load_pretrained_backbone,
                                                  save_checkpoint)
        state, _ = _tiny_classifier_state(num_classes=5)
        save_checkpoint(str(tmp_path), state, 0, 1.0, 0.5, 0.5)

        fresh, _ = _tiny_classifier_state(num_classes=7)
        new_params = load_pretrained_backbone(
            str(tmp_path) + "/epoch_000", fresh.params)
        # backbone conv transferred from the checkpoint
        np.testing.assert_allclose(
            np.asarray(new_params["model"]["conv1"]["kernel"]),
            np.asarray(state.params["model"]["conv1"]["kernel"]))
        # head kept at the fresh 7-class shape
        assert new_params["model"]["linear"]["kernel"].shape[-1] == 7


class TestEmaPathSwitch:
    def test_long_sequences_use_scan_and_agree(self):
        from leaf_tpu.frontend.postprocessing import (_EMA_MATMUL_MAX_T,
                                                      ema_matmul, ema_scan)
        rng = np.random.RandomState(0)
        t = _EMA_MATMUL_MAX_T + 44  # beyond the matmul regime
        x = jnp.asarray(rng.rand(2, t, 8).astype("float32"))
        w = jnp.asarray(rng.rand(8).astype("float32") * 0.3)
        a = np.asarray(ema_scan(x, w))
        b = np.asarray(ema_matmul(x, w))  # O(T²) but still exact
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestBnRecalibration:
    def test_recalibration_closes_eval_gap(self):
        """After a few steps at high lr, eval accuracy lags train because BN
        running stats trail the parameters; re-estimation must close the gap
        (this is why EffNet shows chance-level eval on short runs — BN
        momentum 0.99, reference utils.py:519-521)."""
        from leaf_tpu.training.bn_recalibrate import recalibrate_batch_stats
        from leaf_tpu.models import Classifier
        cfg = {
            "frontend": {"name": "leaf", "default_args": True},
            "audio_config": {"sample_rate": 16000},
            "model": {"arch": "cifar_resnet", "model_depth": 20,
                      "num_classes": 5, "type": "multiclass"},
            "opt": {"optimizer": "Adam", "lr": 2e-3, "weight_decay": 0.0,
                    "scheduler": "step", "step_size": 1000, "gamma": 0.1,
                    "batch_size": 4},
        }
        model = Classifier(cfg=cfg)
        xx0 = jnp.zeros((4, 16000), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, xx0,
                               train=False)
        tx, _, _ = optimization_helper(cfg, num_tr_steps_per_epoch=100)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx)
        step = make_train_step("multiclass", donate=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16000)) * 0.1
        y = jnp.array([0, 1, 2, 3])
        for _ in range(120):
            state, m = step(state, x, y, jax.random.PRNGKey(0))
        # the model has memorized the batch in train mode
        train_logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        assert float((jnp.argmax(train_logits, 1) == y).mean()) == 1.0

        recal = recalibrate_batch_stats(
            state, [(np.asarray(x), np.asarray(y))] * 60,
            jax.random.PRNGKey(7))
        eval_after = recal.apply_fn(
            {"params": recal.params, "batch_stats": recal.batch_stats},
            x, train=False)
        acc_after = float((jnp.argmax(eval_after, 1) == y).mean())
        # with fully re-estimated stats on the SAME batch, eval-mode must
        # reproduce the train-mode predictions
        assert acc_after == 1.0, acc_after
        # params untouched
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(recal.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_preprocess_hook_shapes_the_estimate(self):
        """recalibrate_batch_stats(preprocess=...) must run the hook
        on-device before the forward: recalibrating on 3x-scaled inputs
        via the hook must equal recalibrating on pre-scaled host batches
        (this is how the CLIs feed wire-decode + device augmentation)."""
        from leaf_tpu.training.bn_recalibrate import recalibrate_batch_stats
        from leaf_tpu.models import Classifier
        cfg = {
            "frontend": {"name": "leaf", "default_args": True},
            "audio_config": {"sample_rate": 16000},
            "model": {"arch": "cifar_resnet", "model_depth": 20,
                      "num_classes": 3, "type": "multiclass"},
            "opt": {"optimizer": "SGD", "lr": 1e-2, "weight_decay": 0.0,
                    "scheduler": "step", "step_size": 10, "gamma": 0.1,
                    "batch_size": 2},
        }
        model = Classifier(cfg=cfg)
        x0 = jnp.zeros((2, 16000), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x0,
                               train=False)
        tx, _, _ = optimization_helper(cfg, num_tr_steps_per_epoch=10)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx)
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(3), (2, 16000)) * 0.1)

        hooked = recalibrate_batch_stats(
            state, [x] * 3, jax.random.PRNGKey(5),
            preprocess=lambda _, v: v * 3.0)
        prescaled = recalibrate_batch_stats(
            state, [x * 3.0] * 3, jax.random.PRNGKey(5))
        for a, b in zip(
                jax.tree_util.tree_leaves(hooked.batch_stats),
                jax.tree_util.tree_leaves(prescaled.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
