"""Jitted train / eval steps, losses, and on-device mixup.

Replaces the reference's per-step Python loop body (reference:
train_xla.py:259-294): forward → loss → backward → xm.optimizer_step →
loss.item(). TPU-first differences:

- the whole step (mixup, forward, loss, grads, optimizer, metrics) is ONE
  jitted SPMD program; gradient all-reduce is inserted by XLA from the
  shardings instead of ``xm.optimizer_step``;
- per-step metrics stay on device — no ``loss.item()`` sync per step
  (reference: train_xla.py:291); hosts read them once per epoch;
- mixup runs on device with a proper per-step PRNG key — the reference's
  fixed ``random_seed=1233`` draws the same lambda every call
  (reference: utilities/data/mixup.py:15-17), a quirk knowingly fixed;
- losses: softmax CE (torch CrossEntropyLoss) for multiclass, sigmoid BCE
  (torch BCEWithLogitsLoss) for multilabel (reference: train_xla.py:233-235).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from leaf_tpu.training.state import TrainState

__all__ = ["cross_entropy_loss", "bce_logits_loss", "mixup",
           "make_train_step", "make_train_multistep", "make_eval_step",
           "waveform_from_wire", "pad_batch_to_multiple"]


def waveform_from_wire(x: jnp.ndarray) -> jnp.ndarray:
    """Decode int16 wire batches to float32 in [-1, 1) on device.

    The host pipeline can ship waveforms as raw int16 PCM (4× less
    host→device traffic and host cache RAM than float32 — see
    RawWaveformDataset ``wire_dtype``); the scale 1/32768 is exactly what
    every decode backend applies for int16 sources, so the result is
    bit-identical to the float32 wire path for mono 16-bit sources
    (stereo down-mixes agree to 1 LSB). Float inputs pass through.
    """
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (CrossEntropyLoss)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def bce_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean sigmoid BCE over all elements (BCEWithLogitsLoss)."""
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def mixup(rng: jax.Array, inputs: jnp.ndarray, targets: jnp.ndarray,
          alpha: float = 1.0, mode: str = "multilabel"):
    """On-device mixup (reference: utilities/data/mixup.py:5-27).

    multilabel → (mixed_x, mixed_y); multiclass → (mixed_x, y_a, y_b, lam).
    Per-sample Beta(α, α) lambda, fresh every call.
    """
    bsize = inputs.shape[0]
    k_lam, k_perm = jax.random.split(rng)
    lam = jax.random.beta(k_lam, alpha, alpha, (bsize,)).astype(inputs.dtype)
    perm = jax.random.permutation(k_perm, bsize)
    lam_x = lam.reshape((bsize,) + (1,) * (inputs.ndim - 1))
    mixed_x = inputs * lam_x + inputs[perm] * (1.0 - lam_x)
    if mode == "multilabel":
        lam_y = lam.reshape(bsize, 1)
        mixed_y = targets * lam_y + targets[perm] * (1.0 - lam_y)
        return mixed_x, mixed_y, None, None
    return mixed_x, targets, targets[perm], lam


def _topk_correct(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.argmax(logits, axis=-1) == labels)


def make_train_step(
    model_type: str = "multiclass",
    mixup_alpha: Optional[float] = None,
    donate: bool = True,
    augment_fn: Optional[Callable] = None,
    watch_norms: bool = False,
    watch_histograms: bool = False,
) -> Callable:
    """Build the jitted train step: (state, x, y, rng) → (state, metrics).

    metrics = {'loss', 'correct', 'count'} as device scalars — accumulate on
    host once per epoch (train accuracy is meaningless under multilabel/mixup
    and reported as 0, mirroring the reference's multiclass-only tracker,
    train_xla.py:268-278).

    ``augment_fn(rng, x)`` runs on-device inside the step (e.g.
    leaf_tpu.data.device_augment.leaf_device_augment), replacing the
    reference's host-side torch_audiomentations augments.

    ``watch_norms=True`` adds global + per-submodule parameter/gradient
    L2 norms to the metrics — the TPU-native equivalent of
    ``wandb.watch(model, log="all", log_freq=100)`` (reference:
    train_xla.py:243-244): scalars computed inside the fused step (a few
    reductions) instead of host-side histogram hooks.

    ``watch_histograms=True`` additionally stashes the raw grad pytree in
    ``metrics["_grads"]`` (zero extra device compute — the buffers exist
    anyway). At log boundaries the driver feeds it with ``state.params``
    to ``leaf_tpu.training.histograms.histogram_tree`` for on-device
    per-tensor bucket counts — the full ``wandb.watch(log="all")``
    histogram story (reference: train_xla.py:243-244) without shipping
    whole tensors to host.
    """
    step = _train_step_body(model_type, mixup_alpha, augment_fn,
                            watch_norms, watch_histograms)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _train_step_body(
    model_type: str,
    mixup_alpha: Optional[float],
    augment_fn: Optional[Callable],
    watch_norms: bool = False,
    watch_histograms: bool = False,
) -> Callable:
    """The un-jitted (state, x, y, rng) → (state, metrics) step body —
    shared by ``make_train_step`` (jit per call) and
    ``make_train_multistep`` (lax.scan over K calls in one program)."""
    multilabel = model_type == "multilabel"
    loss_fn_inner = bce_logits_loss if multilabel else cross_entropy_loss

    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray,
             rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        x = waveform_from_wire(x)
        step_rng = jax.random.fold_in(rng, state.step)
        rng_mix, rng_drop, rng_aug = jax.random.split(step_rng, 3)
        if augment_fn is not None:
            x = augment_fn(rng_aug, x)

        def loss_fn(params):
            xx, yy = x, y
            if mixup_alpha is not None and multilabel:
                xx, yy, _, _ = mixup(rng_mix, x, y, mixup_alpha, "multilabel")
                logits, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    xx, train=True, rngs={"dropout": rng_drop},
                    mutable=["batch_stats"])
                loss = loss_fn_inner(logits, yy)
            elif mixup_alpha is not None:
                xx, y_a, y_b, lam = mixup(rng_mix, x, y, mixup_alpha,
                                          "multiclass")
                logits, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    xx, train=True, rngs={"dropout": rng_drop},
                    mutable=["batch_stats"])
                per = optax.softmax_cross_entropy_with_integer_labels
                loss = jnp.mean(per(logits, y_a) * lam
                                + per(logits, y_b) * (1.0 - lam))
            else:
                logits, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    xx, train=True, rngs={"dropout": rng_drop},
                    mutable=["batch_stats"])
                loss = loss_fn_inner(logits, yy)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        if multilabel:
            correct = jnp.zeros((), jnp.int32)
        else:
            correct = _topk_correct(logits, y).astype(jnp.int32)
        metrics = {
            "loss": loss,
            "correct": correct,
            "count": jnp.asarray(x.shape[0], jnp.int32),
        }
        if watch_norms:
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(new_state.params)
            for key in grads:  # top level: 'features' / 'model'
                metrics[f"grad_norm/{key}"] = optax.global_norm(grads[key])
                metrics[f"param_norm/{key}"] = optax.global_norm(
                    new_state.params[key])
        if watch_histograms:
            metrics["_grads"] = grads
        return new_state, metrics

    return step


def make_train_multistep(
    steps_per_call: int,
    model_type: str = "multiclass",
    mixup_alpha: Optional[float] = None,
    donate: bool = True,
    augment_fn: Optional[Callable] = None,
) -> Callable:
    """K train steps fused into ONE compiled program via ``lax.scan``.

    Signature: (state, xs (K, B, T), ys (K, B[, C]), rng) →
    (state, {'loss' (mean over the K steps), 'correct', 'count' (sums)}).

    Why: a per-step execute call pays host→device dispatch that the device
    cannot overlap past a point — the round-3 profile shows ~2.3 ms/step of
    inter-op/dispatch gap around 13.7 ms of busy work (BASELINE.md). One
    scan-fused program dispatches once per K steps and runs the identical
    step body back-to-back on device; numerics are exactly K sequential
    ``make_train_step`` calls (same per-step PRNG folding via
    ``state.step``), asserted in tests/test_training.py. The reference's
    loop is strictly one step per host iteration (train_xla.py:259-294).

    The watch_norms/histogram paths stay per-step — drivers that log
    per-step tensor stats should keep steps_per_call=1 for those runs.
    """
    if steps_per_call < 1:
        raise ValueError(f"steps_per_call must be ≥ 1: {steps_per_call}")
    body = _train_step_body(model_type, mixup_alpha, augment_fn)

    def multi(state: TrainState, xs: jnp.ndarray, ys: jnp.ndarray,
              rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def scan_body(st, xy):
            st, m = body(st, xy[0], xy[1], rng)
            return st, (m["loss"], m["correct"], m["count"])

        state, (losses, corrects, counts) = jax.lax.scan(
            scan_body, state, (xs, ys), length=steps_per_call)
        return state, {
            "loss": losses.mean(),
            "correct": corrects.sum(),
            "count": counts.sum(),
        }

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_eval_step(model_type: str = "multiclass") -> Callable:
    """Jitted eval step: (state, x, y[, w]) → metrics + raw outputs.

    Multilabel returns sigmoid probabilities for host-side mAP/AUC
    (reference: test.py:145-155); multiclass returns logits.

    ``w`` is an optional per-example {0,1} weight: validation batches must
    be padded up to a multiple of the mesh size before sharding (a
    drop_last=False remainder rarely divides the device count), and the
    pad rows carry w=0 so they contribute to no metric. loss/correct/count
    are then weighted sums (count = number of real rows); the host computes
    the weighted-mean loss as sum(loss)/n_batches exactly as before because
    w-aware loss is already normalized by sum(w).
    """
    multilabel = model_type == "multilabel"

    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray,
             w: Optional[jnp.ndarray] = None):
        x = waveform_from_wire(x)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        if multilabel:
            per_example = optax.sigmoid_binary_cross_entropy(
                logits, y).mean(axis=-1)
            # f32 for the host: mAP/AUC go through sklearn, whose
            # check_array rejects ml_dtypes.bfloat16 as non-numeric
            outputs = jax.nn.sigmoid(logits).astype(jnp.float32)
            hits = jnp.zeros((x.shape[0],), jnp.float32)
        else:
            per_example = optax.softmax_cross_entropy_with_integer_labels(
                logits, y)
            outputs = logits.astype(jnp.float32)
            hits = (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
        if w is None:
            w = jnp.ones((x.shape[0],), jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        return {
            "loss": (per_example * w).sum() / denom,
            "correct": (hits * w).sum().astype(jnp.int32),
            "count": w.sum().astype(jnp.int32),
            "outputs": outputs,
        }

    return jax.jit(step)


def pad_batch_to_multiple(x, y, multiple: int):
    """Pad (x, y) on the batch axis up to a multiple of ``multiple`` by
    repeating row 0, returning (x, y, w) with w=0 on the pad rows — so a
    drop_last=False validation remainder can shard over any mesh."""
    import numpy as np
    n = x.shape[0]
    pad = (-n) % max(1, multiple)
    w = np.ones((n + pad,), np.float32)
    if pad:
        w[n:] = 0.0
        x = np.concatenate([np.asarray(x),
                            np.repeat(np.asarray(x[:1]), pad, axis=0)])
        y = np.concatenate([np.asarray(y),
                            np.repeat(np.asarray(y[:1]), pad, axis=0)])
    return x, y, w
