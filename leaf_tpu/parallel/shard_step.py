"""shard_map data-parallel train step — explicit per-shard execution.

The default path relies on GSPMD to partition the jitted step (including the
Pallas frontend kernel) from input shardings; that is verified correct but
leaves kernel partitioning decisions to the compiler. This variant pins the
semantics the way large-scale TPU programs do: ``shard_map`` over the 'data'
mesh axis runs the step body PER SHARD (each device executes the Pallas
kernel on its local batch by construction) with an explicit
``lax.pmean`` of gradients and metrics — exactly the collective the
reference got from ``xm.optimizer_step`` (reference: train_xla.py:283).

Note one intentional semantic difference from the GSPMD path: BatchNorm
batch statistics are PER-SHARD here (then pmean'd into the running stats),
matching the reference's torch-xla per-replica behavior, while the GSPMD
path computes exact global-batch statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax ≥0.8 stable API (the experimental alias warns and will go);
    # it renamed check_rep → check_vma, so adapt at the boundary.
    from jax import shard_map as _shard_map_new

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jaxlib
    from jax.experimental.shard_map import shard_map

from leaf_tpu.training.state import TrainState
from leaf_tpu.training.steps import (bce_logits_loss, cross_entropy_loss,
                                     mixup, waveform_from_wire)

__all__ = ["make_shard_map_train_step"]


def make_shard_map_train_step(
    mesh: Mesh,
    model_type: str = "multiclass",
    mixup_alpha: Optional[float] = None,
    augment_fn: Optional[Callable] = None,
) -> Callable:
    """(state, x, y, rng) → (state, metrics), x/y sharded over 'data'."""
    multilabel = model_type == "multilabel"
    loss_fn_inner = bce_logits_loss if multilabel else cross_entropy_loss

    def per_shard(state: TrainState, x, y, rng):
        x = waveform_from_wire(x)  # int16 wire batches → float32 (exact)
        # distinct augment/mixup randomness per shard
        shard_rng = jax.random.fold_in(rng, lax.axis_index("data"))
        step_rng = jax.random.fold_in(shard_rng, state.step)
        rng_mix, rng_drop, rng_aug = jax.random.split(step_rng, 3)
        if augment_fn is not None:
            x = augment_fn(rng_aug, x)

        def loss_fn(params):
            xx, yy = x, y
            if mixup_alpha is not None:
                if multilabel:
                    xx, yy, _, _ = mixup(rng_mix, x, y, mixup_alpha,
                                         "multilabel")
                else:
                    xx, y_a, y_b, lam = mixup(rng_mix, x, y, mixup_alpha,
                                              "multiclass")
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                xx, train=True, rngs={"dropout": rng_drop},
                mutable=["batch_stats"])
            if mixup_alpha is not None and not multilabel:
                per = optax.softmax_cross_entropy_with_integer_labels
                loss = jnp.mean(per(logits, y_a) * lam
                                + per(logits, y_b) * (1.0 - lam))
            else:
                loss = loss_fn_inner(logits, yy)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # THE data-parallel collectives: grads, loss, BN stats
        grads = lax.pmean(grads, "data")
        loss = lax.pmean(loss, "data")
        new_stats = lax.pmean(new_stats, "data")
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        if multilabel:
            correct = jnp.zeros((), jnp.int32)
        else:
            correct = lax.psum(
                jnp.sum(jnp.argmax(logits, -1) == y).astype(jnp.int32),
                "data")
        count = lax.psum(jnp.asarray(x.shape[0], jnp.int32), "data")
        return new_state, {"loss": loss, "correct": correct, "count": count}

    state_spec = P()          # replicated
    batch_spec = P("data")
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_spec, batch_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_rep=False,  # optimizer state PyTree has non-rep-checked leaves
    )
    return jax.jit(mapped)
