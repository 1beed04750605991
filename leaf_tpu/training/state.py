"""Train state PyTree: params + batch_stats + optax state + step counter.

The reference keeps this implicitly in torch Module/optimizer objects and a
checkpoint dict {model, optimizer, scheduler state_dicts, epoch, metrics}
(reference: train_xla.py:36-52). Here it's one functional PyTree that jits,
shards, and checkpoints (orbax) as a unit.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct
from jax import tree_util

__all__ = ["TrainState", "rewind_steps"]


def rewind_steps(state: "TrainState", n: int) -> "TrainState":
    """Rewind the schedule clock by ``n`` steps: ``state.step`` plus every
    ``count`` field inside the optax state (scale_by_schedule,
    scale_by_adam, inject_hyperparams all keep one).

    Used by the preemption save: resume redoes the interrupted epoch from
    its start, so without the rewind a step-indexed schedule (warmupcosine)
    would run ahead by the already-consumed mid-epoch steps on every
    preemption, reaching the cosine tail early. Rewinding Adam's count
    replays its bias correction for the redone steps, which is exactly the
    do-over semantics resume implements."""
    def fix(path, leaf):
        if path and isinstance(path[-1], tree_util.GetAttrKey) \
                and path[-1].name == "count":
            return jnp.maximum(leaf - n, 0).astype(leaf.dtype)
        return leaf

    new_opt = tree_util.tree_map_with_path(fix, state.opt_state)
    return state.replace(step=jnp.maximum(state.step - n, 0),
                         opt_state=new_opt)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, *, grads, batch_stats=None, **kwargs):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=batch_stats if batch_stats is not None
            else self.batch_stats,
            opt_state=new_opt_state,
            **kwargs,
        )

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx, **kwargs):
        import jax.numpy as jnp
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
            **kwargs,
        )
