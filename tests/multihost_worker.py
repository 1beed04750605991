"""Worker process for the 2-host × 4-device multi-host DP test.

Each invocation is one "host" of a simulated 2-host slice (4 fake CPU
devices per process, gloo cross-process collectives). Runs ONE data-parallel
train step through the REAL multi-host code path: global mesh over all 8
devices, per-process manifest shard via ``local_batch_slice``, global batch
assembly via ``shard_batch`` → ``jax.make_array_from_process_local_data``,
replicated params via ``shard_params``, XLA-inserted gradient all-reduce —
exactly what ``train.py --multihost`` does (mesh.py:62-93 docstring story).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints "MULTIHOST_LOSS <float>" on success; both processes must print the
same value (it is the global pmean'd loss).
"""

import os
import sys


def run_one_step() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from leaf_tpu.models import Classifier
    from leaf_tpu.parallel import make_mesh, shard_batch, shard_params
    from leaf_tpu.parallel.mesh import local_batch_slice
    from leaf_tpu.training import (TrainState, make_train_step,
                                   optimization_helper)

    cfg = {
        "frontend": {"name": "leaf", "default_args": False, "n_filters": 40},
        "audio_config": {"sample_rate": 16000},
        "model": {"arch": "cifar_resnet", "model_depth": 20,
                  "num_classes": 8, "type": "multiclass"},
        "opt": {"optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-4,
                "scheduler": "warmupcosine", "warmup_epochs": 1,
                "batch_size": 16},
    }
    clip, global_batch = 4000, 16
    model = Classifier(cfg=cfg)
    x0 = jnp.zeros((2, clip), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0,
                           train=False)
    tx, _, _ = optimization_helper(cfg, num_devices=jax.device_count(),
                                   num_tr_steps_per_epoch=10, num_epochs=2)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)

    mesh = make_mesh()  # global: all devices across processes
    rng = np.random.RandomState(0)
    xs_global = rng.randn(global_batch, clip).astype(np.float32) * 0.1
    ys_global = (np.arange(global_batch) % 8).astype(np.int32)
    sl = local_batch_slice(global_batch)  # this host's manifest shard

    with mesh:
        state = state.replace(
            params=shard_params(mesh, state.params),
            batch_stats=shard_params(mesh, state.batch_stats),
            opt_state=shard_params(mesh, state.opt_state))
        xb = shard_batch(mesh, xs_global[sl])
        yb = shard_batch(mesh, ys_global[sl])
        train_step = make_train_step("multiclass", donate=False)
        state, metrics = train_step(state, xb, yb, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
    assert int(state.step) == 1
    assert loss == loss and loss < 1e4, f"bad loss {loss}"
    return loss


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    loss = run_one_step()
    print(f"MULTIHOST_LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
