"""Root conftest: force a deterministic 8-device CPU mesh for all tests.

The surrounding environment registers a tunneled TPU backend at interpreter
startup (sitecustomize imports jax itself), so plain env-var overrides are
ignored by the time pytest runs. We therefore override via jax.config, which
works as long as no computation has been dispatched yet. The 8 fake CPU
devices emulate an 8-chip TPU slice for sharding/collective tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Test tiers. `pytest -m "not slow"` is the fast tier (measured round 5:
# 203 tests in 628 s ≈ 10.5 min on this 1-core box): frontend math/modules,
# ops-interpret, data, config, checkpoint logic. Everything that compiles
# models in subprocesses, runs CLI end-to-end drivers, steps torch
# trajectories, or sits in the measured compile-heavy tail is `slow`.
# Marking is
# centralized here (one list, applied at collection) instead of per-file
# pytestmark lines so the tier boundary is auditable in one place.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    "test_multihost_train.py",      # 2-proc jax.distributed subprocesses
    "test_multistep_cli.py",        # train.py CLI end-to-end
    "test_bn_recal_cli.py",         # train.py CLI end-to-end
    "test_preemption.py",           # spawns train.py, SIGTERMs it
    "test_evaluate.py",             # evaluate.py CLI end-to-end
    "test_efficientnet_parity.py",  # effnet CPU compiles + torch Adam steps
    "test_trajectory_parity.py",    # long optimizer trajectories vs torch
    "test_serving.py",              # jax.export AOT artifacts
    "test_torch_cross_validation.py",  # torch subprocess roundtrips
    "test_torch_import.py",         # checkpoint-convert subprocesses
    "test_resnet18_parity.py",      # 20-step trajectory vs torch
    "test_densenet_parity.py",      # densenet compiles + torch
}
_SLOW_TESTS = {
    # mixed files: individual subprocess / heavy-compile tests
    "test_two_process_train_step",  # gloo pair in subprocesses
    "test_dryrun_multichip_8",      # now compiles effnet-b0 on the mesh
    "test_pack_then_read_roundtrip",       # pack_dataset.py subprocess
    "test_packer_skips_unreadable",        # pack_dataset.py subprocess
    "test_remat_matches_plain",            # two effnet fwd+bwd CPU compiles
    # round-5 re-tier: the compile-heaviest tests of otherwise-fast files
    # (measured --durations on this box; each path keeps slow-tier e2e
    # coverage via the parity/CLI files). Together ~580 s of the former
    # 18.5-min "fast" tier.
    "test_multistep_remainder_path_with_augment_and_wire",  # 96 s
    "test_recalibration_closes_eval_gap",                   # 78 s
    "test_densenet121_shape_and_params",                    # 65 s
    "test_multistep_matches_sequential_single_steps",       # 64 s
    "test_fused_kernel_inside_shard_map",                   # 60 s
    "test_b0_shape_and_params",           # 46 s (b0 stays via train_mode)
    "test_sharded_step_matches_single_device",              # 43 s
    "test_larger_variants_init",          # 65 s over b1+b2 params
    "test_memory_efficient_grads_match",                    # 36 s
    "test_train_step_watch_norms",                          # 26 s
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: subprocess/CLI-e2e/compile-heavy tests "
        "(deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if (item.fspath.basename in _SLOW_FILES
                or item.name.split("[")[0] in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
