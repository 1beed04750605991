"""Orbax checkpointing of the train state + JSON metadata.

Capability parity with the reference's checkpoint/resume story
(reference: train_xla.py:36-52 save, 109-114 load; hparams.pickle 227-230;
best-checkpoint selection by parsing val_acc from filenames, test.py:41-45).
TPU-native differences: one orbax directory per epoch holding the full
TrainState PyTree (params, batch_stats, optimizer state, step) plus a
``meta.json`` with {epoch, tr_loss, tr_acc, val_acc} — metrics live in JSON,
not in filenames; hyperparams persist as ``hparams.json`` (the YAML config),
not a pickle.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "best_checkpoint",
           "save_hparams", "load_hparams", "load_pretrained_frontend",
           "load_pretrained_backbone", "apply_pretrained_frontend"]

_CKPT_RE = re.compile(r"^epoch_(\d+)(_preempt)?$")


def _ckpt_dir(exp_dir: str, epoch: int, suffix: str = "") -> str:
    return os.path.join(os.path.abspath(exp_dir),
                        f"epoch_{epoch:03d}{suffix}")


def _to_host(tree):
    """Gather a (replicated) pytree to host numpy. Checkpoints are saved
    AND restored through this so they stay topology-independent: numpy
    re-shards onto any mesh (2-host × 4-device training → single-device
    evaluate.py), unlike jax.Arrays whose saved shardings pin the
    original mesh."""
    import numpy as np
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_checkpoint(exp_dir: str, state, epoch: int,
                    tr_loss: float, tr_acc: float, val_acc: float,
                    scheduler_state: Optional[dict] = None,
                    dir_suffix: str = "", meta_epoch: Optional[int] = None
                    ) -> str:
    """Write state + metrics for one epoch. Only process 0 writes metadata
    (orbax handles multi-host array gathering itself).

    ``dir_suffix='_preempt'`` + ``meta_epoch=epoch-1`` is the mid-epoch
    preemption save: the directory carries the interrupted epoch's number
    (so ``latest_checkpoint`` orders it after the last completed epoch),
    while the metadata epoch makes resume REDO the interrupted epoch;
    its val_acc of -1 keeps it out of ``best_checkpoint``."""
    path = _ckpt_dir(exp_dir, epoch, dir_suffix)
    ckptr = ocp.StandardCheckpointer()
    # Gather to host numpy first (_to_host): the train state is fully
    # replicated (shard_params), so every process holds complete values.
    target = {
        "step": _to_host(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    ckptr.save(os.path.join(path, "state"), target, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {"epoch": epoch if meta_epoch is None else meta_epoch,
                "tr_loss": float(tr_loss),
                "tr_acc": float(tr_acc), "val_acc": float(val_acc)}
        if scheduler_state is not None:
            meta["scheduler"] = scheduler_state
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    return path


def load_checkpoint(path: str, state, with_opt: bool = True) -> Tuple[Any, Dict]:
    """Restore a TrainState (template = ``state``) + its metadata.

    ``with_opt=False`` restores only step/params/batch_stats — for
    evaluation, where the consumer's optimizer (e.g. optax.identity) does
    not match the training optimizer's saved state tree."""
    if not with_opt:
        restored_raw, meta = _restore_raw(path)
        import jax.numpy as jnp
        return state.replace(
            step=jnp.asarray(restored_raw["step"]),
            params=restored_raw["params"],
            batch_stats=restored_raw["batch_stats"],
        ), meta
    ckptr = ocp.StandardCheckpointer()
    # Restore to HOST numpy (template leaves are numpy, via _to_host): a
    # committed device array coming out of orbax cannot be re-placed onto
    # a multi-host mesh (cross-host device_put), while numpy re-shards
    # anywhere — the mirror of save_checkpoint's host gather.
    template = {
        "step": _to_host(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    restored = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                             template)
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta


def latest_checkpoint(exp_dir: str) -> Optional[str]:
    """Newest epoch directory — enables `--continue_from_ckpt latest`
    auto-resume after preemption (the reference requires a manual path,
    train_xla.py:202-205)."""
    if not os.path.isdir(exp_dir):
        return None
    epochs = []
    for name in os.listdir(exp_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.exists(os.path.join(exp_dir, name, "meta.json")):
            # A completed epoch_N outranks epoch_N_preempt (same number):
            # the preempt save was mid-epoch-N; once N completed, its
            # snapshot is strictly newer.
            epochs.append((int(m.group(1)), 0 if m.group(2) else 1, name))
    if not epochs:
        return None
    return os.path.join(exp_dir, max(epochs)[2])


def best_checkpoint(exp_dir: str, key: str = "val_acc") -> Optional[str]:
    """Pick the checkpoint with the best metric — the reference parses
    val_acc out of filenames (test.py:41-45); here it's read from meta.json.

    ``epoch_N_preempt`` snapshots are mid-epoch saves with no validation
    metric (val_acc=-1) and are never eligible: without this filter a run
    preempted before its first completed epoch would silently serve a
    mid-epoch model from evaluate.py / export_serving.py."""
    best_path, best_val = None, float("-inf")
    if not os.path.isdir(exp_dir):
        return None
    for name in sorted(os.listdir(exp_dir)):
        m = _CKPT_RE.match(name)
        if not m or m.group(2):  # not a checkpoint dir, or a _preempt save
            continue
        meta_path = os.path.join(exp_dir, name, "meta.json")
        if not os.path.exists(meta_path):
            continue
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get(key, float("-inf")) > best_val:
            best_val = meta[key]
            best_path = os.path.join(exp_dir, name)
    return best_path


def save_hparams(exp_dir: str, cfg: dict) -> None:
    """hparams.json ≙ the reference's hparams.pickle (train_xla.py:227-230)."""
    if jax.process_index() == 0:
        os.makedirs(exp_dir, exist_ok=True)
        with open(os.path.join(exp_dir, "hparams.json"), "w") as f:
            json.dump(cfg, f, indent=2)


def load_hparams(exp_dir: str) -> dict:
    with open(os.path.join(exp_dir, "hparams.json")) as f:
        return json.load(f)


def load_converted_frontend(npz_dir: str, params):
    """Load a torch-converted LEAF frontend (see
    scripts/convert_torch_checkpoint.py) into the ``features`` subtree of a
    Classifier param dict (or directly into Leaf params)."""
    import numpy as np
    flat = dict(np.load(os.path.join(npz_dir, "frontend_params.npz")))
    target = dict(params["features"]) if "features" in params else dict(params)

    def set_path(tree, path, value):
        tree = dict(tree)
        head, *rest = path
        if rest:
            tree[head] = set_path(tree[head], rest, value)
        else:
            assert np.asarray(tree[head]).shape == value.shape, \
                (path, np.asarray(tree[head]).shape, value.shape)
            tree[head] = value
        return tree

    for key, value in flat.items():
        target = set_path(target, key.split("/"), value)
    new = dict(params)
    if "features" in params:
        new["features"] = target
        return new
    return target


def load_pretrained_frontend(path: str, params):
    """Swap in pretrained LEAF frontend params (reference README.md:94-114:
    extract ``model.features``; here the frontend subtree is
    ``params['features']``)."""
    restored, _ = _restore_raw(path)
    new = dict(params)
    new["features"] = restored["params"]["features"]
    return type(params)(new) if not isinstance(params, dict) else new


def apply_pretrained_frontend(cfg: dict, params):
    """Config-driven pretrained-frontend loading — the README's flagship
    "pretrained LEAF extraction" flow (reference frontend_helper.py:12-14,
    52-53 loads ``frontend.pretrained`` into the frontend at construction;
    reference README.md:94-114).

    Returns (params, loaded_path_or_None). Dispatches on the artifact:
    a torch-converted npz dir (scripts/convert_torch_checkpoint.py output)
    or an orbax training checkpoint of a full Classifier. A configured but
    missing path is an error, never a silent mel-init fallback.
    """
    pretrained = str(cfg.get("frontend", {}).get("pretrained", "") or "")
    if not pretrained or pretrained.lower() == "none":
        return params, None
    path = pretrained
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"frontend.pretrained = {path!r} does not exist")
    if os.path.isfile(path) and path.endswith(".npz"):
        path = os.path.dirname(path)
    if os.path.exists(os.path.join(path, "frontend_params.npz")):
        return load_converted_frontend(path, params), pretrained
    return load_pretrained_frontend(path, params), pretrained


def load_pretrained_backbone(path: str, params, keep_head: bool = True):
    """Load a pretrained classifier's backbone, keeping the fresh output head
    — the functional analogue of the reference's fc-swap surgery
    (model_helper.py:78-94)."""
    restored, _ = _restore_raw(path)
    pre = dict(restored["params"]["model"])
    cur = dict(params["model"])
    head_keys = {"fc", "classifier", "linear"}
    for k in pre:
        if keep_head and k in head_keys:
            continue
        if k in cur:
            cur[k] = pre[k]
    new = dict(params)
    new["model"] = cur
    return new


def _restore_raw(path: str):
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(os.path.abspath(path), "state"))
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta
