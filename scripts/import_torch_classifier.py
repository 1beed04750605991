#!/usr/bin/env python
"""Import a FULL reference (leaf-pytorch) classifier checkpoint.

End-to-end migration CLI (the library core is
``leaf_tpu.models.torch_import.import_torch_classifier``): load a torch
``.pth`` trained by the reference's train_xla.py (weights stored under
``model_state_dict``, reference train_xla.py:38-41), rebuild the SAME
architecture here from the experiment cfg, map every tensor (frontend +
backbone, params AND BatchNorm running stats), and write an orbax
checkpoint directory that ``evaluate.py --exp_dir`` and
``train.py --continue_from_ckpt`` consume directly.

Usage:
  python scripts/import_torch_classifier.py ckpt.pth cfg_file out_expdir
The checkpoint is written as ``<out_expdir>/epoch_000`` with the source
checkpoint's metrics in meta.json when present.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt")
    p.add_argument("cfg_file")
    p.add_argument("out_expdir")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np  # noqa: F401
    import torch

    from leaf_tpu.models import Classifier, import_torch_classifier
    from leaf_tpu.training import TrainState, parse_config
    from leaf_tpu.training.checkpoint import save_checkpoint

    raw = torch.load(args.torch_ckpt, map_location="cpu",
                     weights_only=False)
    meta = {}
    if isinstance(raw, dict):
        state_dict = (raw.get("model_state_dict") or raw.get("state_dict")
                      or raw.get("model") or raw)
        meta = {k: raw[k] for k in ("epoch", "tr_loss", "tr_acc", "val_acc")
                if k in raw and isinstance(raw[k], (int, float))}
    else:
        state_dict = raw
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()

    cfg = parse_config(args.cfg_file)
    model = Classifier(cfg=cfg)
    sr = int(cfg["audio_config"]["sample_rate"])
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, sr), jnp.float32),
        train=False)
    v2 = import_torch_classifier(state_dict, variables,
                                 cfg["model"]["arch"])

    import optax
    state = TrainState.create(
        apply_fn=model.apply, params=v2["params"],
        batch_stats=v2["batch_stats"], tx=optax.identity())
    path = save_checkpoint(
        args.out_expdir, state, epoch=int(meta.get("epoch", 0)),
        tr_loss=float(meta.get("tr_loss", -1.0)),
        tr_acc=float(meta.get("tr_acc", -1.0)),
        val_acc=float(meta.get("val_acc", -1.0)))
    n = len(jax.tree_util.tree_leaves(v2["params"]))
    print(f"imported {n} param tensors -> {path}")


if __name__ == "__main__":
    main()
