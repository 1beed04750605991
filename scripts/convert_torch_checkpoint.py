#!/usr/bin/env python
"""Convert a reference (leaf-pytorch) torch checkpoint's LEAF frontend into
this framework's parameter layout.

The reference's pretrained-model story extracts `model.features` (the LEAF
frontend) from a trained classifier checkpoint and re-uses it
(reference: README.md:94-114, frontend_helper.py:30-46). This converter
maps those tensors onto our Flax param tree so `Leaf`/`Classifier` can start
from reference-trained frontends.

Key map (reference state_dict → leaf_tpu params):
  features._complex_conv._kernel  (F, 2)      → complex_conv/kernel
  features._pooling.weights       (1,1,C,1)   → pooling/weights (C,)
  features._pooling._bias         (C,)        → pooling/bias
  features._compression.alpha/delta/root (C,) → compression/{alpha,delta,root}
  features._compression.ema._weights (C,)     → compression/ema/weights

Usage:
  python scripts/convert_torch_checkpoint.py ckpt.pth out_dir/
The output is a numpy .npz with our key layout plus a JSON manifest;
load with `leaf_tpu.training.checkpoint.load_converted_frontend`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


KEY_MAP = {
    "_complex_conv._kernel": ("complex_conv", "kernel", None),
    "_pooling.weights": ("pooling", "weights", lambda a: a.reshape(-1)),
    "_pooling._bias": ("pooling", "bias", None),
    "_compression.alpha": ("compression", "alpha", None),
    "_compression.delta": ("compression", "delta", None),
    "_compression.root": ("compression", "root", None),
    "_compression.ema._weights": ("compression", "ema", "weights", None),
}


def convert_frontend_state_dict(state_dict: dict) -> dict:
    """torch tensors (already .numpy()'d or torch) → flat {path: ndarray}."""
    out = {}
    for key, value in state_dict.items():
        # strip common prefixes: 'features.' (Classifier) or 'module.'
        k = key
        for prefix in ("module.", "features.", "model.features."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if k not in {mk for mk in KEY_MAP}:
            continue
        spec = KEY_MAP[k]
        *path, transform = spec
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value,
                         dtype=np.float32)
        if transform is not None:
            arr = transform(arr)
        out["/".join(path)] = arr
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    args = p.parse_args()
    import torch

    raw = torch.load(args.torch_ckpt, map_location="cpu",
                     weights_only=False)
    # Reference training checkpoints store weights under "model_state_dict"
    # (reference: train_xla.py:38-41); bare exports may use "state_dict" or
    # "model", or be a raw state_dict / nn.Module.
    if isinstance(raw, dict):
        state_dict = (raw.get("model_state_dict") or raw.get("state_dict")
                      or raw.get("model") or raw)
    else:
        state_dict = raw
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()

    flat = convert_frontend_state_dict(state_dict)
    if not flat:
        print("no LEAF frontend keys found in checkpoint", file=sys.stderr)
        sys.exit(1)
    os.makedirs(args.out_dir, exist_ok=True)
    np.savez(os.path.join(args.out_dir, "frontend_params.npz"), **flat)
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump({k: list(v.shape) for k, v in flat.items()}, f, indent=2)
    print(f"wrote {len(flat)} tensors to {args.out_dir}")


if __name__ == "__main__":
    main()
