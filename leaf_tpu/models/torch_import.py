"""Import reference (leaf-pytorch) torch classifier checkpoints.

An ↑ over the reference's migration story: the reference can only re-use a
trained LEAF frontend (frontend_helper.py:30-46, README.md:94-114); this
maps a FULL reference classifier ``state_dict`` — frontend + backbone,
parameters AND BatchNorm running statistics — onto our Flax variable
trees, so a user switching frameworks mid-project keeps their trained
models.

Layout conversions (torch → Flax/NHWC):
  conv   ``weight`` (O, I, kH, kW)   → ``kernel`` (kH, kW, I, O)
  depthwise conv (C, 1, k, k)        → (k, k, 1, C)  (same transpose)
  linear ``weight`` (O, I)           → ``kernel`` (I, O)
  bn     ``weight``/``bias``         → ``scale``/``bias``  (params)
         ``running_mean``/``_var``   → ``mean``/``var``    (batch_stats)

Name maps mirror the per-arch module naming verified numerically by the
parity suites (tests/test_trajectory_parity.py, test_resnet18_parity.py,
test_efficientnet_parity.py) against reference models/resnet.py,
models/vanilla_cifar_resnet.py and models/efficientnet/model.py.
Unknown keys raise — a silent partial import is worse than an error.
DenseNet is not importable because the reference's own densenet factories
are dead code (models/densenet.py NameError — see PARITY.md).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

__all__ = ["import_torch_classifier", "import_torch_backbone"]

_IGNORE = re.compile(r"num_batches_tracked$")


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv_k(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (2, 3, 1, 0))  # OIHW → HWIO (also depthwise)


def _frontend_key(k: str):
    """features.* → (tree, path, transform) per the reference Leaf naming
    (same map as scripts/convert_torch_checkpoint.py)."""
    table = {
        "_complex_conv._kernel": ("params", ("complex_conv", "kernel"),
                                  None),
        "_pooling.weights": ("params", ("pooling", "weights"),
                             lambda a: a.reshape(-1)),
        "_pooling._bias": ("params", ("pooling", "bias"), None),
        "_compression.alpha": ("params", ("compression", "alpha"), None),
        "_compression.delta": ("params", ("compression", "delta"), None),
        "_compression.root": ("params", ("compression", "root"), None),
        "_compression.ema._weights": ("params",
                                      ("compression", "ema", "weights"),
                                      None),
    }
    return table.get(k)


def _bn_entry(flax_dir: Tuple[str, ...], leaf: str, wrap: bool):
    inner = flax_dir + (("BatchNorm_0",) if wrap else ())
    return {
        "weight": ("params", inner + ("scale",), None),
        "bias": ("params", inner + ("bias",), None),
        "running_mean": ("batch_stats", inner + ("mean",), None),
        "running_var": ("batch_stats", inner + ("var",), None),
    }.get(leaf)


def _resnet_key(k: str, bn_wrap: bool, final: str):
    """Shared resnet / cifar_resnet torch-key router.

    ``bn_wrap``: our torchvision-style ResNet wraps BatchNorm in a _BN
    module (path gains 'BatchNorm_0'); cifar_resnet names it directly.
    ``final``: 'fc' (resnet) or 'linear' (cifar_resnet).
    """
    m = re.match(rf"^{final}\.(weight|bias)$", k)
    if m:
        if m.group(1) == "weight":
            return "params", (final, "kernel"), lambda a: a.T
        return "params", (final, "bias"), None
    if k == "conv1.weight":
        return "params", ("conv1", "kernel"), _conv_k
    m = re.match(r"^bn1\.(\w+)$", k)
    if m:
        return _bn_entry(("bn1",), m.group(1), bn_wrap)
    m = re.match(r"^layer(\d+)\.(\d+)\.(.+)$", k)
    if not m:
        return None
    blk = f"layer{m.group(1)}_{m.group(2)}"
    rest = m.group(3)
    m2 = re.match(r"^(conv\d)\.weight$", rest)
    if m2:
        return "params", (blk, m2.group(1), "kernel"), _conv_k
    m2 = re.match(r"^(bn\d)\.(\w+)$", rest)
    if m2:
        return _bn_entry((blk, m2.group(1)), m2.group(2), bn_wrap)
    if rest == "downsample.0.weight":
        return "params", (blk, "downsample_conv", "kernel"), _conv_k
    m2 = re.match(r"^downsample\.1\.(\w+)$", rest)
    if m2:
        return _bn_entry((blk, "downsample_bn"), m2.group(1), bn_wrap)
    return None


def _effnet_key(k: str):
    """EfficientNet router (reference models/efficientnet/model.py names)."""
    flat = {
        "_conv_stem.weight": ("params", ("conv_stem", "kernel"), _conv_k),
        "_conv_head.weight": ("params", ("conv_head", "kernel"), _conv_k),
        "_fc.weight": ("params", ("fc", "kernel"), lambda a: a.T),
        "_fc.bias": ("params", ("fc", "bias"), None),
    }
    if k in flat:
        return flat[k]
    m = re.match(r"^_bn([01])\.(\w+)$", k)
    if m:
        return _bn_entry((f"bn{m.group(1)}",), m.group(2), False)
    m = re.match(r"^_blocks\.(\d+)\.(.+)$", k)
    if not m:
        return None
    blk = f"block_{m.group(1)}"
    rest = m.group(2)
    m2 = re.match(r"^_(expand_conv|depthwise_conv|project_conv|se_reduce|"
                  r"se_expand)\.(weight|bias)$", rest)
    if m2:
        mod, leaf = m2.group(1), m2.group(2)
        if leaf == "weight":
            return "params", (blk, mod, "kernel"), _conv_k
        return "params", (blk, mod, "bias"), None
    m2 = re.match(r"^_(bn[012])\.(\w+)$", rest)
    if m2:
        return _bn_entry((blk, m2.group(1)), m2.group(2), False)
    return None


_BACKBONE_ROUTERS = {
    "resnet": lambda k: _resnet_key(k, bn_wrap=True, final="fc"),
    "cifar_resnet": lambda k: _resnet_key(k, bn_wrap=False, final="linear"),
    "efficientnet": _effnet_key,
}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray, key: str):
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(
                f"torch key '{key}' maps to {'/'.join(path)}, but our tree "
                f"has no '{p}' there — arch mismatch?")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(
            f"torch key '{key}' maps to {'/'.join(path)}, absent here")
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch importing '{key}' → {'/'.join(path)}: "
            f"torch {value.shape} vs ours {tuple(node[leaf].shape)}")
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def _leaves(tree, pre=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, pre + (k,))
        else:
            yield pre + (k,)


_FINAL_LAYER = {  # torch head-module name per arch
    "resnet": "fc",
    "cifar_resnet": "linear",
    "efficientnet": "_fc",
}
_STEM_CONV = {  # torch stem-conv key per arch (in-channel adaptation)
    "resnet": "conv1.weight",
    "cifar_resnet": "conv1.weight",
    "efficientnet": "_conv_stem.weight",
}


def import_torch_backbone(state_dict: Dict, variables: Dict, arch: str,
                          load_fc: bool = False) -> Dict:
    """Map a BARE backbone ``state_dict`` (no ``model.`` prefix — e.g. the
    published ImageNet EfficientNet weights, reference
    models/efficientnet/utils.py:556-617, or any torch backbone checkpoint)
    onto our ``Classifier`` variables, keeping frontend + head fresh.

    Reference semantics matched:
    - ``load_fc=False`` (default) pops the final layer's weights and keeps
      our freshly initialized head — the pretrained-ckpt fc-swap of
      models/model_helper.py:78-94 / ``load_pretrained_weights(load_fc=
      False)`` (utils.py:605-613).
    - A stem conv whose in-channel count differs from ours (ImageNet 3-ch
      vs audio 1-ch) is skipped and our fresh stem kept — exactly
      ``EfficientNet._change_in_channels`` (reference model.py:410-419),
      which re-initializes the stem after loading pretrained weights.

    Everything else must be covered; unknown keys and uncovered leaves
    raise, as in ``import_torch_classifier``.
    """
    if arch not in _BACKBONE_ROUTERS:
        raise NotImplementedError(
            f"arch '{arch}' is not importable (reference densenet "
            f"factories are dead code — models/densenet.py NameError)")
    route_backbone = _BACKBONE_ROUTERS[arch]
    final = _FINAL_LAYER[arch]
    import jax

    out = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {})),
    }

    filled, skipped = set(), set()
    for key, value in state_dict.items():
        k = key
        for prefix in ("module.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if _IGNORE.search(k):
            continue
        if not load_fc and (k == f"{final}.weight" or k == f"{final}.bias"):
            skipped.add(k)  # fresh head, reference fc-swap semantics
            continue
        spec = route_backbone(k)
        if spec is None:
            raise KeyError(f"unrecognized torch backbone key: '{key}'")
        tree, path, transform = spec
        arr = _np(value)
        if transform is not None:
            arr = transform(arr)
        full = ("model",) + path
        if k == _STEM_CONV[arch]:
            node = out[tree]
            for p in full:
                node = node[p]
            if tuple(node.shape) != tuple(arr.shape):
                # in-channel mismatch (e.g. ImageNet 3-ch vs audio 1-ch):
                # keep our fresh stem (_change_in_channels semantics)
                skipped.add(k)
                continue
        _set(out[tree], full, arr, key)
        filled.add((tree, full))

    # every backbone leaf must be covered except the (intentionally fresh)
    # head and a channel-mismatched stem; the frontend stays fresh too
    fresh_ok = {("model", final if arch != "efficientnet" else "fc")}
    if any(k == _STEM_CONV[arch] for k in skipped):
        stem = _STEM_CONV[arch].split(".")[0].lstrip("_")
        fresh_ok.add(("model", stem))
    missing = []
    for t in ("params", "batch_stats"):
        for p in _leaves(out[t].get("model", {}) if out[t] else {}):
            full = ("model",) + p
            if (t, full) in filled:
                continue
            if any(full[:len(pre)] == pre for pre in fresh_ok):
                continue
            missing.append((t,) + full)
    if missing:
        names = ["/".join(m) for m in missing[:8]]
        raise ValueError(
            f"backbone checkpoint left {len(missing)} of our leaves "
            f"unfilled (first: {names})")
    return out


def import_torch_classifier(state_dict: Dict, variables: Dict,
                            arch: str) -> Dict:
    """Map a reference classifier ``state_dict`` onto our variables.

    ``variables`` = ``{"params": ..., "batch_stats": ...}`` from our
    ``Classifier.init`` for the SAME arch/num_classes (it provides the
    target structure and shape checks). Returns new variables with every
    leaf replaced; raises on unknown torch keys, shape mismatches, or
    leaves the checkpoint failed to cover.
    """
    if arch not in _BACKBONE_ROUTERS:
        raise NotImplementedError(
            f"arch '{arch}' is not importable (reference densenet "
            f"factories are dead code — models/densenet.py NameError)")
    route_backbone = _BACKBONE_ROUTERS[arch]
    import jax

    # tree_map builds fresh containers, so _set never mutates the caller's
    out = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {})),
    }

    filled = set()
    for key, value in state_dict.items():
        k = key
        for prefix in ("module.",):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if _IGNORE.search(k):
            continue
        if k.startswith("features."):
            spec = _frontend_key(k[len("features."):])
            root = "features"
        elif k.startswith("model."):
            spec = route_backbone(k[len("model."):])
            root = "model"
        else:
            spec = None
            root = None
        if spec is None:
            raise KeyError(f"unrecognized torch checkpoint key: '{key}'")
        tree, path, transform = spec
        arr = _np(value)
        if transform is not None:
            arr = transform(arr)
        full = (root,) + path
        _set(out[tree], full, arr, key)
        filled.add((tree, full))

    missing = [(t,) + p for t in ("params", "batch_stats")
               for p in _leaves(out[t] or {})
               if (t, p) not in filled]
    # our frontend may hold leaves the reference Leaf lacks only when
    # configured beyond it; a default-config import must cover everything
    if missing:
        names = ["/".join(m) for m in missing[:8]]
        raise ValueError(
            f"torch checkpoint left {len(missing)} of our leaves "
            f"unfilled (first: {names}) — partial imports are refused; "
            f"use scripts/convert_torch_checkpoint.py for frontend-only")
    return out
