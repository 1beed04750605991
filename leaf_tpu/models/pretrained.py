"""One-call pretrained-backbone loading.

The reference ships a URL map + loader for the lukemelas ImageNet
EfficientNet weights (reference models/efficientnet/utils.py:556-617) and
re-initializes the classification head after loading any pretrained
checkpoint (reference models/model_helper.py:78-94). This module is the
user-facing equivalent: resolve a local path OR a model name (via the
published filename convention / a download attempt when the host has
egress), map the torch state_dict onto our Flax ``Classifier`` variables
with ``import_torch_backbone``, and keep the head fresh unless asked
otherwise.

Example::

    variables = jax.jit(model.init, ...)(rngs, x, train=False)
    variables = load_pretrained_backbone(
        "efficientnet-b0", variables, arch="efficientnet")
    # or an explicit file:
    variables = load_pretrained_backbone(
        "/weights/efficientnet-b0-355c32eb.pth", variables,
        arch="efficientnet")
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

__all__ = ["load_pretrained_backbone", "EFFICIENTNET_URLS"]

# Published ImageNet weights, reference models/efficientnet/utils.py:556-566
# (the AutoAugment set; the reference also carries an AdvProp map at
# utils.py:570-580 — pass an explicit file path to use those).
EFFICIENTNET_URLS = {
    "efficientnet-b0": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b0-355c32eb.pth",  # noqa: E501
    "efficientnet-b1": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b1-f1951068.pth",  # noqa: E501
    "efficientnet-b2": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b2-8bb594d6.pth",  # noqa: E501
    "efficientnet-b3": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b3-5fb5a3c3.pth",  # noqa: E501
    "efficientnet-b4": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b4-6ed6700e.pth",  # noqa: E501
    "efficientnet-b5": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b5-b6417697.pth",  # noqa: E501
    "efficientnet-b6": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b6-c76e70fd.pth",  # noqa: E501
    "efficientnet-b7": "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/efficientnet-b7-dcc49843.pth",  # noqa: E501
}


def _cache_dirs():
    """Where to look for already-downloaded weight files: our own cache,
    then torch hub's (the reference's model_zoo.load_url target)."""
    dirs = [os.path.expanduser("~/.cache/leaf_tpu/pretrained")]
    hub = os.environ.get("TORCH_HOME")
    if hub:
        dirs.append(os.path.join(hub, "hub", "checkpoints"))
    dirs.append(os.path.expanduser("~/.cache/torch/hub/checkpoints"))
    return dirs


def _resolve_weights(name_or_path: str) -> str:
    """A filesystem path is used as-is; a model name resolves through the
    local caches by the published filename convention, then (last resort)
    a download attempt — hosts without egress get an actionable error
    naming the URL instead of a hang."""
    if os.path.exists(name_or_path):
        return name_or_path
    url = EFFICIENTNET_URLS.get(name_or_path)
    if url is None:
        raise FileNotFoundError(
            f"'{name_or_path}' is neither a weights file nor a known "
            f"pretrained model name (known: {sorted(EFFICIENTNET_URLS)})")
    fname = os.path.basename(url)
    stem = fname.split("-")[:-1]  # drop the hash suffix for glob matching
    for d in _cache_dirs():
        exact = os.path.join(d, fname)
        if os.path.exists(exact):
            return exact
        loose = glob.glob(os.path.join(d, "-".join(stem) + "-*.pth"))
        if loose:
            return loose[0]
    try:
        import torch.hub
        dst = _cache_dirs()[0]
        os.makedirs(dst, exist_ok=True)
        path = os.path.join(dst, fname)
        torch.hub.download_url_to_file(url, path, progress=False)
        return path
    except Exception as e:
        raise FileNotFoundError(
            f"pretrained weights for '{name_or_path}' not found locally "
            f"and the download failed ({type(e).__name__}: {e}). Download "
            f"{url} on a host with network access and place it in "
            f"{_cache_dirs()[0]}/ (or pass its path directly).") from e


def load_pretrained_backbone(name_or_path: str, variables: Dict, arch: str,
                             load_fc: bool = False,
                             state_dict: Optional[Dict] = None) -> Dict:
    """Load torch backbone weights into ``Classifier`` variables.

    Args:
      name_or_path: weights file path, or a published model name
        (``efficientnet-b0`` … ``b7``) resolved via the local caches /
        a download attempt — the one-call equivalent of the reference's
        ``load_pretrained_weights`` (models/efficientnet/utils.py:584-617).
      variables: freshly initialized ``{"params", "batch_stats"}`` of the
        target ``Classifier`` (frontend entries are left untouched).
      arch: ``efficientnet`` / ``resnet`` / ``cifar_resnet``.
      load_fc: False (default) keeps our freshly initialized head — the
        head-swap the reference applies to every pretrained checkpoint
        (models/model_helper.py:78-94). True requires matching class count.
      state_dict: already-loaded torch state_dict (skips file resolution).

    Returns new variables (numpy leaves), ready for ``TrainState.create``.
    """
    if state_dict is None:
        import torch
        path = _resolve_weights(name_or_path)
        state_dict = torch.load(path, map_location="cpu",
                                weights_only=True)
    if hasattr(state_dict, "state_dict"):  # a full nn.Module was saved
        state_dict = state_dict.state_dict()
    if "state_dict" in state_dict and isinstance(
            state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]

    from .torch_import import import_torch_backbone
    return import_torch_backbone(state_dict, variables, arch,
                                 load_fc=load_fc)
