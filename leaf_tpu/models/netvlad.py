"""NetVLAD pooling head, MXU-formulated.

Capability parity with the reference's 16-cluster NetVLAD
(reference: models/netvlad.py:10-65), but computed as two einsums instead of
materializing the (B, K, C, N) residual broadcast — the contraction
``vlad[b,k,c] = Σ_n a[b,n,k]·x[b,n,c] − (Σ_n a[b,n,k])·centroid[k,c]``
maps straight onto the MXU and keeps HBM traffic O(B·N·(C+K)).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["NetVLAD"]


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class NetVLAD(nn.Module):
    """(B, H, W, C) → (B, num_clusters * C) VLAD descriptor.

    Init matches the reference: centroids ~ U[0,1); soft-assign conv weight
    = 2·alpha·centroids, bias = −alpha·||centroid|| (models/netvlad.py:35-41).
    """

    num_clusters: int = 16
    dim: int = 512
    alpha: float = 100.0
    normalize_input: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        centroids = self.param(
            "centroids",
            lambda key, shape, dtype: jax.random.uniform(key, shape, dtype),
            (self.num_clusters, self.dim),
            self.param_dtype,
        )

        # The soft-assign 1×1 conv is initialized FROM the centroids
        # (weight = 2α·c, bias = −α·||c||, reference: models/netvlad.py:35-41)
        # but is an independent trainable tensor thereafter — the init
        # closures capture the freshly created centroid values.
        weight = self.param(
            "assign_weight",
            lambda key, shape, dtype: (2.0 * self.alpha * centroids
                                       ).astype(dtype),
            (self.num_clusters, self.dim),
            self.param_dtype,
        )
        bias = self.param(
            "assign_bias",
            lambda key, shape, dtype: (
                -self.alpha * jnp.linalg.norm(centroids, axis=1)
            ).astype(dtype),
            (self.num_clusters,),
            self.param_dtype,
        )

        if self.normalize_input:
            x = _l2_normalize(x, axis=-1)

        weight = weight.astype(x.dtype)
        bias = bias.astype(x.dtype)
        flat = x.reshape(b, h * w, c)  # (B, N, C)
        logits = jnp.einsum("bnc,kc->bnk", flat, weight) + bias
        assign = jax.nn.softmax(logits, axis=-1)  # (B, N, K)

        # vlad[b,k,c] = Σ_n a·x − (Σ_n a)·centroid
        weighted = jnp.einsum("bnk,bnc->bkc", assign, flat)
        mass = jnp.sum(assign, axis=1)  # (B, K)
        vlad = weighted - mass[:, :, None] * centroids.astype(x.dtype)[None]

        vlad = _l2_normalize(vlad, axis=-1)  # intra-normalization
        vlad = vlad.reshape(b, -1)
        return _l2_normalize(vlad, axis=-1)
