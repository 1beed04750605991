"""Pallas TPU kernels for the LEAF hot path.

The reference delegates all compute to torch ops lowered by torch-xla
(reference has no native kernels — SURVEY §2.9); here the frontend's
conv → squared-modulus → lowpass chain gets a hand-fused TPU kernel that
eliminates the (B, T, 2F) and (B, T, F) HBM round-trips entirely.
"""

from leaf_tpu.ops.fused_frontend import fused_gabor_sqmod_lowpass

__all__ = ["fused_gabor_sqmod_lowpass"]
