from leaf_tpu.frontend.convolution import GaborConstraint, GaborConv1d, gabor_constraint
from leaf_tpu.frontend.filters import GaborParams
from leaf_tpu.frontend.frontend import Leaf, SquaredModulus
from leaf_tpu.frontend.helper import get_frontend
from leaf_tpu.frontend.impulse_responses import (
    gabor_filters,
    gabor_impulse_response,
    gaussian_lowpass,
)
from leaf_tpu.frontend.initializers import GaborInit, make_initializer
from leaf_tpu.frontend.melbanks import melscale_fbanks
from leaf_tpu.frontend.pooling import GaussianLowPass
from leaf_tpu.frontend.postprocessing import ExponentialMovingAverage, PCENLayer, ema_scan
from leaf_tpu.frontend.streaming import LeafStreamer, StreamingLeafCell, streaming_geometry

__all__ = [
    "GaborConstraint",
    "GaborConv1d",
    "gabor_constraint",
    "GaborParams",
    "Leaf",
    "SquaredModulus",
    "get_frontend",
    "gabor_filters",
    "gabor_impulse_response",
    "gaussian_lowpass",
    "GaborInit",
    "make_initializer",
    "melscale_fbanks",
    "GaussianLowPass",
    "ExponentialMovingAverage",
    "PCENLayer",
    "ema_scan",
    "LeafStreamer",
    "StreamingLeafCell",
    "streaming_geometry",
]
