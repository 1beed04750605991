"""Every shipped experiment config must parse and build its model."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from leaf_tpu.models import Classifier
from leaf_tpu.training.config import (check_and_fill_optional_arguments,
                                      parse_config)

CFGS = sorted(glob.glob("cfgs/*/*.cfg"))


def test_all_cfgs_found():
    assert len(CFGS) == 14, CFGS


@pytest.mark.parametrize("cfg_file", CFGS, ids=lambda p: p.replace("cfgs/", ""))
def test_cfg_parses_and_model_builds(cfg_file):
    cfg = check_and_fill_optional_arguments(parse_config(cfg_file))
    model = Classifier(cfg=cfg)
    # tiny waveform — just module construction + shape plumbing
    sr = int(cfg["audio_config"]["sample_rate"])
    x = jnp.zeros((1, sr), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False))
    assert "params" in variables
