"""Serving-export tests: AOT artifacts round-trip and match live apply."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leaf_tpu.models import Classifier
from leaf_tpu.serving import ServingModel, save_exported

SR = 16000

CFG = {
    "frontend": {"name": "leaf", "default_args": False, "n_filters": 40},
    "audio_config": {"sample_rate": SR},
    "model": {"arch": "cifar_resnet", "model_depth": 20,
              "num_classes": 5, "type": "multiclass"},
    "opt": {"optimizer": "Adam", "lr": 1e-3, "weight_decay": 0,
            "scheduler": "step", "batch_size": 4},
}


@pytest.fixture(scope="module")
def exported_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("serving")
    model = Classifier(cfg=CFG)
    x = jnp.zeros((2, SR), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    manifest = save_exported(str(out), CFG, variables, batch_sizes=(1, 4))
    return out, variables, manifest


def test_manifest_and_files(exported_dir):
    out, _, manifest = exported_dir
    assert manifest["batch_sizes"] == [1, 4]
    assert manifest["num_classes"] == 5
    assert manifest["clip_samples"] == SR
    for name in manifest["files"].values():
        assert os.path.getsize(os.path.join(out, name)) > 1000


def test_roundtrip_matches_live_apply(exported_dir):
    out, variables, _ = exported_dir
    model = Classifier(cfg=CFG)
    serve = ServingModel.load(str(out))
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (4, SR))) * 0.1
    live = np.asarray(jax.jit(
        lambda w: model.apply(variables, w, train=False))(jnp.asarray(x)))
    got = serve(x)
    np.testing.assert_allclose(got, live, atol=1e-5)


def test_bucket_padding_and_chunking(exported_dir):
    out, variables, _ = exported_dir
    model = Classifier(cfg=CFG)
    serve = ServingModel.load(str(out))
    # B=3 → padded into the 4-bucket; B=6 → chunks of 4 + 2(→4 bucket)
    for n in (1, 3, 6):
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(n), (n, SR))) * 0.1
        live = np.asarray(jax.jit(
            lambda w: model.apply(variables, w, train=False))(
                jnp.asarray(x)))
        got = serve(x)
        assert got.shape == (n, 5)
        np.testing.assert_allclose(got, live, atol=1e-5)


def test_wrong_length_asserts(exported_dir):
    out, _, _ = exported_dir
    serve = ServingModel.load(str(out))
    with pytest.raises(AssertionError):
        serve(np.zeros((2, SR + 1), np.float32))
