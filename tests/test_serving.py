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


# ---------------------------------------------------------------------------
# Streaming export (save_exported_streaming / StreamingServingModel)
# ---------------------------------------------------------------------------

from leaf_tpu.frontend import Leaf, LeafStreamer  # noqa: E402
from leaf_tpu.serving import (  # noqa: E402
    StreamingServingModel,
    save_exported_streaming,
)


@pytest.fixture(scope="module")
def streaming_artifact(tmp_path_factory):
    leaf = Leaf(use_fused_kernel="off")
    variables = leaf.init(jax.random.PRNGKey(0), jnp.zeros((2, 16000)))
    out = str(tmp_path_factory.mktemp("stream_artifact"))
    manifest = save_exported_streaming(out, leaf, variables,
                                       chunk_size=1600, n_streams=2)
    return leaf, variables, out, manifest


def test_streaming_manifest_and_files(streaming_artifact):
    _, _, out, manifest = streaming_artifact
    assert manifest["chunk_size"] == 1600 and manifest["n_streams"] == 2
    assert manifest["geometry"]["tail"] == 720
    for name in manifest["files"].values():
        assert os.path.exists(os.path.join(out, name))
    assert set(manifest["files"]) == {"first", "steady", "flush_0"}


def test_streaming_roundtrip_matches_live_streamer(streaming_artifact):
    leaf, variables, out, _ = streaming_artifact
    wave = np.random.RandomState(0).randn(2, 8000).astype(np.float32) * 0.1

    live = LeafStreamer(leaf, variables, chunk_size=1600)
    served = StreamingServingModel.load(out)
    live_out, served_out = [], []
    for i in range(5):
        c = wave[:, i * 1600:(i + 1) * 1600]
        live_out.append(live.process(c))
        served_out.append(served.process(c))
    live_out.append(live.flush())
    served_out.append(served.flush())
    a = np.concatenate([np.asarray(o) for o in live_out], axis=1)
    b = np.concatenate([np.asarray(o) for o in served_out], axis=1)
    assert a.shape == b.shape == (2, 50, 40)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)
    # ... and both equal the offline apply
    ref = np.asarray(leaf.apply(variables, wave))
    np.testing.assert_allclose(b, ref, rtol=2e-5, atol=2e-6)


def test_streaming_served_rejects_remainder_flush(streaming_artifact):
    _, _, out, _ = streaming_artifact
    served = StreamingServingModel.load(out)
    served.process(np.zeros((2, 1600), np.float32))
    with pytest.raises(ValueError, match="no 'flush_160' variant"):
        served.flush(np.zeros((2, 160), np.float32))


def test_streaming_served_reset(streaming_artifact):
    _, _, out, _ = streaming_artifact
    served = StreamingServingModel.load(out)
    wave = np.random.RandomState(1).randn(2, 3200).astype(np.float32) * 0.1
    a = [np.asarray(served.process(wave[:, :1600])),
         np.asarray(served.process(wave[:, 1600:])),
         np.asarray(served.flush())]
    served.reset()
    b = [np.asarray(served.process(wave[:, :1600])),
         np.asarray(served.process(wave[:, 1600:])),
         np.asarray(served.flush())]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
