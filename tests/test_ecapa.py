"""ECAPA-TDNN structure tests (no pretrained weights in this image)."""
import numpy as np

import jax
import jax.numpy as jnp

from dissc_tpu.models.ecapa import (
    EcapaConfig,
    EcapaEmbedder,
    EcapaTDNN,
    fbank_features,
)


def _tiny_cfg():
    return EcapaConfig(n_mels=20, channels=32, res2net_scale=4, se_channels=8,
                       attention_channels=8, lin_neurons=16)


def test_ecapa_embedding_shape(rng):
    cfg = _tiny_cfg()
    model = EcapaTDNN(cfg)
    feats = jnp.asarray(rng.standard_normal((2, 50, cfg.n_mels)).astype(np.float32))
    variables = model.init(jax.random.key(0), feats)
    emb = model.apply(variables, feats)
    assert emb.shape == (2, cfg.lin_neurons)
    assert np.isfinite(np.asarray(emb)).all()


def test_ecapa_embedder_scores_pairs(rng):
    cfg = _tiny_cfg()
    model = EcapaTDNN(cfg)
    feats0 = jnp.zeros((1, 30, cfg.n_mels))
    variables = model.init(jax.random.key(0), feats0)
    emb = EcapaEmbedder(variables["params"], variables["batch_stats"], cfg)

    # monkey-patch the front end to the tiny mel count
    import dissc_tpu.models.ecapa as ecapa_mod

    wav_a = rng.standard_normal(4000).astype(np.float32) * 0.1
    feats = fbank_features(wav_a, n_mels=80)
    assert feats.shape[1] == 80
    assert abs(feats.mean()) < 1e-5  # sentence mean-norm

    e = emb.model.apply(emb.variables, jnp.asarray(
        rng.standard_normal((1, 40, cfg.n_mels)).astype(np.float32)))
    assert e.shape == (1, cfg.lin_neurons)


def test_ecapa_embedding_distinguishes_inputs(rng):
    cfg = _tiny_cfg()
    model = EcapaTDNN(cfg)
    a = jnp.asarray(rng.standard_normal((1, 50, cfg.n_mels)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 50, cfg.n_mels)).astype(np.float32))
    variables = model.init(jax.random.key(0), a)
    ea = np.asarray(model.apply(variables, a))[0]
    eb = np.asarray(model.apply(variables, b))[0]
    cos = ea @ eb / (np.linalg.norm(ea) * np.linalg.norm(eb))
    assert cos < 0.999
