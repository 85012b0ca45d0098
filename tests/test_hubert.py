"""HuBERT architecture parity vs transformers' HubertModel.

No pretrained weights exist in this sandbox (zero egress), so parity is
checked the strong way: build HF's HubertModel with random init, convert
its state dict through our converter, and require near-identical
features — this validates both the architecture and the converter, so
the released facebook/hubert-base-ls960 checkpoint will load correctly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.models.hubert import (
    HubertConfig,
    HubertEncoder,
    SpeechUnitEncoder,
    convert_hf_state_dict,
    kmeans_quantize,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_cfg():
    return HubertConfig(
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=24, num_layers=2, num_heads=4, intermediate_size=48,
        conv_pos_kernel=16, conv_pos_groups=2, output_layer=2,
    )


def _hf_model(cfg: HubertConfig):
    hf_cfg = transformers.HubertConfig(
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.conv_pos_kernel,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_act="gelu",
        feat_extract_activation="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    model = transformers.HubertModel(hf_cfg)
    model.eval()
    return model


def test_hubert_matches_transformers(rng):
    cfg = _tiny_cfg()
    hf = _hf_model(cfg)
    wav = rng.standard_normal((2, 1600)).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = hf(torch.tensor(wav), output_hidden_states=True)
    ref_feats = ref.hidden_states[cfg.output_layer].numpy()

    params = convert_hf_state_dict(hf.state_dict(), cfg)
    model = HubertEncoder(cfg)
    ours = model.apply({"params": params}, jnp.asarray(wav))
    assert ours.shape == ref_feats.shape
    np.testing.assert_allclose(np.asarray(ours), ref_feats, atol=2e-4, rtol=1e-3)


def test_kmeans_quantize(rng):
    feats = rng.standard_normal((1, 6, 4)).astype(np.float32)
    codebook = rng.standard_normal((10, 4)).astype(np.float32)
    units = np.asarray(kmeans_quantize(jnp.asarray(feats), jnp.asarray(codebook)))
    ref = np.argmin(
        ((feats[:, :, None, :] - codebook[None, None, :, :]) ** 2).sum(-1), axis=-1
    )
    np.testing.assert_array_equal(units, ref)


def test_speech_unit_encoder_contract(rng):
    cfg = _tiny_cfg()
    model = HubertEncoder(cfg)
    wav = rng.standard_normal(4800).astype(np.float32) * 0.1
    params = model.init(jax.random.key(0), jnp.asarray(wav[None]))["params"]
    codebook = rng.standard_normal((100, cfg.hidden_size)).astype(np.float32)
    enc = SpeechUnitEncoder(params, codebook, cfg)
    out = enc(wav)
    assert set(out.keys()) == {"units", "f0"}
    assert len(out["units"]) == len(out["f0"]) > 0
    assert all(0 <= u < 100 for u in out["units"])
