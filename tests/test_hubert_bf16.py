"""bf16 HuBERT encode: same params, reduced-precision compute.

Policy mirrors the vocoder's compute_dtype: f32 stays the default (the
<2e-4 transformers parity dtype); bf16 is the opt-in serving speed path.
The k-means argmin always runs f32, so units stay discrete-stable.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.models.hubert import HubertConfig, HubertEncoder, kmeans_quantize

pytestmark = pytest.mark.fast


def _cfg(**kw):
    return HubertConfig(
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=24, num_layers=2, num_heads=4, intermediate_size=48,
        conv_pos_kernel=16, conv_pos_groups=2, output_layer=2, **kw)


def test_bf16_features_close_and_units_stable(rng):
    wav = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
    f32 = HubertEncoder(_cfg())
    params = f32.init(jax.random.key(0), wav)["params"]
    bf16 = HubertEncoder(_cfg(compute_dtype="bfloat16"))

    feats32 = f32.apply({"params": params}, wav)
    feats16 = bf16.apply({"params": params}, wav)
    # the matmuls/convs run bf16 (nn.Dense/nn.Conv dtype); the f32-param
    # LayerNorms promote activations back to f32 between them — a
    # mixed-precision scheme, so the OUTPUT dtype is f32 by design
    assert feats16.dtype == jnp.float32
    assert not np.array_equal(np.asarray(feats16), np.asarray(feats32))
    # relative feature error small vs the feature scale
    scale = float(jnp.std(feats32))
    err = float(jnp.max(jnp.abs(feats16.astype(jnp.float32) - feats32)))
    assert err < 0.15 * max(scale, 1e-3), (err, scale)

    # units from a realistic (well-separated) codebook agree on almost
    # every frame — the discrete interface absorbs bf16 rounding
    codebook = jnp.asarray(rng.standard_normal((50, 24)).astype(np.float32))
    u32 = np.asarray(kmeans_quantize(feats32, codebook))
    u16 = np.asarray(kmeans_quantize(feats16, codebook))
    agree = (u32 == u16).mean()
    assert agree >= 0.95, agree


def test_f32_path_unchanged(rng):
    """compute_dtype=None must be bit-identical to the previous f32 path."""
    wav = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.1)
    model = HubertEncoder(_cfg())
    params = model.init(jax.random.key(1), wav)["params"]
    out = model.apply({"params": params}, wav)
    assert out.dtype == jnp.float32
