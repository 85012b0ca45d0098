"""HuBERT encoder + k-means unit quantizer.

The reference extracts discrete units with textlesslib's
``SpeechEncoder.by_name(dense='hubert-base-ls960', quantizer='kmeans',
vocab=100, deduplicate=False)`` (reference ``data/encode.py:21-22``) —
a fairseq HuBERT-base forward to a chosen transformer layer, followed by
nearest-centroid k-means over 100 clusters.  Here the whole path is one
jitted XLA program: conv feature extractor -> feature projection ->
conv positional embedding -> 12 post-LN transformer layers -> k-means
argmin, in NWC layout with MXU-shaped matmuls.

Weights load from a HuggingFace ``transformers`` HubertModel state dict
(:func:`convert_hf_state_dict`) — the released facebook/hubert-base-
ls960 checkpoint maps 1:1 — plus a ``[vocab, width]`` k-means codebook
array.  GSLM-style unit extraction uses transformer layer 6 features
(the textlesslib hubert-base-ls960/km100 pairing); ``output_layer`` is
configurable.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    output_layer: int = 6  # GSLM/textlesslib km100 operates on layer-6 features
    # Computation dtype for the conv/matmul stacks ('bfloat16' to run the
    # encoder at 2x MXU peak; params stay f32).  None = float32, the
    # dtype the <2e-4 transformers parity is proven on — same opt-in
    # policy as the vocoder's compute_dtype (core/config.py).  The
    # k-means argmin always runs f32 (bf16 distances flip near-tie units).
    compute_dtype: Optional[str] = None

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None


class FeatureExtractor(nn.Module):
    """7-layer strided conv frontend, 320x downsampling (16 kHz -> 50 Hz)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        # x: [B, T] waveform -> [B, F, 512]
        h = x[..., None]
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.cfg.dtype, name=f"conv_{i}")(h)
            if i == 0:
                # per-channel affine norm (HF GroupNorm with groups == channels)
                h = nn.GroupNorm(num_groups=dim, epsilon=self.cfg.layer_norm_eps,
                                 name="group_norm")(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with weight-norm params."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        k = c.conv_pos_kernel
        # weight-norm parameterisation matching fairseq/HF: dim=2 on the
        # [out, in/groups, k] torch weight, i.e. one gain per *kernel
        # position* with the norm over (out, in/groups).
        v = self.param(
            "v", nn.initializers.normal(0.02), (k, c.hidden_size // c.conv_pos_groups,
                                                c.hidden_size)
        )
        g = self.param("g", nn.initializers.ones, (k, 1, 1))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True) + 1e-12)
        kernel = g * v / norm  # renormalize in f32 (weight-sized, cheap)
        bias = self.param("bias", nn.initializers.zeros, (c.hidden_size,))
        pad = k // 2
        dt = c.dtype or x.dtype
        h = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c.conv_pos_groups,
        ) + bias.astype(dt)
        if k % 2 == 0:
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class TransformerLayer(nn.Module):
    """Post-LN transformer block (HuBERT-base: do_stable_layer_norm=False)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x, padding_mask=None):
        c = self.cfg
        d, nh = c.hidden_size, c.num_heads
        hd = d // nh

        dt = c.dtype
        residual = x
        q = nn.Dense(d, dtype=dt, name="q_proj")(x).reshape(*x.shape[:-1], nh, hd)
        k = nn.Dense(d, dtype=dt, name="k_proj")(x).reshape(*x.shape[:-1], nh, hd)
        v = nn.Dense(d, dtype=dt, name="v_proj")(x).reshape(*x.shape[:-1], nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, None, :], scores, -1e9)
        # softmax in f32: bf16 exp/normalize visibly shifts attention rows
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape)
        x = residual + nn.Dense(d, dtype=dt, name="out_proj")(ctx)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="self_attn_layer_norm")(x)

        residual = x
        h = nn.Dense(c.intermediate_size, dtype=dt, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        x = residual + nn.Dense(d, dtype=dt, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)


class HubertEncoder(nn.Module):
    """Waveform -> per-frame features at the requested transformer layer."""

    cfg: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(self, wav, output_layer: Optional[int] = None):
        c = self.cfg
        out_layer = output_layer if output_layer is not None else c.output_layer
        h = FeatureExtractor(c, name="feature_extractor")(wav)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fp_projection")(h)

        h = h + PositionalConvEmbedding(c, name="pos_conv")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(h)
        for i in range(c.num_layers):
            h = TransformerLayer(c, name=f"layer_{i}")(h)
            if i + 1 == out_layer:
                return h
        return h


def kmeans_quantize(features: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid assignment: [B, F, D] x [K, D] -> [B, F] int32.

    One [BF, D] x [D, K] matmul (MXU) + argmin, replacing textlesslib's
    sklearn k-means predict.  Always f32: bf16 distances flip argmin on
    near-tie frames, changing the discrete units.
    """
    features = features.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    sq = jnp.sum(features**2, axis=-1, keepdims=True)
    cb_sq = jnp.sum(codebook**2, axis=-1)
    dots = jnp.einsum("bfd,kd->bfk", features, codebook)
    dist = sq - 2.0 * dots + cb_sq[None, None, :]
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


class SpeechUnitEncoder:
    """End-to-end wav -> {units, f0} extractor (the ``data/encode.py`` engine).

    One jitted program for HuBERT + k-means; YAAPT F0 runs alongside and
    is decimated 200 Hz -> 50 Hz (median over each 20 ms unit frame) so
    ``len(f0) == len(units)``, the alignment the downstream JSONL
    contract expects (SURVEY §1 data contracts).
    """

    def __init__(self, params, codebook: np.ndarray, cfg: HubertConfig = HubertConfig()):
        self.cfg = cfg
        self.model = HubertEncoder(cfg)
        self.params = params
        self.codebook = jnp.asarray(codebook)
        self._jitted = jax.jit(
            lambda p, wav: kmeans_quantize(
                self.model.apply({"params": p}, wav), self.codebook
            )
        )

    def encode_units(self, wav: np.ndarray) -> np.ndarray:
        units = self._jitted(self.params, jnp.asarray(wav[None, :]))
        return np.asarray(units)[0]

    def __call__(self, wav: np.ndarray, sr: int = 16000) -> Dict[str, list]:
        from dissc_tpu.audio.yaapt import yaapt_f0

        units = self.encode_units(wav)
        f0_5ms = yaapt_f0(wav, sr)
        # 4 x 5 ms frames per 20 ms unit frame; median of voiced values
        n = len(units)
        f0_5ms = np.pad(f0_5ms, (0, max(0, 4 * n - len(f0_5ms))))[: 4 * n]
        blocks = f0_5ms.reshape(n, 4)
        f0 = np.zeros(n, np.float32)
        for i, b in enumerate(blocks):
            voiced = b[b > 0]
            f0[i] = np.median(voiced) if voiced.size >= 2 else 0.0
        return {"units": units.tolist(), "f0": f0.tolist()}


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_state_dict(sd: Dict[str, Any], cfg: HubertConfig = HubertConfig()) -> Dict:
    """Map a transformers ``HubertModel.state_dict()`` to our param tree."""

    def t(name):
        return np.asarray(sd[name].detach().cpu().numpy() if hasattr(sd[name], "detach")
                          else sd[name])

    params: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        w = t(f"feature_extractor.conv_layers.{i}.conv.weight")  # [out, in, k]
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}
    fe["group_norm"] = {
        "scale": t("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": t("feature_extractor.conv_layers.0.layer_norm.bias"),
    }
    params["feature_extractor"] = fe

    params["fp_layer_norm"] = {
        "scale": t("feature_projection.layer_norm.weight"),
        "bias": t("feature_projection.layer_norm.bias"),
    }
    params["fp_projection"] = {
        "kernel": t("feature_projection.projection.weight").T,
        "bias": t("feature_projection.projection.bias"),
    }

    # HF >= 4.30 stores weight-norm pos-conv as parametrizations
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = t("encoder.pos_conv_embed.conv.weight_g")
        v = t("encoder.pos_conv_embed.conv.weight_v")
    else:
        g = t("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        v = t("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    # torch layout [out, in/groups, k], WN dim=2 -> our (k, in/groups, out)
    # with one gain per kernel position
    params["pos_conv"] = {
        "v": v.transpose(2, 1, 0),
        "g": g.reshape(-1, 1, 1),
        "bias": t("encoder.pos_conv_embed.conv.bias"),
    }
    params["encoder_layer_norm"] = {
        "scale": t("encoder.layer_norm.weight"),
        "bias": t("encoder.layer_norm.bias"),
    }

    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "q_proj": {"kernel": t(f"{p}.attention.q_proj.weight").T,
                       "bias": t(f"{p}.attention.q_proj.bias")},
            "k_proj": {"kernel": t(f"{p}.attention.k_proj.weight").T,
                       "bias": t(f"{p}.attention.k_proj.bias")},
            "v_proj": {"kernel": t(f"{p}.attention.v_proj.weight").T,
                       "bias": t(f"{p}.attention.v_proj.bias")},
            "out_proj": {"kernel": t(f"{p}.attention.out_proj.weight").T,
                         "bias": t(f"{p}.attention.out_proj.bias")},
            "self_attn_layer_norm": {"scale": t(f"{p}.layer_norm.weight"),
                                     "bias": t(f"{p}.layer_norm.bias")},
            "fc1": {"kernel": t(f"{p}.feed_forward.intermediate_dense.weight").T,
                    "bias": t(f"{p}.feed_forward.intermediate_dense.bias")},
            "fc2": {"kernel": t(f"{p}.feed_forward.output_dense.weight").T,
                    "bias": t(f"{p}.feed_forward.output_dense.bias")},
            "final_layer_norm": {"scale": t(f"{p}.final_layer_norm.weight"),
                                 "bias": t(f"{p}.final_layer_norm.bias")},
        }
    return params
