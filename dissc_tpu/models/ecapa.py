"""ECAPA-TDNN speaker-embedding model.

The reference scores speaker verification with speechbrain's pretrained
``spkrec-ecapa-voxceleb`` (reference ``eval_sv.py:41-44``).  speechbrain
is unavailable here, so the ECAPA-TDNN architecture (Desplanques et al.
2020) is implemented natively in Flax: 80-mel fbank -> TDNN stem ->
3 SE-Res2Net blocks (dilations 2/3/4, scale 8) -> multi-layer feature
aggregation -> attentive statistical pooling -> 192-d embedding.

:func:`convert_speechbrain_state_dict` maps the released checkpoint's
``embedding_model.ckpt`` tensors onto this tree (key patterns follow
``speechbrain.lobes.models.ECAPA_TDNN``); scoring then plugs into
``eval.sv.cosine_scorer``.  Numerical parity against speechbrain cannot
be asserted inside this zero-egress image — the converter is validated
structurally and should be spot-checked once weights are present.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 1024
    res2net_scale: int = 8
    se_channels: int = 128
    attention_channels: int = 128
    lin_neurons: int = 192
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)


class TDNNBlock(nn.Module):
    """Conv1d -> ReLU -> BatchNorm (speechbrain TDNNBlock ordering)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # speechbrain's Conv1d defaults to 'same' REFLECT padding
        # (speechbrain.nnet.CNN.Conv1d padding_mode='reflect')
        pad = (self.kernel_size - 1) * self.dilation // 2
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="norm")(x)


class Res2NetBlock(nn.Module):
    out_channels: int
    scale: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = x.shape[-1] // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        ys = [chunks[0]]
        y_prev = None
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + y_prev
            y_prev = TDNNBlock(width, self.kernel_size, self.dilation,
                               name=f"block_{i-1}")(inp, train)
            ys.append(y_prev)
        return jnp.concatenate(ys, axis=-1)


class SEBlock(nn.Module):
    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = jnp.mean(x, axis=1, keepdims=True)  # [B, 1, C]
        s = nn.relu(nn.Conv(self.se_channels, (1,), name="conv1")(s))
        s = nn.sigmoid(nn.Conv(self.out_channels, (1,), name="conv2")(s))
        return x * s


class SERes2NetBlock(nn.Module):
    out_channels: int
    res2net_scale: int
    se_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        x = TDNNBlock(self.out_channels, 1, 1, name="tdnn1")(x, train)
        x = Res2NetBlock(self.out_channels, self.res2net_scale, self.kernel_size,
                         self.dilation, name="res2net_block")(x, train)
        x = TDNNBlock(self.out_channels, 1, 1, name="tdnn2")(x, train)
        x = SEBlock(self.se_channels, self.out_channels, name="se_block")(x, train)
        return x + residual


class AttentiveStatisticsPooling(nn.Module):
    attention_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # global context: concat(x, mean, std) per frame
        t = x.shape[1]
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-12)
        ctx = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
        )
        attn = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(ctx, train)
        attn = jnp.tanh(attn)
        attn = nn.Conv(x.shape[-1], (1,), name="conv")(attn)
        w = jax.nn.softmax(attn, axis=1)
        mu = jnp.sum(w * x, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(w * x * x, axis=1) - mu**2, min=1e-12))
        return jnp.concatenate([mu, sg], axis=-1)  # [B, 2C]


class EcapaTDNN(nn.Module):
    """[B, T, n_mels] fbank features -> [B, lin_neurons] embedding."""

    cfg: EcapaConfig = EcapaConfig()

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c = self.cfg
        x = TDNNBlock(c.channels, c.kernel_sizes[0], c.dilations[0],
                      name="block_0")(feats, train)
        layer_outs = []
        for i in range(1, 4):
            x = SERes2NetBlock(c.channels, c.res2net_scale, c.se_channels,
                               c.kernel_sizes[i], c.dilations[i],
                               name=f"block_{i}")(x, train)
            layer_outs.append(x)
        x = jnp.concatenate(layer_outs, axis=-1)
        x = TDNNBlock(c.channels * 3 // 2, c.kernel_sizes[4], c.dilations[4],
                      name="mfa")(x, train)
        x = AttentiveStatisticsPooling(c.attention_channels, name="asp")(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="asp_bn")(x)
        x = nn.Dense(c.lin_neurons, name="fc")(x)
        return x


def fbank_features(wav: np.ndarray, sr: int = 16000, n_mels: int = 80,
                   win: int = 400, hop: int = 160) -> np.ndarray:
    """80-dim log-mel fbank at 25 ms / 10 ms with sentence mean-norm —
    the speechbrain ECAPA front end's shape and scale."""
    import jax.numpy as jnp_

    from dissc_tpu.audio.mel import mel_filterbank, stft_magnitude

    wav = np.asarray(wav, np.float32).reshape(1, -1)
    pad = (512 - hop) // 2
    y = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    mag = np.asarray(stft_magnitude(jnp_.asarray(y), 512, hop, win, use_matmul=False))
    power = mag**2
    mel = mel_filterbank(sr, 512, n_mels, 0, sr / 2)
    fb = np.log(np.maximum(mel @ power[0], 1e-10)).T  # [T, n_mels]
    return fb - fb.mean(axis=0, keepdims=True)


class EcapaEmbedder:
    """wav -> embedding, pluggable into ``eval.sv.cosine_scorer``."""

    def __init__(self, params, batch_stats, cfg: EcapaConfig = EcapaConfig()):
        self.model = EcapaTDNN(cfg)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self._jitted = jax.jit(lambda v, f: self.model.apply(v, f))

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        feats = fbank_features(wav)[None]
        return np.asarray(self._jitted(self.variables, jnp.asarray(feats)))[0]


# ---------------------------------------------------------------------------
# speechbrain checkpoint conversion (best-effort, structural)
# ---------------------------------------------------------------------------


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # [out, in, k]
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _bn(sd, key):
    return (
        {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])},
        {"mean": np.asarray(sd[f"{key}.running_mean"]),
         "var": np.asarray(sd[f"{key}.running_var"])},
    )


def _tdnn(sd, key):
    p_bn, s_bn = _bn(sd, f"{key}.norm.norm")
    return ({"conv": _conv(sd, f"{key}.conv.conv"), "norm": p_bn}, {"norm": s_bn})


def convert_speechbrain_state_dict(sd: Dict[str, Any],
                                   cfg: EcapaConfig = EcapaConfig()):
    """Map speechbrain's ECAPA ``embedding_model.ckpt`` tensors onto our tree.

    Returns (params, batch_stats).  Key patterns follow
    speechbrain.lobes.models.ECAPA_TDNN module naming.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["block_0"], stats["block_0"] = _tdnn(sd, "blocks.0")
    for i in range(1, 4):
        base = f"blocks.{i}"
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        p["tdnn1"], s["tdnn1"] = _tdnn(sd, f"{base}.tdnn1")
        r2_p: Dict[str, Any] = {}
        r2_s: Dict[str, Any] = {}
        for j in range(cfg.res2net_scale - 1):
            r2_p[f"block_{j}"], r2_s[f"block_{j}"] = _tdnn(sd, f"{base}.res2net_block.blocks.{j}")
        p["res2net_block"], s["res2net_block"] = r2_p, r2_s
        p["tdnn2"], s["tdnn2"] = _tdnn(sd, f"{base}.tdnn2")
        # speechbrain's SEBlock convs are sb-Conv1d wrappers (inner .conv)
        p["se_block"] = {"conv1": _conv(sd, f"{base}.se_block.conv1.conv"),
                         "conv2": _conv(sd, f"{base}.se_block.conv2.conv")}
        params[f"block_{i}"], stats[f"block_{i}"] = p, s
    params["mfa"], stats["mfa"] = _tdnn(sd, "mfa")
    asp_p, asp_s = _tdnn(sd, "asp.tdnn")
    params["asp"] = {"tdnn": asp_p, "conv": _conv(sd, "asp.conv.conv")}
    stats["asp"] = {"tdnn": asp_s}
    bn_p, bn_s = _bn(sd, "asp_bn")
    params["asp_bn"], stats["asp_bn"] = bn_p, bn_s
    fc_w = np.asarray(sd["fc.conv.weight"])  # speechbrain fc is a k1 conv [out, in, 1]
    params["fc"] = {"kernel": fc_w[:, :, 0].T}
    if "fc.conv.bias" in sd:
        params["fc"]["bias"] = np.asarray(sd["fc.conv.bias"])
    return params, stats
