"""HiFi-GAN unit-to-waveform vocoder (Generator + CodeGenerator).

TPU re-design of the reference vocoder (``sr/models.py:16-225``,
itself adapted from jik876/hifi-gan): a 7-wide pre-conv, 5 weight-norm
transposed-conv upsamplers (rates 5*4*4*2*2 = 320 = the unit hop), each
followed by a multi-receptive-field (MRF) bank of 3 dilated ResBlocks
whose outputs are averaged, then a tanh post-conv.

TPU-first choices:
  * NWC layout; every conv is a ``lax.conv_general_dilated`` that XLA
    tiles onto the MXU (channel counts 512..32 pad to lanes of 128).
  * Conditioning (unit LUT embedding + F0 + speaker embedding) is
    assembled channels-last and broadcast with reshape-based
    nearest-repeat upsampling (``core.seqops.nearest_upsample``) so it
    fuses into the first conv.
  * Weight norm is a (v, g) reparameterisation; inference folds it
    functionally (``models.layers.fold_weight_norm``).
  * The whole forward is one jittable function of (params, inputs) —
    batched over utterances, static segment lengths via bucketing.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _resolve_dtype(name):
    """'bfloat16'/'float32'/None -> jnp dtype or None (= f32 passthrough)."""
    if name in (None, "float32", "f32"):
        return None
    return jnp.dtype(name)

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.core.seqops import nearest_upsample
from dissc_tpu.models.layers import Conv1d, ConvTranspose1d, hifigan_init, leaky_relu, same_padding


class ResBlock1(nn.Module):
    """MRF residual block '1': 3x (lrelu -> dilated conv -> lrelu -> conv) with skips.

    Reference ``sr/models.py:16-47``.
    """

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, norm="weight",
                        kernel_init=hifigan_init(), dtype=self.dtype,
                        name=f"convs1_{i}")(xt)
            xt = leaky_relu(xt)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, norm="weight",
                        kernel_init=hifigan_init(), dtype=self.dtype,
                        name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """MRF residual block '2': 2x (lrelu -> dilated conv) with skips.

    Reference ``sr/models.py:50-65``.
    """

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, norm="weight",
                        kernel_init=hifigan_init(), dtype=self.dtype,
                        name=f"convs_{i}")(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """Conditioning frames [B, T, model_in_dim] -> waveform [B, T*320].

    Reference ``sr/models.py:72-122``.
    """

    h: VocoderConfig

    @nn.compact
    def __call__(self, x):
        h = self.h
        num_kernels = len(h.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if h.resblock == "1" else ResBlock2
        dtype = _resolve_dtype(h.get("compute_dtype"))

        x = Conv1d(h.upsample_initial_channel, 7, padding=3, norm="weight",
                   dtype=dtype, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2, norm="weight",
                                kernel_init=hifigan_init(), dtype=dtype,
                                name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
                y = resblock_cls(ch, rk, tuple(rd), dtype=dtype,
                                 name=f"resblocks_{i * num_kernels + j}")(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels
        # slope 0.01, not LRELU_SLOPE: the reference's final activation is
        # `F.leaky_relu(x)` with the torch default (sr/models.py:110 omits
        # the slope argument — an upstream hifi-gan quirk that is
        # numerically load-bearing; verified by test_reference_model_parity)
        x = leaky_relu(x, 0.01)
        # the waveform head always runs f32: bf16 rounding on the output
        # samples would cost ~8 bits of audio SNR for negligible speed
        x = Conv1d(1, 7, padding=3, norm="weight", kernel_init=hifigan_init(),
                   dtype=jnp.float32, name="conv_post")(x.astype(jnp.float32))
        return jnp.tanh(x)[..., 0]


class CodeGenerator(nn.Module):
    """Input assembly + Generator (reference ``sr/models.py:125-225``).

    Builds the conditioning stack: unit LUT embedding [B, T, 128]
    (+ per-frame F0 channel, nearest-upsampled to the finer rate,
    + speaker embedding broadcast over time) -> [B, T', model_in_dim]
    -> Generator.

    The optional F0/code VQ paths of the reference (``lambda_commit*``,
    unused in every shipped DISSC config) are supported through the
    ``vq`` submodules when configured.
    """

    h: VocoderConfig

    def setup(self):
        h = self.h
        from dissc_tpu.models.layers import Embed

        # torch-default N(0,1) embedding init; table size 200 matches the
        # reference's fixed speaker-table capacity (sr/models.py:133).
        self.dict = Embed(h.num_embeddings, h.embedding_dim, name="dict")
        if h.multispkr:
            self.spkr = Embed(200, h.embedding_dim, name="spkr")
        if h.get("lambda_commit"):
            from dissc_tpu.models.jukebox import Encoder
            from dissc_tpu.models.vq import Bottleneck

            self.f0_encoder = Encoder(**h.f0_encoder_params)
            self.f0_vq = Bottleneck(**h.f0_vq_params)
        self.generator = Generator(h, name="generator")

    def assemble(self, code, f0=None, spkr=None, extra=None):
        """Build [B, T', C] conditioning from ids/contours.

        code: [B, T] int unit ids; f0: [B, Tf, 1] float; spkr: [B, 1] int.
        Aligns rates by nearest-repeat upsampling the coarser signal
        (reference ``sr/models.py:206-221``).
        """
        h = self.h
        x = self.dict(code)  # [B, T, E]
        if h.f0 and f0 is not None:
            if x.shape[1] < f0.shape[1]:
                x = nearest_upsample(x, f0.shape[1] // x.shape[1])
            elif f0.shape[1] < x.shape[1]:
                f0 = nearest_upsample(f0, x.shape[1] // f0.shape[1])
            x = jnp.concatenate([x, f0], axis=-1)
        if h.multispkr and spkr is not None:
            s = self.spkr(spkr[..., 0])[:, None, :]  # [B, 1, E]
            s = jnp.broadcast_to(s, (x.shape[0], x.shape[1], s.shape[-1]))
            x = jnp.concatenate([x, s], axis=-1)
        if extra is not None:
            for feat in extra:
                if feat.ndim == 2:
                    feat = feat[:, None, :]
                if feat.shape[1] < x.shape[1]:
                    feat = nearest_upsample(feat, x.shape[1] // feat.shape[1])
                x = jnp.concatenate([x, feat], axis=-1)
        return x

    def __call__(self, code, f0=None, spkr=None, extra=None):
        if self.h.get("lambda_commit"):
            f0_h = self.f0_encoder(f0)
            _, f0_q, commit_losses, metrics = self.f0_vq(f0_h)
            x = self.assemble(code, f0_q[0], spkr, extra)
            return self.generator(x), commit_losses, metrics
        x = self.assemble(code, f0, spkr, extra)
        return self.generator(x)
