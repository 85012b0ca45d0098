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
    norm: Optional[str] = "weight"

    @nn.compact
    def __call__(self, x, collect: bool = False):
        """collect=True returns the folded conv weights per dilation step
        (for the space-to-channel packed MRF) instead of computing."""
        weights = []
        for i, d in enumerate(self.dilations):
            c1 = Conv1d(self.channels, self.kernel_size, dilation=d, norm=self.norm,
                        kernel_init=hifigan_init(), dtype=self.dtype,
                        name=f"convs1_{i}")
            c2 = Conv1d(self.channels, self.kernel_size, dilation=1, norm=self.norm,
                        kernel_init=hifigan_init(), dtype=self.dtype,
                        name=f"convs2_{i}")
            if collect:
                weights.append((c1(x, return_kernel=True), c2(x, return_kernel=True)))
                continue
            xt = leaky_relu(x)
            xt = c1(xt)
            xt = leaky_relu(xt)
            xt = c2(xt)
            x = xt + x
        return weights if collect else x


class ResBlock2(nn.Module):
    """MRF residual block '2': 2x (lrelu -> dilated conv) with skips.

    Reference ``sr/models.py:50-65``.
    """

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    dtype: Any = None
    norm: Optional[str] = "weight"

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, norm=self.norm,
                        kernel_init=hifigan_init(), dtype=self.dtype,
                        name=f"convs_{i}")(xt)
            x = xt + x
        return x


import functools as _functools


@_functools.lru_cache(maxsize=64)
def _pack_routing(k: int, dilation: int, P: int):
    """Static 0/1 routing tensor [k, kp, P, P]: route[t, m, q', q] = 1
    iff output slot q's tap t reads pack offset m, input slot q'."""
    import numpy as _np

    half = (k - 1) // 2
    offs = [dilation * (i - half) for i in range(k)]
    m_min = offs[0] // P
    m_max = (P - 1 + offs[-1]) // P
    route = _np.zeros((k, m_max - m_min + 1, P, P), _np.float32)
    for q in range(P):
        for t, o in enumerate(offs):
            route[t, (q + o) // P - m_min, (q + o) % P, q] = 1.0
    return route, m_min, m_max


def _pack_kernel(kernel, bias, dilation: int, P: int):
    """[k, C, C] conv kernel -> kron-structured [k', P*C, P*C] packed kernel.

    Space-to-channel packing: x [B, T, C] reshaped to [B, T/P, P*C] puts
    P consecutive samples in the lane dim (P*C = 128).  A dilated conv
    along T becomes a plain conv along packs whose kernel routes output
    slot q's tap at sample offset ``o`` to pack offset ``m = (q+o)//P``,
    slot ``q' = (q+o)%P``:  K'[m, q'C+cin, qC+cout] = W[tap, cin, cout].
    Boundary zero-rows coincide exactly with the unpacked 'same' zero
    padding, so numerics are identical — but the conv now runs at 128
    in/out channels (full lanes) with ~(k-1)d/P+1 taps instead of k,
    i.e. ~P x fewer executed MACs on narrow stages.
    """
    k, cin, cout = kernel.shape
    route, m_min, m_max = _pack_routing(k, dilation, P)
    # K'[m, a*Cin+i, b*Cout+o] = sum_t route[t,m,a,b] * W[t,i,o] — one
    # einsum, O(1) ops regardless of P (the routing is a static constant)
    Kp = jnp.einsum("tmab,tio->maibo", jnp.asarray(route, kernel.dtype), kernel)
    Kp = Kp.reshape(m_max - m_min + 1, P * cin, P * cout)
    bp = None if bias is None else jnp.tile(bias, P)
    return Kp, bp, (-m_min, m_max)


def _packed_conv(xp, kernel, bias, dilation: int, P: int):
    Kp, bp, (pl_, pr) = _pack_kernel(kernel, bias, dilation, P)
    y = jax.lax.conv_general_dilated(
        xp, Kp.astype(xp.dtype), window_strides=(1,), padding=[(pl_, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y if bp is None else y + bp.astype(xp.dtype)


def _packed_mrf(x, banks, dilations):
    """MRF over space-to-channel packed activations (narrow tail stages).

    Runs every branch's resblock chain at full 128 lanes; pack/unpack
    happen once per stage.  Identical numerics to the sequential path.
    """
    B, T, ch = x.shape
    P = 128 // ch
    xp = x.reshape(B, T // P, P * ch)
    acc = None
    for bank in banks:
        Xb = xp
        for s, d in enumerate(dilations):
            (k1, b1), (k2, b2) = bank[s]
            xt = leaky_relu(Xb)
            xt = _packed_conv(xt, k1, b1, d, P)
            xt = leaky_relu(xt)
            xt = _packed_conv(xt, k2, b2, 1, P)
            Xb = xt + Xb
        acc = Xb if acc is None else acc + Xb
    return (acc / len(banks)).reshape(B, T, ch)


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
        # folded inference: (v, g) pairs pre-folded into direct kernels
        # (fold_weight_norm) -> modules declare plain 'kernel' params
        wn = None if h.get("folded_weights") else "weight"

        x = Conv1d(h.upsample_initial_channel, 7, padding=3, norm=wn,
                   dtype=dtype, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2, norm=wn,
                                kernel_init=hifigan_init(), dtype=dtype,
                                name=f"ups_{i}")(x)
            dils = [tuple(rd) for rd in h.resblock_dilation_sizes]
            blocks = [resblock_cls(ch, rk, tuple(rd), dtype=dtype, norm=wn,
                                   name=f"resblocks_{i * num_kernels + j}")
                      for j, (rk, rd) in enumerate(
                          zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes))]
            pack = (h.resblock == "1" and len(set(dils)) == 1
                    and 8 <= ch <= h.get("mrf_pack_max_ch", 64)
                    and 128 % ch == 0 and x.shape[1] % (128 // ch) == 0)
            if pack:
                banks = [b(x, collect=True) for b in blocks]
                x = _packed_mrf(x, banks, dils[0])
            else:
                acc = None
                for b in blocks:
                    y = b(x)
                    acc = y if acc is None else acc + y
                x = acc / num_kernels
        # slope 0.01, not LRELU_SLOPE: the reference's final activation is
        # `F.leaky_relu(x)` with the torch default (sr/models.py:110 omits
        # the slope argument — an upstream hifi-gan quirk that is
        # numerically load-bearing; verified by test_reference_model_parity)
        x = leaky_relu(x, 0.01)
        # the waveform head always runs f32: bf16 rounding on the output
        # samples would cost ~8 bits of audio SNR for negligible speed
        x = x.astype(jnp.float32)
        post = Conv1d(1, 7, padding=3, norm=wn, kernel_init=hifigan_init(),
                      dtype=jnp.float32, name="conv_post")
        ch = x.shape[-1]
        # same C <= mrf_pack_max_ch bound as the MRF pack, so the config
        # knob restricts/disables both packed paths consistently
        if (8 <= ch <= min(64, h.get("mrf_pack_max_ch", 64) or 0)
                and 128 % ch == 0 and x.shape[1] % (128 // ch) == 0):
            # packed waveform head: [B,T,16] -> [B,T/8,128] -> one
            # 128-lane conv emitting the 8 output samples per row
            kern, bias = post(x, return_kernel=True)
            P = 128 // ch
            y = _packed_conv(x.reshape(x.shape[0], -1, P * ch), kern, bias, 1, P)
            return jnp.tanh(y.reshape(x.shape[0], -1))
        return jnp.tanh(post(x))[..., 0]


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
