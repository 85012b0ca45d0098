"""Jukebox-style 1D conv encoder/decoder for the optional F0/code VQ path.

Flax re-design of reference ``sr/modules/jukebox.py`` + ``resnet.py``
(themselves adapted from openai/jukebox): strided-conv downsampling
stacks with dilated residual blocks, and the transposed-conv mirror.
Used by the F0-VQVAE ``Quantizer`` (``sr/models.py:336-349``) and by the
``lambda_commit*`` branches of CodeGenerator — unused in every shipped
DISSC config but part of the component inventory (SURVEY §2.3).

NWC layout throughout.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dissc_tpu.models.layers import Conv1d, ConvTranspose1d


class ResConv1DBlock(nn.Module):
    """relu -> dilated k3 conv -> relu -> k1 conv, scaled residual."""

    n_in: int
    n_state: int
    dilation: int = 1
    zero_out: bool = False
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = Conv1d(self.n_state, 3, dilation=self.dilation, padding=self.dilation,
                   name="conv1")(h)
        h = nn.relu(h)
        kinit = nn.initializers.zeros if self.zero_out else None
        h = Conv1d(self.n_in, 1, padding=0, kernel_init=kinit, name="conv2")(h)
        return x + self.res_scale * h


class Resnet1D(nn.Module):
    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_dilation: bool = False

    @nn.compact
    def __call__(self, x):
        def depth_of(d):
            return d if self.dilation_cycle is None else d % self.dilation_cycle

        order = range(self.n_depth)
        if self.reverse_dilation:
            order = reversed(list(order))
        for d in order:
            x = ResConv1DBlock(
                self.n_in, int(self.m_conv * self.n_in),
                dilation=self.dilation_growth_rate ** depth_of(d),
                zero_out=self.zero_out,
                res_scale=1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth),
                name=f"block_{d}",
            )(x)
        return x


class EncoderConvBlock(nn.Module):
    output_emb_width: int
    down_t: int
    stride_t: int
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False

    @nn.compact
    def __call__(self, x):
        s = self.stride_t
        filt, pad = s * 2, s // 2
        for i in range(self.down_t):
            x = Conv1d(self.width, filt, stride=s, padding=pad, name=f"down_{i}")(x)
            x = Resnet1D(self.width, self.depth, self.m_conv, self.dilation_growth_rate,
                         self.dilation_cycle, self.zero_out, self.res_scale,
                         name=f"res_{i}")(x)
        return Conv1d(self.output_emb_width, 3, padding=1, name="proj")(x)


class DecoderConvBlock(nn.Module):
    input_emb_width: int
    down_t: int
    stride_t: int
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_decoder_dilation: bool = False

    @nn.compact
    def __call__(self, x):
        s = self.stride_t
        filt, pad = s * 2, s // 2
        x = Conv1d(self.width, 3, padding=1, name="proj")(x)
        for i in range(self.down_t):
            x = Resnet1D(self.width, self.depth, self.m_conv, self.dilation_growth_rate,
                         self.dilation_cycle, self.zero_out, self.res_scale,
                         reverse_dilation=self.reverse_decoder_dilation,
                         name=f"res_{i}")(x)
            out_ch = self.input_emb_width if i == self.down_t - 1 else self.width
            x = ConvTranspose1d(out_ch, filt, stride=s, padding=pad, name=f"up_{i}")(x)
        return x


class Encoder(nn.Module):
    """Multi-level strided encoder; returns one feature map per level."""

    input_emb_width: int
    output_emb_width: int
    levels: int
    downs_t: Sequence[int]
    strides_t: Sequence[int]
    width: int = 32
    depth: int = 4
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C_in]
        xs = []
        for level in range(self.levels):
            x = EncoderConvBlock(
                self.output_emb_width, self.downs_t[level], self.strides_t[level],
                self.width, self.depth, self.m_conv, self.dilation_growth_rate,
                self.dilation_cycle, self.zero_out, self.res_scale,
                name=f"level_{level}",
            )(x)
            xs.append(x)
        return xs


class Decoder(nn.Module):
    """Mirror of Encoder; consumes level features coarsest-first."""

    input_emb_width: int
    output_emb_width: int
    levels: int
    downs_t: Sequence[int]
    strides_t: Sequence[int]
    width: int = 32
    depth: int = 4
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_decoder_dilation: bool = False

    @nn.compact
    def __call__(self, xs, all_levels: bool = True):
        x = xs[-1]
        for level in reversed(range(self.levels)):
            x = DecoderConvBlock(
                self.output_emb_width, self.downs_t[level], self.strides_t[level],
                self.width, self.depth, self.m_conv, self.dilation_growth_rate,
                self.dilation_cycle, self.zero_out, self.res_scale,
                self.reverse_decoder_dilation, name=f"level_{level}",
            )(x)
            if level != 0 and all_levels:
                x = x + xs[level - 1]
        return Conv1d(self.input_emb_width, 3, padding=1, name="out")(x)
