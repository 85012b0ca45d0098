"""GAN discriminators: multi-period (MPD) and multi-scale (MSD).

Reference ``sr/models.py:228-333``.  TPU notes:
  * MPD's 1D->2D period fold is a reflect-pad + reshape (static shapes
    per period); the (5,1)-kernel Conv2d stacks are MXU-friendly NHWC.
  * MSD uses grouped 1D convs (``feature_group_count``) and spectral
    norm (power iteration in a mutable 'spectral' collection) on its
    first scale.
  * Both return (score, per-layer feature maps) for the feature-match
    loss, like the reference.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dissc_tpu.models.layers import Conv1d, Conv2d, leaky_relu, same_padding


class DiscriminatorP(nn.Module):
    """Period discriminator: fold waveform to [T/p, p] and convolve along
    the T/p axis (reference ``sr/models.py:228-260``).

    TPU layout: the reference's (k, 1)-kernel Conv2d never mixes the
    period axis, so it is mathematically a batch of 1D convs — we fold
    the period into the batch dim ([B, T/p, p, C] -> [B*p, T/p, C]) and
    run Conv1d, which fills the MXU's 128 lanes with the channel dim
    instead of wasting them on a width of 2..11.  Params stay in the 2D
    (kh, 1, in, out) shape so reference checkpoints import unchanged;
    ``fold_to_batch=False`` keeps the literal 2D path (numerics are
    identical — tested).
    """

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    fold_to_batch: bool = True
    s2d: bool = False  # space-to-depth strided convs (layers._strided_conv_s2d)
    dtype: object = None  # compute dtype; None = f32 (params always f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T] waveform
        norm = "spectral" if self.use_spectral_norm else "weight"
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        if self.fold_to_batch:
            # [B, H, p, C] -> [B*p, H, C]
            x = x.transpose(0, 2, 1, 3).reshape(b * self.period, t // self.period, 1)

        def conv(z, ch, k, s, p, name):
            # rank-3 input takes Conv2d's 1D fast path; params stay 2D-shaped
            return Conv2d(ch, (k, 1), strides=(s, 1), padding=(p, 0), norm=norm,
                          dtype=self.dtype, s2d=self.s2d, name=name)(z, train)

        fmap = []
        pad = same_padding(5, 1)
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = conv(x, ch, self.kernel_size, self.stride, pad, f"convs_{i}")
            x = leaky_relu(x)
            fmap.append(self._unfold(x, b) if self.fold_to_batch else x)
        x = conv(x, 1024, self.kernel_size, 1, 2, "convs_4")
        x = leaky_relu(x)
        fmap.append(self._unfold(x, b) if self.fold_to_batch else x)
        x = conv(x, 1, 3, 1, 1, "conv_post")
        fmap.append(self._unfold(x, b) if self.fold_to_batch else x)
        if self.fold_to_batch:
            x = self._unfold(x, b)
        return x.reshape(b, -1), fmap

    def _unfold(self, z, b):
        # [B*p, H, C] -> [B, H, p, C] (the reference's NHWC fmap layout)
        bp, h, c = z.shape
        return z.reshape(b, self.period, h, c).transpose(0, 2, 1, 3)


class MultiPeriodDiscriminator(nn.Module):
    """5 period discriminators at primes 2,3,5,7,11 (reference ``sr/models.py:263-282``)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    s2d: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, s2d=self.s2d, dtype=self.dtype, name=f"disc_{i}")
            s_r, f_r = d(y, train)
            s_g, f_g = d(y_hat, train)
            y_d_rs.append(s_r)
            y_d_gs.append(s_g)
            fmap_rs.append(f_r)
            fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped wide 1D convs (reference ``sr/models.py:285-307``)."""

    use_spectral_norm: bool = False
    s2d: bool = False
    dtype: object = None  # compute dtype; None = f32 (params always f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T] waveform
        norm = "spectral" if self.use_spectral_norm else "weight"
        x = x[..., None]  # NWC
        fmap = []
        specs = [
            # (features, kernel, stride, groups, padding)
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, p) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, groups=g, padding=p, norm=norm,
                       dtype=self.dtype, s2d=self.s2d, name=f"convs_{i}")(x, train)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, norm=norm, dtype=self.dtype,
                   name="conv_post")(x, train)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def _avg_pool1d(x, kernel: int = 4, stride: int = 2, padding: int = 2):
    """torch AvgPool1d(4, 2, padding=2) semantics (count includes zero pads)."""
    y = jnp.pad(x, ((0, 0), (padding, padding)))
    y = jax.lax.reduce_window(
        y, 0.0, jax.lax.add, (1, kernel), (1, stride), "VALID"
    )
    return y / kernel


class MultiScaleDiscriminator(nn.Module):
    """Scale discriminators on 1x, 2x-, 4x-, ... avg-pooled audio.

    First scale uses spectral norm (reference ``sr/models.py:310-333``,
    which fixes ``scales`` at 3 — kept as the default; smaller ensembles
    are used by resource-bounded validation runs like the CPU-simulated
    multi-chip dry run).
    """

    scales: int = 3
    s2d: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(self.scales):
            if i != 0:
                y = _avg_pool1d(y)
                y_hat = _avg_pool1d(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0), s2d=self.s2d,
                               dtype=self.dtype, name=f"disc_{i}")
            s_r, f_r = d(y, train)
            s_g, f_g = d(y_hat, train)
            y_d_rs.append(s_r)
            y_d_gs.append(s_g)
            fmap_rs.append(f_r)
            fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
