"""LS-GAN + feature-matching losses (reference ``sr/models.py:352-383``).

All reductions accumulate in float32 even when the discriminators run a
bfloat16 trunk (``disc_compute_dtype``): the casts fuse into the
abs/square+reduce kernels, so the f32 path is unchanged and the bf16
path pays no extra memory traffic.
"""
from __future__ import annotations

import jax.numpy as jnp


def _f32(x):
    return x.astype(jnp.float32)


def feature_loss(fmap_r, fmap_g):
    """2 * sum of per-layer L1 between real/generated feature maps."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(_f32(rl) - _f32(gl)))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LS-GAN D loss: sum of (1-D(y))^2 + D(y_hat)^2 per sub-discriminator."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1 - _f32(dr)) ** 2)
        g_loss = jnp.mean(_f32(dg) ** 2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LS-GAN G loss: sum of (1-D(y_hat))^2 per sub-discriminator."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - _f32(dg)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
