"""Pitch losses/metrics (reference ``loss/pitch_loss.py``).

The regression target is *whitened* f0; losses de-whiten with the
per-speaker stats before measuring, and everything is a masked sum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels):
    # numerically stable BCE-with-logits
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def pitch_loss(class_preds, reg_preds, gts, spk_ids, id2mean, id2std, pad_idx: float = -100):
    """100 * masked BCE(voicing) + 1 * voiced-masked L1(de-whitened f0).

    Reference ``loss/pitch_loss.py:6-27``.  gts: whitened f0 with 0 at
    unvoiced frames and ``pad_idx`` at padding; spk_ids: [B, 1].
    """
    mask = gts != pad_idx
    voiced = (gts != 0).astype(jnp.float32)
    loss1 = jnp.sum(mask * _bce_with_logits(class_preds, jax.lax.stop_gradient(voiced)))

    std = id2std[spk_ids]
    mean = id2mean[spk_ids]
    preds = mean + std * reg_preds
    gts_hz = mean + std * gts
    loss2 = jnp.sum(mask * jnp.abs(preds - gts_hz) * voiced)
    return 100.0 * loss1 + 1.0 * loss2


def _dewhitened_target(gts, spk_ids, id2mean, id2std):
    voiced = gts != 0
    return (id2mean[spk_ids] + id2std[spk_ids] * gts) * voiced


def pitch_mae(freq_preds, gts, spk_ids, id2mean, id2std, pad_idx: float = -100):
    """Masked L1 between predicted Hz and de-whitened gt (unvoiced gt = 0)."""
    mask = gts != pad_idx
    return jnp.sum(mask * jnp.abs(freq_preds - _dewhitened_target(gts, spk_ids, id2mean, id2std)))


def pitch_mse(freq_preds, gts, spk_ids, id2mean, id2std, pad_idx: float = -100):
    mask = gts != pad_idx
    return jnp.sum(mask * (freq_preds - _dewhitened_target(gts, spk_ids, id2mean, id2std)) ** 2)
