"""Duration losses/metrics (reference ``loss/len_loss.py``).

All are masked *sums* over non-pad run slots; callers normalise by the
total non-pad count at logging time (reference trainer convention).
"""
from __future__ import annotations

import jax.numpy as jnp


def _mask(lens, pad_idx):
    return lens != pad_idx


def len_mse_loss(preds, lens, pad_idx: float = -1):
    return jnp.sum(_mask(lens, pad_idx) * (preds - lens) ** 2)


def len_mae_loss(preds, lens, pad_idx: float = -1):
    return jnp.sum(_mask(lens, pad_idx) * jnp.abs(preds - lens))


def len_smooth_l1_loss(preds, lens, pad_idx: float = -1, beta: float = 1.0):
    d = jnp.abs(preds - lens)
    sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.sum(_mask(lens, pad_idx) * sl1)


def len_sum_loss(preds, lens, pad_idx: float = -1):
    """Masked MSE + 0.5 * (4-frame pooled diff * 4)^2.

    The pooled term lets neighbouring errors cancel so the model isn't
    biased toward longer/shorter totals (reference ``loss/len_loss.py:16-30``).
    A 4-window is masked out if *any* of its slots is padding (the
    max-pool in the reference).
    """
    diff = preds - lens
    T = diff.shape[-1]
    T4 = (T // 4) * 4
    diff4 = diff[..., :T4].reshape(*diff.shape[:-1], -1, 4).mean(-1) * 4
    win_has_pad = (lens[..., :T4] == pad_idx).reshape(*lens.shape[:-1], -1, 4).any(-1)
    diff_loss4 = jnp.sum(jnp.where(win_has_pad, 0.0, diff4**2))
    return len_mse_loss(preds, lens, pad_idx) + 0.5 * diff_loss4


def _round_preds(preds):
    return jnp.round(jnp.clip(preds, min=1)).astype(jnp.int32)


def len_exact_accuracy(preds, lens, pad_idx: float = -1):
    """Count of slots where round(clamp(pred,1)) == len (masked sum)."""
    return jnp.sum(_mask(lens, pad_idx) * (_round_preds(preds) == lens))


def len_one_off_accuracy(preds, lens, pad_idx: float = -1):
    """Count of slots within +-1 of the true length (masked sum)."""
    return jnp.sum(_mask(lens, pad_idx) * (jnp.abs(_round_preds(preds) - lens) <= 1))
