"""Padding-mask helpers.

The reference keeps every loss/metric as a *masked sum* over non-pad
elements, normalised only at logging time by the total non-pad count
(reference ``train_len_predictor.py:72-73``, ``train_f0_predictor.py:66-67``).
These helpers keep that accounting explicit so distributed reductions
stay exact (sum the sums and the counts across devices, divide once).
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_mask(labels: jnp.ndarray, pad_value) -> jnp.ndarray:
    """Bool mask of non-pad label positions."""
    return labels != pad_value


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """``[B, max_len]`` bool mask from per-row lengths ``[B]``."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.where(mask, x, 0))


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return masked_sum(x, mask) / jnp.maximum(mask.sum(), eps)
