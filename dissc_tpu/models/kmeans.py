"""Mini-batch k-means for training unit codebooks on TPU.

The reference consumes a pretrained sklearn k-means quantizer through
textlesslib (``data/encode.py:21-22``); this module provides the
matching *training* capability natively so a deployment can fit its own
``[vocab, width]`` codebook over HuBERT features: k-means++-style
seeding from data, then jitted mini-batch Lloyd updates (one MXU
distance matmul + segment-sum per step).
"""
from __future__ import annotations

import functools
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _assign(x: jax.Array, centroids: jax.Array, k: int) -> jax.Array:
    dist = (jnp.sum(x**2, -1, keepdims=True) - 2 * x @ centroids.T
            + jnp.sum(centroids**2, -1)[None, :])
    return jnp.argmin(dist, -1)


@functools.partial(jax.jit, static_argnames=("k",))
def _minibatch_update(x, centroids, counts, k: int):
    """One mini-batch Lloyd step with per-cluster learning rates
    (Sculley 2010): c += (x_mean - c) * m/(n+m)."""
    labels = _assign(x, centroids, k)
    onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)
    batch_counts = jnp.sum(onehot, axis=0)  # [k]
    batch_sums = onehot.T @ x  # [k, d]
    new_counts = counts + batch_counts
    lr = jnp.where(batch_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0), 0.0)
    batch_means = batch_sums / jnp.maximum(batch_counts[:, None], 1.0)
    centroids = centroids + lr[:, None] * (batch_means - centroids)
    inertia = jnp.mean(jnp.sum((x - centroids[labels]) ** 2, -1))
    return centroids, new_counts, inertia


def train_kmeans(
    feature_batches: Iterable[np.ndarray],
    k: int = 100,
    n_epochs: int = 5,
    seed: int = 0,
    init_samples: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, float]:
    """Fit a [k, d] codebook over an iterable of [N, d] feature batches.

    Returns (centroids, final mean inertia).  ``feature_batches`` may be
    a generator re-iterable across epochs (e.g. a list of arrays).
    """
    batches = list(feature_batches)
    assert batches, "no feature batches"
    d = batches[0].shape[-1]

    rng = np.random.default_rng(seed)
    if init_samples is None:
        init_samples = np.concatenate([b[: max(1, k // len(batches) + 1)]
                                       for b in batches])[: 4 * k]
    if init_samples.shape[0] < k:
        reps = -(-k // init_samples.shape[0])
        init_samples = np.tile(init_samples, (reps, 1))
    centroids = jnp.asarray(
        init_samples[rng.permutation(init_samples.shape[0])[:k]].astype(np.float32)
    )
    counts = jnp.zeros((k,), jnp.float32)

    inertia = np.inf
    for _ in range(n_epochs):
        order = rng.permutation(len(batches))
        for bi in order:
            x = jnp.asarray(np.asarray(batches[bi], np.float32).reshape(-1, d))
            centroids, counts, inertia = _minibatch_update(x, centroids, counts, k)
    return np.asarray(centroids), float(inertia)
