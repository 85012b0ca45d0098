"""EMA k-means vector-quantisation bottleneck.

Flax re-design of reference ``sr/modules/vq.py`` (adapted from
openai/jukebox): nearest-centroid quantisation with straight-through
gradients, EMA codebook updates, random-restart of dead codes, and
usage/entropy metrics.

Distributed semantics: the reference syncs the EMA statistics across
ranks with ``dist.broadcast``/``all_reduce`` through a wrapper that
no-ops on a single device (``sr/modules/vq.py:71-73``,
``sr/modules/dist.py``).  Here the same contract is an *optional axis
name* — when ``axis_name`` is set (inside shard_map/pmap) the per-batch
sums are ``psum``-reduced before the EMA update; with plain
GSPMD-sharded jit the sums are global automatically and the axis stays
None.

Codebook state lives in a mutable ``vq_state`` collection (k, k_sum,
k_elem, init flag); the random restart draws from a ``vq`` PRNG stream.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dissc_tpu.parallel.collectives import psum_if


class BottleneckBlock(nn.Module):
    k_bins: int
    emb_width: int
    mu: float
    threshold: float = 1.0
    axis_name: Optional[str] = None

    def setup(self):
        self.k = self.variable("vq_state", "k",
                               lambda: jnp.zeros((self.k_bins, self.emb_width)))
        self.k_sum = self.variable("vq_state", "k_sum",
                                   lambda: jnp.zeros((self.k_bins, self.emb_width)))
        self.k_elem = self.variable("vq_state", "k_elem",
                                    lambda: jnp.zeros((self.k_bins,)))
        self.initted = self.variable("vq_state", "initted",
                                     lambda: jnp.zeros((), jnp.bool_))

    def _tile_to_bins(self, x, rng):
        d = x.shape[0]
        n_repeats = (self.k_bins + d - 1) // d
        std = 0.01 / jnp.sqrt(jnp.float32(x.shape[1]))
        y = jnp.tile(x, (n_repeats, 1))
        y = y + jax.random.normal(rng, y.shape) * std
        perm = jax.random.permutation(rng, y.shape[0])
        return y[perm][: self.k_bins]

    def quantise(self, x):
        # x: [N, D]; distances via one MXU matmul
        k = self.k.value
        dist = (jnp.sum(x**2, -1, keepdims=True) - 2 * x @ k.T + jnp.sum(k**2, -1)[None, :])
        x_l = jnp.argmin(dist, -1)
        fit = jnp.mean(jnp.min(dist, -1))
        return x_l, fit

    def encode(self, x):
        # x: [B, T, D] -> [B, T]
        B, T, D = x.shape
        x_l, _ = self.quantise(x.reshape(-1, D))
        return x_l.reshape(B, T)

    def decode(self, x_l):
        return self.k.value[x_l]

    def __call__(self, x, update_k: bool = True):
        """x: [B, T, D] -> (codes [B,T], quantised [B,T,D], commit_loss, metrics).

        The first-batch codebook bootstrap (reference ``init_k``,
        ``sr/modules/vq.py:35-45``) is branchless — selected by the
        ``initted`` flag with ``jnp.where`` — so the whole step stays one
        jittable program.
        """
        B, T, D = x.shape
        flat = x.reshape(-1, D)
        prenorm = jnp.linalg.norm(flat - jnp.mean(flat)) / jnp.sqrt(
            jnp.float32(flat.size)
        )

        if update_k and not self.is_initializing():
            inited = self.initted.value
            rng = self.make_rng("vq")
            k_init = self._tile_to_bins(jax.lax.stop_gradient(flat), rng)
            self.k.value = jnp.where(inited, self.k.value, k_init)
            self.k_sum.value = jnp.where(inited, self.k_sum.value, k_init)
            self.k_elem.value = jnp.where(inited, self.k_elem.value,
                                          jnp.ones((self.k_bins,)))
            self.initted.value = jnp.ones((), jnp.bool_)

        x_l, fit = self.quantise(flat)
        x_d = self.decode(x_l)

        metrics = dict(fit=fit, pn=prenorm)
        if update_k and not self.is_initializing():
            metrics.update(self._update_k(flat, x_l))

        commit_loss = jnp.linalg.norm(jax.lax.stop_gradient(x_d) - flat) ** 2 / flat.size
        x_q = flat + jax.lax.stop_gradient(x_d - flat)  # straight-through
        return x_l.reshape(B, T), x_q.reshape(B, T, D), commit_loss, metrics

    def _update_k(self, x, x_l):
        """EMA codebook update with dead-code restart (``sr/modules/vq.py:59-90``)."""
        onehot = jax.nn.one_hot(x_l, self.k_bins, dtype=x.dtype)  # [N, K]
        _k_sum = onehot.T @ x  # [K, D]
        _k_elem = jnp.sum(onehot, axis=0)  # [K]
        # cross-replica reduction (the reference's dist.all_reduce)
        _k_sum = psum_if(_k_sum, self.axis_name)
        _k_elem = psum_if(_k_elem, self.axis_name)

        rng = self.make_rng("vq")
        _k_rand = self._tile_to_bins(jax.lax.stop_gradient(x), rng)

        old_k = self.k.value
        k_sum = self.mu * self.k_sum.value + (1.0 - self.mu) * _k_sum
        k_elem = self.mu * self.k_elem.value + (1.0 - self.mu) * _k_elem
        usage = (k_elem[:, None] >= self.threshold).astype(x.dtype)
        new_k = usage * (k_sum / jnp.maximum(k_elem[:, None], 1e-8)) + (1 - usage) * _k_rand
        self.k_sum.value = k_sum
        self.k_elem.value = k_elem
        self.k.value = new_k

        _k_prob = _k_elem / jnp.maximum(jnp.sum(_k_elem), 1e-8)
        entropy = -jnp.sum(_k_prob * jnp.log(_k_prob + 1e-8))
        return dict(
            entropy=entropy,
            used_curr=jnp.sum(_k_elem >= self.threshold),
            usage=jnp.sum(usage),
            dk=jnp.linalg.norm(new_k - old_k) / jnp.sqrt(jnp.float32(old_k.size)),
        )


class Bottleneck(nn.Module):
    """Per-level VQ blocks (reference ``sr/modules/vq.py:187-221``)."""

    l_bins: int
    emb_width: int
    mu: float
    levels: int
    axis_name: Optional[str] = None

    def setup(self):
        self.level_blocks = [
            BottleneckBlock(self.l_bins, self.emb_width, self.mu,
                            axis_name=self.axis_name, name=f"level_{l}")
            for l in range(self.levels)
        ]

    def encode(self, xs):
        return [blk.encode(x) for blk, x in zip(self.level_blocks, xs)]

    def decode(self, zs, start_level: int = 0, end_level: Optional[int] = None):
        end_level = self.levels if end_level is None else end_level
        return [blk.decode(z)
                for blk, z in zip(self.level_blocks[start_level:end_level], zs)]

    def __call__(self, xs, update_k: bool = True):
        zs, xs_q, commit_losses, metrics = [], [], [], []
        for blk, x in zip(self.level_blocks, xs):
            z, x_q, commit, metric = blk(x, update_k=update_k)
            if not update_k:
                x_q = jax.lax.stop_gradient(x_q)
            zs.append(z)
            xs_q.append(x_q)
            commit_losses.append(commit)
            metrics.append(metric)
        return zs, xs_q, commit_losses, metrics


class Quantizer(nn.Module):
    """Encoder -> VQ -> Decoder F0-VQVAE (reference ``sr/models.py:336-349``)."""

    f0_encoder_params: dict
    f0_vq_params: dict
    f0_decoder_params: dict

    def setup(self):
        from dissc_tpu.models.jukebox import Decoder, Encoder

        self.encoder = Encoder(**self.f0_encoder_params)
        self.vq = Bottleneck(**self.f0_vq_params)
        self.decoder = Decoder(**self.f0_decoder_params)

    def __call__(self, f0, update_k: bool = True):
        f0_h = self.encoder(f0)
        _, f0_h_q, commit_losses, metrics = self.vq(f0_h, update_k=update_k)
        return self.decoder(f0_h_q), commit_losses, metrics
