"""Rhythm (duration) and pitch-contour predictors.

Flax re-designs of the reference prosody models:

  * :class:`LenPredictor` — reference ``model/len_predictor.py:5-52``:
    token+speaker embeddings -> 8-layer BN'd conv trunk -> per-run
    duration, de-normalised by train-set length stats.
  * :class:`PitchPredictor` — reference ``model/pitch_predictor.py:41-104``
    ("new" variant, linear-ramp positional encoding on the speaker
    embedding, no trunk BN) and :class:`PitchPredictorBase`
    (``:106-176``, paper variant, BN everywhere) -> dual heads:
    voicing logit + whitened-f0 regression.

TPU-first differences from the reference (behaviour preserved):
  * channels-last layout throughout; convs hit the MXU as batched
    [B*T, C_in] x [C_in, C_out] contractions after im2col by XLA.
  * train-time token-embedding masking (the reference's
    ``torch.cuda.FloatTensor(...).uniform_()`` CUDA-ism) is a
    ``jax.random.bernoulli`` draw from a threaded PRNG key.
  * BatchNorm runs with cross-replica stats when an ``axis_name`` is
    given (data-parallel training sees identical statistics to
    single-device large-batch training).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dissc_tpu.models.layers import Conv1d, Embed


class _BN(nn.Module):
    """torch-default BatchNorm1d (momentum 0.1, eps 1e-5), channels-last."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
        )(x)


def _mask_embeddings(emb, keep_rate: float, rng) -> jax.Array:
    """Zero whole per-position embedding vectors with prob 1-keep_rate.

    Reference regularisation (``model/len_predictor.py:37-39``): the
    mask is drawn per (batch, time) position over the token embedding.
    """
    keep = jax.random.uniform(rng, emb.shape[:2]) <= keep_rate
    return emb * keep[..., None]


class LenPredictor(nn.Module):
    """Per-run duration ("rhythm") predictor."""

    n_tokens: int = 100
    n_speakers: int = 99
    emb_size: int = 32
    hidden: int = 128
    masking_rate: float = 0.2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, seq, spk_id, norm_stats, train: bool = False, length_mask=None):
        """seq: [B, L] int tokens (pad = n_tokens); spk_id: [B, 1];
        norm_stats: (mean, std) scalars used to de-normalise the output
        (stored outside the params, reference train_len_predictor.py:28-32).
        ``length_mask`` ([B, L] bool, inference): zero activations beyond
        the valid length at every layer so a padded batched forward is
        bit-identical to the reference's unpadded single-sample forward
        (conv zero-padding at the true boundary).
        Returns [B, L] float durations."""
        emb_seq = Embed(self.n_tokens + 1, self.emb_size, padding_idx=self.n_tokens,
                        name="token_emb")(seq)
        if train:
            emb_seq = _mask_embeddings(emb_seq, 1.0 - self.masking_rate, self.make_rng("mask"))

        emb_spk = Embed(self.n_speakers, self.emb_size, name="spk_emb")(spk_id)  # [B,1,E]
        emb_spk = jnp.broadcast_to(emb_spk, (*seq.shape, self.emb_size))
        x = jnp.concatenate([emb_seq, emb_spk], axis=-1)

        lm = None if length_mask is None else length_mask[..., None]
        clamp = (lambda z: z) if lm is None else (lambda z: jnp.where(lm, z, 0.0))
        leaky = lambda z: nn.leaky_relu(z, negative_slope=0.01)  # torch default slope
        bn = lambda name: _BN(axis_name=self.axis_name, name=name)
        x = clamp(x)
        x = clamp(leaky(bn("bn1")(Conv1d(self.hidden, 3, name="cnn1")(x), train)))
        for i in range(1, 7):
            x = clamp(leaky(bn(f"bn1{i}")(Conv1d(self.hidden, 3, name=f"cnn1{i}")(x), train)))
        out = Conv1d(1, 3, name="cnn2")(x)[..., 0]
        mean, std = norm_stats
        return out * std + mean


class LinearRampPE(nn.Module):
    """Linear-ramp positional encoding (reference ``model/pitch_predictor.py:6-38``).

    First half of channels ramp 0->1 over ``max_len`` positions, second
    half ramp 1->0; added to the input and dropout-ed at train time.
    """

    d_model: int
    dropout: float = 0.4
    max_len: int = 850

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = x.shape[1]
        # positions beyond max_len hold the final ramp value — the
        # reference hard-fails past 850 frames (fixed buffer,
        # model/pitch_predictor.py:7); identical for t <= max_len.
        pos = jnp.minimum(jnp.arange(t), self.max_len - 1) / (self.max_len - 1)
        half = self.d_model // 2
        pe = jnp.concatenate(
            [
                jnp.broadcast_to(pos[:, None], (t, half)),
                jnp.broadcast_to((1.0 - pos)[:, None], (t, self.d_model - half)),
            ],
            axis=-1,
        )
        x = x + pe[None]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _PitchCore(nn.Module):
    """Shared embed/trunk/heads machinery for the two pitch variants."""

    n_tokens: int
    n_speakers: int
    emb_size: int
    hidden: int
    masking_rate: float
    use_pe: bool
    trunk_bn: bool
    head_bn: bool
    neck_bn: bool
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, seq, spk_id, train: bool = False, length_mask=None):
        emb_seq = Embed(self.n_tokens + 1, self.emb_size, padding_idx=self.n_tokens,
                        name="token_emb")(seq)
        if train:
            emb_seq = _mask_embeddings(emb_seq, 1.0 - self.masking_rate, self.make_rng("mask"))

        emb_spk = Embed(self.n_speakers + 1, self.emb_size, padding_idx=self.n_speakers,
                        name="spk_emb")(spk_id)
        emb_spk = jnp.broadcast_to(emb_spk, (*seq.shape, self.emb_size))
        if self.use_pe:
            emb_spk = LinearRampPE(self.emb_size, name="pe")(emb_spk, train)
        x = jnp.concatenate([emb_seq, emb_spk], axis=-1)

        lm = None if length_mask is None else length_mask[..., None]
        clamp = (lambda z: z) if lm is None else (lambda z: jnp.where(lm, z, 0.0))
        leaky = lambda z: nn.leaky_relu(z, negative_slope=0.01)

        def block(z, conv_name, bn_name, with_bn):
            z = Conv1d(self.hidden, 3, name=conv_name)(z)
            if with_bn:
                z = _BN(axis_name=self.axis_name, name=bn_name)(z, train)
            return clamp(leaky(z))

        x = clamp(x)
        x = block(x, "cnn1", "bn1", self.trunk_bn)
        for i in range(1, 8):
            x = block(x, f"cnn1{i}", f"bn1{i}", self.trunk_bn)

        x = block(x, "cnn2", "bn2", self.neck_bn)
        cls = block(x, "cnn_class1", "bn_c1", self.head_bn)
        cls = Conv1d(1, 1, name="cnn_class2")(cls)[..., 0]
        reg = block(x, "cnn_reg1", "bn_r1", self.head_bn)
        reg = Conv1d(1, 1, name="cnn_reg2")(reg)[..., 0]
        return cls, reg


class PitchPredictor(nn.Module):
    """'new' pitch variant: ramp PE on speaker emb, BN only on the neck."""

    n_tokens: int = 100
    n_speakers: int = 199
    emb_size: int = 32
    hidden: int = 128
    masking_rate: float = 0.4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, seq, spk_id, train: bool = False, length_mask=None):
        return _PitchCore(
            self.n_tokens, self.n_speakers, self.emb_size, self.hidden, self.masking_rate,
            use_pe=True, trunk_bn=False, head_bn=False, neck_bn=True,
            axis_name=self.axis_name, name="core",
        )(seq, spk_id, train, length_mask)


class PitchPredictorBase(nn.Module):
    """paper ('base') pitch variant: no PE, BN on trunk and heads."""

    n_tokens: int = 100
    n_speakers: int = 199
    emb_size: int = 32
    hidden: int = 128
    masking_rate: float = 0.4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, seq, spk_id, train: bool = False, length_mask=None):
        return _PitchCore(
            self.n_tokens, self.n_speakers, self.emb_size, self.hidden, self.masking_rate,
            use_pe=False, trunk_bn=True, head_bn=True, neck_bn=False,
            axis_name=self.axis_name, name="core",
        )(seq, spk_id, train, length_mask)


def calc_freq(class_preds, reg_preds, spk_id, id2pitch_mean, id2pitch_std, norm: bool = False):
    """Voicing-gated de-whitened pitch (reference ``model/pitch_predictor.py:100-104``).

    ``(class > 0) * (mean[spk] + reg * std[spk])``, or the normalised
    regression if ``norm``.
    """
    spk_mask = class_preds > 0
    if not norm:
        reg_preds = id2pitch_mean[spk_id] + reg_preds * id2pitch_std[spk_id]
    return spk_mask * reg_preds
