"""Rhythm + pitch predictor trainers.

TPU re-design of reference ``train_len_predictor.py`` /
``train_f0_predictor.py``: one jitted train step (forward + loss +
metrics + optax update) per model, batches sharded over the mesh's
``data`` axis, params replicated — XLA inserts the gradient psum (the
DDP-allreduce equivalent).  Metric accounting matches the reference:
masked *sums* accumulated across the epoch, normalised by the total
non-pad element count only at logging time.

Model selection: best summed val MSE for rhythm
(``train_len_predictor.py:100-103``), best summed val MAE for pitch
(``train_f0_predictor.py:97-100``) -> ``best_model.pth``.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from dissc_tpu.core.config import ProsodyConfig
from dissc_tpu.data.datasets import LenDataset, PitchDataset, batch_iterator
from dissc_tpu.data.stats import load_f0_stats, load_id_to_spkr, prep_stats_arrays
from dissc_tpu.losses.len_loss import (
    len_exact_accuracy,
    len_mae_loss,
    len_mse_loss,
    len_one_off_accuracy,
    len_sum_loss,
)
from dissc_tpu.losses.pitch_loss import pitch_loss, pitch_mae, pitch_mse
from dissc_tpu.models.prosody import LenPredictor, PitchPredictor, PitchPredictorBase, calc_freq
from dissc_tpu.parallel.mesh import mesh_for_batch, shard_batch
from dissc_tpu.train.checkpoints import save_checkpoint
from dissc_tpu.train.logging import init_loggers, log_metrics


class TrainState(train_state.TrainState):
    batch_stats: Any = None


# ---------------------------------------------------------------------------
# Rhythm (LenPredictor)
# ---------------------------------------------------------------------------


def _len_metrics(preds, lens, pad):
    return {
        "MSE": len_mse_loss(preds, lens, pad),
        "MAE": len_mae_loss(preds, lens, pad),
        "Accuracy": len_exact_accuracy(preds, lens, pad),
        "Accuracy_1": len_one_off_accuracy(preds, lens, pad),
    }


def make_len_steps(model: LenPredictor, norm_stats: Tuple[float, float], pad: float = -1.0):
    """Build (train_step, eval_step) jitted functions for the rhythm model."""

    def loss_fn(params, batch_stats, vals, lens, spk, rng):
        preds, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            vals, spk, norm_stats, train=True,
            rngs={"mask": rng}, mutable=["batch_stats"],
        )
        return len_sum_loss(preds, lens, pad), (preds, updates["batch_stats"])

    @jax.jit
    def train_step(state: TrainState, vals, lens, spk, rng):
        (loss, (preds, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, vals, lens, spk, rng
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        metrics = {"Loss": loss, **_len_metrics(preds, lens, pad)}
        metrics["n"] = (vals != model.n_tokens).sum()
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, vals, lens, spk):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            vals, spk, norm_stats,
        )
        metrics = {"Loss": len_sum_loss(preds, lens, pad), **_len_metrics(preds, lens, pad)}
        metrics["n"] = (vals != model.n_tokens).sum()
        return metrics

    return train_step, eval_step


def train_len_predictor(
    data_path: str,
    out_path: str,
    cfg: Optional[ProsodyConfig] = None,
    mesh=None,
) -> str:
    """Full rhythm-trainer loop; returns the checkpoint directory."""
    cfg = cfg or ProsodyConfig()
    pad = -1.0
    ckpt_dir = os.path.join(out_path, "len")
    os.makedirs(ckpt_dir, exist_ok=True)
    train_logger, val_logger = init_loggers(ckpt_dir)

    spk_id_dict = load_id_to_spkr(os.path.join(data_path, "id_to_spkr.pkl"))
    ds_train = LenDataset.from_file(os.path.join(data_path, "train.txt"), spk_id_dict,
                                    cfg.n_tokens, pad)
    ds_val = LenDataset.from_file(os.path.join(data_path, "val.txt"), spk_id_dict,
                                  cfg.n_tokens, pad)

    norm_stats = ds_train.train_norm_stats()
    save_checkpoint(os.path.join(ckpt_dir, "len_norm_stats.pth"), norm_stats)

    model = LenPredictor(n_tokens=cfg.n_tokens, n_speakers=len(spk_id_dict),
                         emb_size=cfg.emb_size, hidden=cfg.hidden,
                         masking_rate=cfg.len_masking_rate)
    rng = jax.random.key(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    variables = model.init(init_rng, ds_train.vals[:1], ds_train.spk_ids[:1], norm_stats)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(cfg.learning_rate), batch_stats=variables["batch_stats"],
    )
    train_step, eval_step = make_len_steps(model, norm_stats, pad)

    mesh = mesh or mesh_for_batch(cfg.batch_size)
    np_rng = np.random.default_rng(cfg.seed)
    best_mse = np.inf
    pad_rows = (cfg.n_tokens, pad, 0)
    for epoch in range(cfg.n_epochs):
        totals: Dict[str, float] = {}
        for vals, lens, spk in batch_iterator(
            (ds_train.vals, ds_train.lens, ds_train.spk_ids), cfg.batch_size,
            shuffle=True, rng=np_rng, pad_row_values=pad_rows,
        ):
            rng, step_rng = jax.random.split(rng)
            b = shard_batch(mesh, (jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(spk)))
            state, metrics = train_step(state, *b, step_rng)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        n = max(totals.pop("n"), 1.0)
        log_metrics(train_logger, {k: v / n for k, v in totals.items()}, epoch, "train")

        totals = {}
        for vals, lens, spk in batch_iterator(
            (ds_val.vals, ds_val.lens, ds_val.spk_ids), cfg.batch_size,
            shuffle=False, pad_row_values=pad_rows,
        ):
            b = shard_batch(mesh, (jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(spk)))
            metrics = eval_step(state, *b)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        n = max(totals.pop("n"), 1.0)
        if totals["MSE"] < best_mse:
            best_mse = totals["MSE"]
            save_checkpoint(os.path.join(ckpt_dir, "best_model.pth"),
                            {"params": state.params, "batch_stats": state.batch_stats})
        log_metrics(val_logger, {k: v / n for k, v in totals.items()}, epoch, "val")
    return ckpt_dir


# ---------------------------------------------------------------------------
# Pitch (PitchPredictor / PitchPredictorBase)
# ---------------------------------------------------------------------------


def build_pitch_model(model_type: str, n_tokens: int, n_speakers: int,
                      cfg: Optional[ProsodyConfig] = None):
    cfg = cfg or ProsodyConfig()
    cls = PitchPredictorBase if model_type == "base" else PitchPredictor
    return cls(n_tokens=n_tokens, n_speakers=n_speakers, emb_size=cfg.emb_size,
               hidden=cfg.hidden, masking_rate=cfg.pitch_masking_rate)


def make_pitch_steps(model, id2mean, id2std, pad: float = -100.0):
    id2mean = jnp.asarray(id2mean)
    id2std = jnp.asarray(id2std)

    def loss_fn(params, batch_stats, vals, gts, spk, rng):
        (cls_p, reg_p), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            vals, spk, True,
            rngs={"mask": rng, "dropout": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"],
        )
        loss = pitch_loss(cls_p, reg_p, gts, spk, id2mean, id2std, pad)
        return loss, (cls_p, reg_p, updates["batch_stats"])

    def _metrics(cls_p, reg_p, gts, spk):
        freqs = calc_freq(cls_p, reg_p, spk, id2mean, id2std)
        return {
            "MAE": pitch_mae(freqs, gts, spk, id2mean, id2std, pad),
            "MSE": pitch_mse(freqs, gts, spk, id2mean, id2std, pad),
        }

    @jax.jit
    def train_step(state: TrainState, vals, gts, spk, rng):
        (loss, (cls_p, reg_p, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, vals, gts, spk, rng
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        metrics = {"loss": loss, **_metrics(cls_p, reg_p, gts, spk)}
        metrics["n"] = (gts != pad).sum()
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, vals, gts, spk):
        cls_p, reg_p = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, vals, spk
        )
        metrics = {"loss": pitch_loss(cls_p, reg_p, gts, spk, id2mean, id2std, pad),
                   **_metrics(cls_p, reg_p, gts, spk)}
        metrics["n"] = (gts != pad).sum()
        return metrics

    return train_step, eval_step


def train_f0_predictor(
    data_path: str,
    f0_path: str,
    out_path: str,
    cfg: Optional[ProsodyConfig] = None,
    mesh=None,
) -> str:
    cfg = cfg or ProsodyConfig()
    pad = -100.0
    ckpt_dir = os.path.join(out_path, "pitch")
    os.makedirs(ckpt_dir, exist_ok=True)
    train_logger, val_logger = init_loggers(ckpt_dir)

    f0_param_dict = load_f0_stats(f0_path)
    spk_id_dict = load_id_to_spkr(os.path.join(data_path, "id_to_spkr.pkl"))
    id2mean, id2std = prep_stats_arrays(spk_id_dict, f0_param_dict)

    ds_train = PitchDataset.from_file(os.path.join(data_path, "train.txt"), spk_id_dict,
                                      f0_param_dict, cfg.n_tokens, pad)
    ds_val = PitchDataset.from_file(os.path.join(data_path, "val.txt"), spk_id_dict,
                                    f0_param_dict, cfg.n_tokens, pad)

    model = build_pitch_model(cfg.model_type, cfg.n_tokens, len(spk_id_dict), cfg)
    rng = jax.random.key(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    variables = model.init(init_rng, ds_train.vals[:1], ds_train.spk_ids[:1])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(cfg.learning_rate), batch_stats=variables["batch_stats"],
    )
    train_step, eval_step = make_pitch_steps(model, id2mean, id2std, pad)

    mesh = mesh or mesh_for_batch(cfg.batch_size)
    np_rng = np.random.default_rng(cfg.seed)
    best_mae = np.inf
    pad_rows = (cfg.n_tokens, pad, 0)
    for epoch in range(cfg.n_epochs):
        totals: Dict[str, float] = {}
        for vals, gts, spk in batch_iterator(
            (ds_train.vals, ds_train.fs, ds_train.spk_ids), cfg.batch_size,
            shuffle=True, rng=np_rng, pad_row_values=pad_rows,
        ):
            rng, step_rng = jax.random.split(rng)
            b = shard_batch(mesh, (jnp.asarray(vals), jnp.asarray(gts), jnp.asarray(spk)))
            state, metrics = train_step(state, *b, step_rng)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        n = max(totals.pop("n"), 1.0)
        log_metrics(train_logger, {k: v / n for k, v in totals.items()}, epoch, "train")

        totals = {}
        for vals, gts, spk in batch_iterator(
            (ds_val.vals, ds_val.fs, ds_val.spk_ids), cfg.batch_size,
            shuffle=False, pad_row_values=pad_rows,
        ):
            b = shard_batch(mesh, (jnp.asarray(vals), jnp.asarray(gts), jnp.asarray(spk)))
            metrics = eval_step(state, *b)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        n = max(totals.pop("n"), 1.0)
        if totals["MAE"] < best_mae:
            best_mae = totals["MAE"]
            save_checkpoint(os.path.join(ckpt_dir, "best_model.pth"),
                            {"params": state.params, "batch_stats": state.batch_stats})
        log_metrics(val_logger, {k: v / n for k, v in totals.items()}, epoch, "val")
    return ckpt_dir
