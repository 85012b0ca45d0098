"""F0-VQVAE quantizer trainer.

Trains the jukebox Encoder -> EMA-VQ -> Decoder stack
(:class:`models.vq.Quantizer`, reference ``sr/models.py:336-349``) on
F0 contours: L2 reconstruction + commit loss, mesh-sharded like the
other trainers.  The reference trains this through speech-resynthesis's
F0-VQ configs (``F0Dataset``); the resulting checkpoint plugs into
CodeGenerator's ``f0_quantizer_path`` conditioning path.
"""
from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dissc_tpu.models.vq import Quantizer
from dissc_tpu.parallel.mesh import mesh_for_batch, shard_batch
from dissc_tpu.train.checkpoints import save_checkpoint, step_checkpoint_name
from dissc_tpu.train.logging import MetricLogger


class QuantizerState(NamedTuple):
    params: Any
    vq_state: Any
    opt_state: Any
    step: jax.Array


DEFAULT_F0_PARAMS = dict(
    f0_encoder_params=dict(input_emb_width=1, output_emb_width=128, levels=1,
                           downs_t=[4], strides_t=[2], width=128, depth=4,
                           m_conv=1.0, dilation_growth_rate=3),
    f0_vq_params=dict(l_bins=20, emb_width=128, mu=0.99, levels=1),
    f0_decoder_params=dict(input_emb_width=1, output_emb_width=128, levels=1,
                           downs_t=[4], strides_t=[2], width=128, depth=4,
                           m_conv=1.0, dilation_growth_rate=3),
)


def make_quantizer_steps(model: Quantizer, tx, lambda_commit: float = 0.02):
    def loss_fn(params, vq_state, f0, rng):
        (f0_rec, commit_losses, metrics), new_vars = model.apply(
            {"params": params, "vq_state": vq_state}, f0,
            rngs={"vq": rng}, mutable=["vq_state"],
        )
        rec = jnp.mean((f0_rec - f0) ** 2)
        commit = sum(commit_losses)
        return rec + lambda_commit * commit, (rec, commit, new_vars["vq_state"], metrics)

    @jax.jit
    def train_step(state: QuantizerState, f0, rng):
        (loss, (rec, commit, new_vq, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.vq_state, f0, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        out_metrics = {"loss": loss, "recon": rec, "commit": commit}
        for k in ("entropy", "usage", "used_curr"):
            if k in metrics[0]:
                out_metrics[k] = metrics[0][k]
        return QuantizerState(params, new_vq, opt_state, state.step + 1), out_metrics

    @jax.jit
    def eval_step(state: QuantizerState, f0, rng):
        (f0_rec, commit_losses, _), _ = model.apply(
            {"params": state.params, "vq_state": state.vq_state}, f0,
            update_k=False, rngs={"vq": rng}, mutable=["vq_state"],
        )
        return jnp.mean((f0_rec - f0) ** 2)

    return train_step, eval_step


def train_f0_quantizer(
    dataset,
    checkpoint_path: str,
    batch_size: int = 16,
    learning_rate: float = 2e-4,
    training_steps: int = 10000,
    lambda_commit: float = 0.02,
    checkpoint_interval: int = 2500,
    seed: int = 1234,
    quantizer_params: Optional[Dict] = None,
    mesh=None,
) -> QuantizerState:
    """Train on an ``F0Dataset``-like sequence of items with 'f0' arrays."""
    os.makedirs(checkpoint_path, exist_ok=True)
    mesh = mesh or mesh_for_batch(batch_size)
    logger = MetricLogger(os.path.join(checkpoint_path, "logs"))

    qp = quantizer_params or DEFAULT_F0_PARAMS
    model = Quantizer(**qp)
    rng = jax.random.key(seed)

    # fixed-shape batches from the dataset's segment crops
    def batches(epoch):
        order = np.random.default_rng(seed + epoch).permutation(len(dataset))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            f0s = [dataset[i]["f0"] for i in order[s : s + batch_size]]
            n = min(f.shape[0] for f in f0s)
            yield np.stack([f[:n] for f in f0s])

    first = next(batches(0))
    rng, init_rng, vq_rng = jax.random.split(rng, 3)
    variables = model.init({"params": init_rng, "vq": vq_rng}, jnp.asarray(first))
    tx = optax.adamw(learning_rate, b1=0.8, b2=0.99)
    state = QuantizerState(variables["params"], variables["vq_state"],
                           tx.init(variables["params"]), jnp.zeros((), jnp.int32))
    train_step, eval_step = make_quantizer_steps(model, tx, lambda_commit)

    steps, epoch = 0, 0
    while steps < training_steps:
        for f0 in batches(epoch):
            if steps >= training_steps:
                break
            rng, step_rng = jax.random.split(rng)
            (b,) = shard_batch(mesh, (jnp.asarray(f0),))
            state, metrics = train_step(state, b, step_rng)
            steps = int(state.step)
            if steps % 100 == 0:
                logger.scalars({k: float(v) for k, v in metrics.items()}, steps,
                               prefix="f0_vq/")
            if steps % checkpoint_interval == 0:
                save_checkpoint(
                    os.path.join(checkpoint_path, step_checkpoint_name("g_", steps)),
                    {"generator": state.params, "vq_state": state.vq_state},
                )
        epoch += 1
    save_checkpoint(
        os.path.join(checkpoint_path, step_checkpoint_name("g_", steps)),
        {"generator": state.params, "vq_state": state.vq_state},
    )
    return state
