"""HiFi-GAN vocoder trainer.

TPU re-design of reference ``sr/train.py``: the alternating D/G GAN
update is a single jitted step over the device mesh — batches sharded on
the ``data`` axis, params replicated, XLA inserting the gradient psum
(the NCCL-DDP equivalent at ``sr/train.py:72-79``).

Step semantics match the reference order of operations
(``sr/train.py:140-191``):
  1. generator forward on the segment batch,
  2. D-step: MPD+MSD LS-GAN loss on (y, stop_grad(y_hat)) -> AdamW update,
  3. G-step with the *updated* discriminators: LS-GAN adv + 2x feature-
     match + 45x mel-L1 -> AdamW update.

TPU optimisation: the generator forward runs ONCE — its VJP is captured
with ``jax.vjp`` and re-used for the G-step backward (the reference's
retained autograd graph, expressed functionally).  The mel-loss target
is computed on device from the audio batch (``audio.mel``), not in the
data loader.

Checkpoint/resume matches the reference scheme: ``g_<08d>`` (generator)
and ``do_<08d>`` (discriminators + both optimizer states + step +
epoch), auto-resume from the latest by name sort (``sr/train.py:55-70``).
"""
from __future__ import annotations

import functools
import itertools
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dissc_tpu.audio.mel import mel_spectrogram
from dissc_tpu.core.config import VocoderConfig, build_env
from dissc_tpu.data.code_dataset import CodeDataset, get_dataset_filelist
from dissc_tpu.data.stats import load_f0_stats
from dissc_tpu.losses.gan import discriminator_loss, feature_loss, generator_loss
from dissc_tpu.models.discriminators import MultiPeriodDiscriminator, MultiScaleDiscriminator
from dissc_tpu.models.hifigan import CodeGenerator
from dissc_tpu.parallel.mesh import mesh_for_batch, shard_batch
from dissc_tpu.train.checkpoints import (
    load_checkpoint,
    save_checkpoint,
    scan_checkpoint,
    step_checkpoint_name,
)
from dissc_tpu.train.logging import MetricLogger


class GANState(NamedTuple):
    """Functional training state for the two-optimizer GAN step."""

    gen_params: Any
    mpd_params: Any
    msd_params: Any
    msd_spectral: Any
    gen_opt: Any
    disc_opt: Any
    step: jax.Array


def make_models(h: VocoderConfig):
    from dissc_tpu.models.hifigan import _resolve_dtype

    s2d = bool(h.get("disc_s2d"))
    ddt = _resolve_dtype(h.get("disc_compute_dtype"))
    return (CodeGenerator(h),
            MultiPeriodDiscriminator(
                periods=tuple(h.get("mpd_periods") or (2, 3, 5, 7, 11)),
                s2d=s2d, dtype=ddt),
            MultiScaleDiscriminator(
                scales=int(h.get("msd_scales") or 3), s2d=s2d, dtype=ddt))


def init_gan_state(h: VocoderConfig, rng, seg_frames: Optional[int] = None,
                   gen_tx=None, disc_tx=None) -> Tuple[GANState, Any, Any]:
    gen, mpd, msd = make_models(h)
    seg_frames = seg_frames or h.segment_size // h.code_hop_size
    code = jnp.zeros((1, seg_frames), jnp.int32)
    f0 = jnp.zeros((1, seg_frames, 1), jnp.float32)
    spkr = jnp.zeros((1, 1), jnp.int32)
    y = jnp.zeros((1, seg_frames * h.code_hop_size), jnp.float32)

    k1, k2, k3 = jax.random.split(rng, 3)
    gen_vars = gen.init(k1, code, f0, spkr)
    mpd_vars = mpd.init(k2, y, y)
    msd_vars = msd.init(k3, y, y)

    # weight_decay=0.01 matches torch.optim.AdamW's default used by the
    # reference (sr/train.py:81-82); optax's default of 1e-4 would make
    # regularization 100x weaker.
    gen_tx = gen_tx or optax.adamw(h.learning_rate, b1=h.adam_b1, b2=h.adam_b2,
                                   weight_decay=0.01)
    disc_tx = disc_tx or optax.adamw(h.learning_rate, b1=h.adam_b1, b2=h.adam_b2,
                                     weight_decay=0.01)
    disc_params = {"mpd": mpd_vars["params"], "msd": msd_vars["params"]}
    state = GANState(
        gen_params=gen_vars["params"],
        mpd_params=mpd_vars["params"],
        msd_params=msd_vars["params"],
        msd_spectral=msd_vars["spectral"],
        gen_opt=gen_tx.init(gen_vars["params"]),
        disc_opt=disc_tx.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, gen_tx, disc_tx


def _pick_mel_fn(h: VocoderConfig):
    """Fused Pallas log-mel on TPU (runs twice per step: y target +
    y_g_hat under grad), XLA chain elsewhere — identical numerics
    (tests/test_kernels.py)."""
    mel_kw = dict(
        n_fft=h.n_fft, num_mels=h.num_mels, sampling_rate=h.sampling_rate,
        hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin, fmax=h.fmax_for_loss,
    )
    use_pallas = (jax.default_backend() == "tpu" and h.n_fft % h.hop_size == 0
                  and h.win_size <= h.n_fft)
    if use_pallas:
        from dissc_tpu.kernels.mel_kernel import mel_spectrogram_pallas_grad

        return lambda y: mel_spectrogram_pallas_grad(
            y, h.n_fft, h.num_mels, h.sampling_rate, h.hop_size, h.win_size,
            float(h.fmin), h.fmax_for_loss)
    return lambda y: mel_spectrogram(y, **mel_kw)


def make_gan_train_step(h: VocoderConfig, gen_tx, disc_tx):
    """Build the jitted GAN train step."""
    gen, mpd, msd = make_models(h)
    mel_fn = _pick_mel_fn(h)

    # donate the state: params + two optimizer trees (~0.5 GB for the full
    # config) update in place instead of being copied every step
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GANState, batch: Dict[str, jax.Array]):
        # f0 is optional: f0=False configs train without it (reference
        # sr/models.py builds the LUT-only input in that case)
        code, f0, spkr, y = (batch["code"], batch.get("f0"), batch["spkr"],
                             batch["audio"])

        # ---- generator forward, VJP captured for the later G backward
        y_g_hat, gen_vjp = jax.vjp(
            lambda p: gen.apply({"params": p}, code, f0, spkr), state.gen_params
        )
        y_g_stop = jax.lax.stop_gradient(y_g_hat)

        # ---- D step (LS-GAN on real vs detached fake)
        def d_loss_fn(disc_params, spectral):
            p_rs, p_gs, _, _ = mpd.apply({"params": disc_params["mpd"]}, y, y_g_stop, True)
            (s_rs, s_gs, _, _), new_spectral = msd.apply(
                {"params": disc_params["msd"], "spectral": spectral},
                y, y_g_stop, True, mutable=["spectral"],
            )
            loss_p, _, _ = discriminator_loss(p_rs, p_gs)
            loss_s, _, _ = discriminator_loss(s_rs, s_gs)
            return loss_p + loss_s, new_spectral["spectral"]

        disc_params = {"mpd": state.mpd_params, "msd": state.msd_params}
        (d_loss, new_spectral), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            disc_params, state.msd_spectral
        )
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        # ---- G step against the UPDATED discriminators
        y_mel = mel_fn(y)

        def g_loss_from_wave(y_hat):
            y_hat_mel = mel_fn(y_hat)
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * 45.0
            _, p_gs, p_fr, p_fg = mpd.apply({"params": disc_params["mpd"]}, y, y_hat,
                                            True)
            # train=True + mutable: the MSD spectral-norm power iteration
            # advances in the G forward too, exactly like the reference
            # (sr/train.py:180-181 runs msd in train mode a second time)
            if h.get("msd_fused_gstep"):
                # forward-identical fused stack whose custom_vjp backward
                # differentiates w.r.t. y_hat only (models/msd_fused.py)
                from dissc_tpu.models.hifigan import _resolve_dtype
                from dissc_tpu.models.msd_fused import (fold_msd_weights,
                                                        msd_g_apply)
                weights, spec_new = fold_msd_weights(
                    disc_params["msd"], new_spectral, train=True,
                    dtype=_resolve_dtype(h.get("disc_compute_dtype")))
                _, s_gs, s_fr, s_fg = msd_g_apply(weights, y, y_hat)
                g_spec = {"spectral": spec_new}
            else:
                (_, s_gs, s_fr, s_fg), g_spec = msd.apply(
                    {"params": disc_params["msd"], "spectral": new_spectral}, y, y_hat,
                    True, mutable=["spectral"],
                )
            loss_fm = feature_loss(p_fr, p_fg) + feature_loss(s_fr, s_fg)
            loss_adv = generator_loss(p_gs)[0] + generator_loss(s_gs)[0]
            return loss_adv + loss_fm + loss_mel, (
                loss_mel, loss_fm, loss_adv, g_spec["spectral"])

        (g_loss, (loss_mel, loss_fm, loss_adv, final_spectral)), dy = jax.value_and_grad(
            g_loss_from_wave, has_aux=True
        )(y_g_hat)
        (g_grads,) = gen_vjp(dy)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = GANState(
            gen_params=gen_params,
            mpd_params=disc_params["mpd"],
            msd_params=disc_params["msd"],
            msd_spectral=final_spectral,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
            step=state.step + 1,
        )
        # mel error reported like the reference (mean L1, sr/train.py:199)
        metrics = {
            "loss_disc": d_loss,
            "loss_gen_total": g_loss,
            "loss_mel": loss_mel / 45.0,
            "loss_fm": loss_fm,
            "loss_adv": loss_adv,
        }
        return new_state, metrics

    @jax.jit
    def val_step(state: GANState, batch: Dict[str, jax.Array]):
        y_g_hat = gen.apply({"params": state.gen_params}, batch["code"],
                            batch.get("f0"), batch["spkr"])
        y_mel = mel_fn(batch["audio"])
        y_hat_mel = mel_fn(y_g_hat)
        # per-item errors: the host averages over unique items, matching
        # the reference's batch_size=1 validation mean (sr/train.py:199)
        # and letting wrap-around-padded final batches be trimmed exactly
        err = jnp.mean(jnp.abs(y_mel - y_hat_mel), axis=tuple(range(1, y_mel.ndim)))
        return err, y_g_hat

    return train_step, val_step


def train_vocoder(
    h: VocoderConfig,
    checkpoint_path: str,
    training_steps: int = 400000,
    training_epochs: int = 2000,
    stdout_interval: int = 5,
    checkpoint_interval: int = 10000,
    summary_interval: int = 100,
    validation_interval: int = 1000,
    mesh=None,
    max_val_batches: int = 10,
) -> GANState:
    """Full training loop with resume/checkpoints/validation.

    Defaults mirror the reference CLI (``sr/train.py:293-308``).
    """
    os.makedirs(checkpoint_path, exist_ok=True)
    mesh = mesh or mesh_for_batch(h.batch_size)
    logger = MetricLogger(os.path.join(checkpoint_path, "logs"))

    (train_files, val_files) = get_dataset_filelist(h)
    f0_stats = load_f0_stats(h.f0_stats) if (h.f0_normalize and h.f0_stats) else None
    ds_train = CodeDataset(
        train_files, h.segment_size, h.code_hop_size, h.sampling_rate,
        multispkr=h.multispkr, f0=h.f0, f0_stats=f0_stats,
        f0_normalize=h.f0_normalize, f0_median=h.f0_median, seed=h.seed,
    )
    ds_val = CodeDataset(
        val_files, h.segment_size, h.code_hop_size, h.sampling_rate,
        multispkr=h.multispkr, f0=h.f0, f0_stats=f0_stats,
        f0_normalize=h.f0_normalize, f0_median=h.f0_median,
        id_to_spkr=getattr(ds_train, "id_to_spkr", None), seed=h.seed,
    )
    if h.multispkr:
        save_checkpoint(os.path.join(checkpoint_path, "id_to_spkr.pkl"),
                        ds_train.id_to_spkr)

    seg_frames = h.segment_size // h.code_hop_size
    steps_per_epoch = max(1, len(ds_train) // h.batch_size)
    lr_schedule = optax.exponential_decay(
        h.learning_rate, transition_steps=steps_per_epoch, decay_rate=h.lr_decay,
        staircase=True,
    )
    # torch AdamW default weight_decay (reference sr/train.py:81-82)
    gen_tx = optax.adamw(lr_schedule, b1=h.adam_b1, b2=h.adam_b2,
                         weight_decay=0.01)
    disc_tx = optax.adamw(lr_schedule, b1=h.adam_b1, b2=h.adam_b2,
                          weight_decay=0.01)

    state, gen_tx, disc_tx = init_gan_state(
        h, jax.random.key(h.seed), seg_frames, gen_tx, disc_tx
    )

    # resume (reference sr/train.py:55-70)
    cp_g = scan_checkpoint(checkpoint_path, "g_")
    cp_do = scan_checkpoint(checkpoint_path, "do_")
    last_epoch = -1
    if cp_g and cp_do:
        g_ckpt = load_checkpoint(cp_g)
        do_ckpt = load_checkpoint(cp_do)
        state = GANState(
            gen_params=g_ckpt["generator"],
            mpd_params=do_ckpt["mpd"],
            msd_params=do_ckpt["msd"],
            msd_spectral=do_ckpt["msd_spectral"],
            gen_opt=jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b), state.gen_opt, do_ckpt["optim_g"]
            ),
            disc_opt=jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b), state.disc_opt, do_ckpt["optim_d"]
            ),
            step=jnp.int32(do_ckpt["steps"]),
        )
        last_epoch = do_ckpt["epoch"]
        print(f"Resumed from {cp_g} at step {int(state.step)}")

    train_step, val_step = make_gan_train_step(h, gen_tx, disc_tx)

    def save_all(epoch: int):
        step = int(state.step)
        save_checkpoint(
            os.path.join(checkpoint_path, step_checkpoint_name("g_", step)),
            {"generator": state.gen_params},
        )
        save_checkpoint(
            os.path.join(checkpoint_path, step_checkpoint_name("do_", step)),
            {
                "mpd": state.mpd_params,
                "msd": state.msd_params,
                "msd_spectral": state.msd_spectral,
                "optim_g": state.gen_opt,
                "optim_d": state.disc_opt,
                "steps": step,
                "epoch": epoch,
            },
        )

    def prefetched(it, depth: int = 2):
        """Host-side batch prefetch: decode/crop the next batches on a
        worker thread while the device runs the current step (the
        reference's DataLoader workers, minus the processes)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            for item in it:
                q.put(item)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item

    steps = int(state.step)
    if steps >= training_steps:
        # pure resume of an already-finished run: return the loaded state
        # (the small-split check below must not block inference prep)
        save_all(max(0, last_epoch))
        return state
    # training_steps with drop_last batching needs at least one full
    # batch per epoch, else the epoch loop would spin forever doing
    # nothing (reference sr/train.py has the same implicit contract)
    if len(ds_train) < h.batch_size:
        raise ValueError(
            f"train split has {len(ds_train)} items < batch_size "
            f"{h.batch_size}: no full batch to train on — shrink the batch "
            f"or repeat manifest records (each draw crops randomly)")
    for epoch in range(max(0, last_epoch), training_epochs):
        start = time.time()
        for batch in prefetched(
            ds_train.batches(h.batch_size, shuffle=True, seed=h.seed + epoch,
                             process_index=jax.process_index(),
                             process_count=jax.process_count())
        ):
            if steps >= training_steps:
                save_all(epoch)
                return state
            batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
            t0 = time.time()
            state, metrics = train_step(state, batch)
            # host-side step counter: reading int(state.step) here would
            # force a device sync every step (one tunnel RTT), serializing
            # dispatch; the count is deterministic (+1/step, seeded from
            # the checkpoint on resume)
            steps += 1
            if steps % stdout_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {steps}: gen {m['loss_gen_total']:.3f} "
                      f"mel {m['loss_mel']:.3f} disc {m['loss_disc']:.3f} "
                      f"({time.time()-t0:.2f}s/b)")
            if steps % summary_interval == 0:
                logger.scalars({k: float(v) for k, v in metrics.items()}, steps,
                               prefix="training/")
            if steps % checkpoint_interval == 0 and steps != 0:
                save_all(epoch)
            if steps % validation_interval == 0 and steps != 0:
                errs = []
                # validation batch sized to the val split (the reference
                # validates with batch_size=1, sr/train.py:104-110): with
                # val sets smaller than the train batch, batches() would
                # otherwise yield nothing and validation silently skip.
                # Rounded to a multiple of the mesh's data axis so the
                # batch still shards.
                n_data = int(dict(mesh.shape).get(h.get("dp_axis", "data"), 1))
                val_bs = max(1, min(h.batch_size, len(ds_val)))
                val_bs = max(n_data, val_bs // n_data * n_data)
                for i, vbatch in enumerate(ds_val.batches(val_bs, shuffle=False,
                                                          drop_last=False)):
                    if i >= max_val_batches:
                        break
                    vbatch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in vbatch.items()})
                    err, y_hat = val_step(state, vbatch)
                    errs.extend(np.asarray(err).tolist())
                    if i == 0:
                        # first-batch audio + spectrogram samples, like the
                        # reference's validation logging (sr/train.py:216-273)
                        from dissc_tpu.audio.mel import mel_spectrogram as _mel
                        from dissc_tpu.train.logging import plot_spectrogram

                        wav0 = np.asarray(y_hat)[0]
                        logger.audio("generated/y_hat_0", wav0, steps,
                                     sample_rate=h.sampling_rate)
                        spec = np.asarray(_mel(wav0[None, :],
                                               n_fft=h.n_fft, num_mels=h.num_mels,
                                               sampling_rate=h.sampling_rate,
                                               hop_size=h.hop_size, win_size=h.win_size,
                                               fmin=h.fmin, fmax=h.fmax))[0]
                        try:
                            logger.figure("generated/y_hat_spec_0",
                                          plot_spectrogram(spec), steps)
                        except Exception:
                            pass
                if errs:
                    # drop wrap-around duplicates from the padded final batch
                    errs = errs[: len(ds_val)]
                    logger.scalars({"mel_spec_error": float(np.mean(errs))}, steps,
                                   prefix="validation/")
        print(f"epoch {epoch} done in {time.time()-start:.1f}s")
    save_all(training_epochs - 1)
    return state
