"""Full-model numerical A/B against the ACTUAL reference torch sources.

Imports the reference implementations from /root/reference (torch, CPU),
builds them with random init, maps their state dicts through
``compat.torch_import``, and asserts our TPU models reproduce the same
numbers end-to-end:

  * CodeGenerator waveform match < 1e-4 + log-mel distance < 0.5 dB
    (the BASELINE.md quality gate), incl. bucketed-length inference
    (reference ``sr/models.py:125-225``),
  * Len/Pitch predictor eval-mode outputs < 1e-4
    (``model/len_predictor.py:5``, ``model/pitch_predictor.py:41,106``),
  * one full GAN training step with reference semantics (D then G,
    AdamW) — loss parity at step 1 AND step 2 (step-2 agreement proves
    the step-1 parameter updates matched) (``sr/train.py:140-191``).

Everything runs on CPU; the reference sources are loaded via importlib
with sys.path shims (sr/ is a self-contained package importing
``modules``/``utils`` as top-level names).
"""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
DB_PER_LN = 20.0 / np.log(10.0)  # our mel is natural-log of magnitude


def _load_file_module(name, path, extra_sys_path=None):
    inserted = False
    if extra_sys_path and extra_sys_path not in sys.path:
        sys.path.insert(0, extra_sys_path)
        inserted = True
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        if inserted:
            sys.path.remove(extra_sys_path)
    return mod


@pytest.fixture(scope="module")
def ref_sr_models():
    # sr/models.py imports `modules.*` and `utils` as top-level names
    for m in list(sys.modules):
        if m == "utils" or m == "modules" or m.startswith("modules."):
            del sys.modules[m]
    mod = _load_file_module("ref_sr_models", os.path.join(REF, "sr", "models.py"),
                            extra_sys_path=os.path.join(REF, "sr"))
    return mod


@pytest.fixture(scope="module")
def ref_len_predictor():
    return _load_file_module("ref_len_predictor",
                             os.path.join(REF, "model", "len_predictor.py"))


@pytest.fixture(scope="module")
def ref_pitch_predictor():
    return _load_file_module("ref_pitch_predictor",
                             os.path.join(REF, "model", "pitch_predictor.py"))


def _vctk_raw():
    with open(os.path.join(REF, "sr", "configs", "VCTK", "hubert100_lut.json")) as f:
        return json.load(f)


def _mel_db_distance(wav_a: np.ndarray, wav_b: np.ndarray, h) -> float:
    """Mean |log-mel| gap in dB between two waveform batches."""
    import jax.numpy as jnp

    from dissc_tpu.audio.mel import mel_spectrogram

    kw = dict(n_fft=h.n_fft, num_mels=h.num_mels, sampling_rate=h.sampling_rate,
              hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin,
              fmax=h.fmax_for_loss)
    ma = mel_spectrogram(jnp.asarray(wav_a), **kw)
    mb = mel_spectrogram(jnp.asarray(wav_b), **kw)
    return float(np.mean(np.abs(np.asarray(ma) - np.asarray(mb)))) * DB_PER_LN


def _randomize_batchnorm(model, seed=0):
    """Give BN layers non-trivial running stats so the import path is
    actually exercised (reference train never ran, so defaults are 0/1)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


# --------------------------------------------------------------------------
# CodeGenerator
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def code_generators(ref_sr_models):
    """(torch model, our config h, our params) on the full VCTK config."""
    from dissc_tpu.compat.torch_import import import_code_generator
    from dissc_tpu.core.config import VocoderConfig

    raw = _vctk_raw()
    torch.manual_seed(0)
    ref_gen = ref_sr_models.CodeGenerator(ref_sr_models.AttrDict(raw)).eval()
    h = VocoderConfig.from_dict(raw)
    params = import_code_generator(ref_gen.state_dict(), h)
    return ref_gen, h, params


def test_code_generator_waveform_parity(code_generators):
    ref_gen, h, params = code_generators
    from dissc_tpu.models.hifigan import CodeGenerator

    rng = np.random.default_rng(0)
    B, T = 2, 20
    code = rng.integers(0, h.num_embeddings, (B, T))
    f0 = rng.standard_normal((B, T)).astype(np.float32)
    spkr = rng.integers(0, 107, (B, 1))

    with torch.no_grad():
        ref_wav = ref_gen(code=torch.from_numpy(code),
                          f0=torch.from_numpy(f0)[:, None, :],
                          spkr=torch.from_numpy(spkr)).squeeze(1).numpy()

    import jax.numpy as jnp
    ours = CodeGenerator(h).apply(
        {"params": params}, jnp.asarray(code, jnp.int32),
        jnp.asarray(f0[..., None]), jnp.asarray(spkr, jnp.int32))
    ours = np.asarray(ours)

    assert ref_wav.shape == ours.shape == (B, T * 320)
    np.testing.assert_allclose(ours, ref_wav, atol=1e-4)

    db = _mel_db_distance(ours, ref_wav, h)
    assert db < 0.5, f"log-mel distance {db:.4f} dB >= 0.5 dB gate"


def test_code_generator_parity_vs_removed_weight_norm(code_generators):
    """The reference folds weight norm at inference (remove_weight_norm);
    our (v, g) apply must match that folded forward too."""
    ref_gen, h, params = code_generators
    import copy

    from dissc_tpu.models.hifigan import CodeGenerator

    rng = np.random.default_rng(1)
    B, T = 2, 16
    code = rng.integers(0, h.num_embeddings, (B, T))
    f0 = rng.standard_normal((B, T)).astype(np.float32)
    spkr = rng.integers(0, 107, (B, 1))

    folded = copy.deepcopy(ref_gen)
    folded.remove_weight_norm()
    with torch.no_grad():
        ref_wav = folded(code=torch.from_numpy(code),
                         f0=torch.from_numpy(f0)[:, None, :],
                         spkr=torch.from_numpy(spkr)).squeeze(1).numpy()

    import jax.numpy as jnp
    ours = np.asarray(CodeGenerator(h).apply(
        {"params": params}, jnp.asarray(code, jnp.int32),
        jnp.asarray(f0[..., None]), jnp.asarray(spkr, jnp.int32)))
    np.testing.assert_allclose(ours, ref_wav, atol=1e-4)


def test_code_generator_bucketed_inference_mel_gate(code_generators):
    """Bucket-padded batched inference (our serving path) vs the
    reference's exact-length forward: < 0.5 dB on the true-length cut."""
    ref_gen, h, params = code_generators
    from dissc_tpu.infer.vocoder import VocoderEngine

    rng = np.random.default_rng(2)
    lengths = [37, 50, 61]  # all pad to the 64-frame bucket
    items = []
    ref_wavs = []
    for i, T in enumerate(lengths):
        code = rng.integers(0, h.num_embeddings, (1, T))
        f0 = rng.standard_normal((1, T)).astype(np.float32)
        spkr = np.array([[i + 1]])
        with torch.no_grad():
            w = ref_gen(code=torch.from_numpy(code),
                        f0=torch.from_numpy(f0)[:, None, :],
                        spkr=torch.from_numpy(spkr)).squeeze().numpy()
        ref_wavs.append(w)
        items.append({"code": code[0].astype(np.int32),
                      "f0": f0[0, :, None], "spkr": spkr[0].astype(np.int32)})

    engine = VocoderEngine(h, params)
    wavs, _ = engine.synthesize_utterances(items, batch_size=4)
    for w_ours, w_ref in zip(wavs, ref_wavs):
        assert w_ours.shape == w_ref.shape
        db = _mel_db_distance(w_ours[None], w_ref[None], h)
        assert db < 0.5, f"bucketed mel distance {db:.4f} dB >= 0.5 dB"
        # the body (away from the padded tail) matches to forward precision
        body = w_ref.shape[0] - 2000
        np.testing.assert_allclose(w_ours[:body], w_ref[:body], atol=1e-4)


# --------------------------------------------------------------------------
# Prosody predictors
# --------------------------------------------------------------------------

def test_len_predictor_parity(ref_len_predictor):
    from dissc_tpu.compat.torch_import import import_len_predictor
    from dissc_tpu.models.prosody import LenPredictor

    torch.manual_seed(1)
    n_tokens, n_speakers = 100, 12
    ref = ref_len_predictor.LenPredictor(
        n_tokens=n_tokens, n_speakers=n_speakers,
        norm_mean=torch.tensor(4.0), norm_std=torch.tensor(2.0)).eval()
    _randomize_batchnorm(ref, seed=11)

    rng = np.random.default_rng(3)
    B, L = 3, 25
    seq = rng.integers(0, n_tokens, (B, L))
    seq[0, -4:] = n_tokens  # pad tokens exercise padding_idx
    spk = rng.integers(0, n_speakers, (B, 1))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(seq), torch.from_numpy(spk)).numpy()

    variables = import_len_predictor(ref.state_dict())
    import jax.numpy as jnp
    ours = LenPredictor(n_tokens=n_tokens, n_speakers=n_speakers).apply(
        variables, jnp.asarray(seq, jnp.int32), jnp.asarray(spk, jnp.int32),
        (jnp.float32(4.0), jnp.float32(2.0)), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


@pytest.mark.parametrize("model_type", ["new", "base"])
def test_pitch_predictor_parity(ref_pitch_predictor, model_type):
    from dissc_tpu.compat.torch_import import import_pitch_predictor
    from dissc_tpu.models.prosody import (PitchPredictor, PitchPredictorBase,
                                          calc_freq)

    torch.manual_seed(2)
    n_tokens, n_speakers = 100, 12
    rng = np.random.default_rng(4)
    id2mean = rng.uniform(100, 250, n_speakers).astype(np.float32)
    id2std = rng.uniform(10, 40, n_speakers).astype(np.float32)
    cls_t = (ref_pitch_predictor.PitchPredictor if model_type == "new"
             else ref_pitch_predictor.PitchPredictorBase)
    ref = cls_t(n_tokens=n_tokens, n_speakers=n_speakers,
                id2pitch_mean=torch.from_numpy(id2mean),
                id2pitch_std=torch.from_numpy(id2std)).eval()
    _randomize_batchnorm(ref, seed=12)

    B, L = 3, 40
    seq = rng.integers(0, n_tokens, (B, L))
    seq[1, -6:] = n_tokens
    spk = rng.integers(0, n_speakers, (B, 1))

    with torch.no_grad():
        ref_cls, ref_reg = ref(torch.from_numpy(seq), torch.from_numpy(spk))
        ref_freq = ref.infer_freq(torch.from_numpy(seq), torch.from_numpy(spk))

    variables = import_pitch_predictor(ref.state_dict(), model_type=model_type)
    import jax.numpy as jnp
    model = (PitchPredictor if model_type == "new" else PitchPredictorBase)(
        n_tokens=n_tokens, n_speakers=n_speakers)
    cls, reg = model.apply(variables, jnp.asarray(seq, jnp.int32),
                           jnp.asarray(spk, jnp.int32), train=False)
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), ref_reg.numpy(), atol=1e-4)
    freq = calc_freq(cls, reg, jnp.asarray(spk, jnp.int32),
                     jnp.asarray(id2mean), jnp.asarray(id2std))
    np.testing.assert_allclose(np.asarray(freq), ref_freq.numpy(), atol=2e-3)


# --------------------------------------------------------------------------
# GAN training step (reference sr/train.py:140-191 semantics)
# --------------------------------------------------------------------------

def _torch_mel(y, h, mel_t):
    """Reference sr/dataset.py:46-69 mel chain with our (validated)
    filterbank, librosa-free."""
    import torch.nn.functional as F

    pad = (h.n_fft - h.hop_size) // 2
    y = F.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(h.win_size)
    spec = torch.stft(y, h.n_fft, hop_length=h.hop_size, win_length=h.win_size,
                      window=window, center=False, pad_mode="reflect",
                      normalized=False, onesided=True, return_complex=True)
    mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    mel = torch.matmul(mel_t, mag)
    return torch.log(torch.clamp(mel, min=1e-5))


def _small_gan_config(raw):
    """Full reference semantics, reduced widths: CPU-tractable fwd+bwd."""
    raw = dict(raw)
    raw.update(upsample_initial_channel=64, embedding_dim=16, model_in_dim=33,
               segment_size=2560, batch_size=2)
    return raw


def test_gan_train_step_loss_parity(ref_sr_models):
    import itertools

    import jax
    import jax.numpy as jnp
    import optax

    from dissc_tpu.audio.mel import mel_filterbank
    from dissc_tpu.compat.torch_import import (import_code_generator,
                                               import_mpd, import_msd)
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import (GANState,
                                                 make_gan_train_step,
                                                 make_models)

    raw = _small_gan_config(_vctk_raw())
    h = VocoderConfig.from_dict(raw)
    ref_h = ref_sr_models.AttrDict(raw)

    torch.manual_seed(3)
    gen_t = ref_sr_models.CodeGenerator(ref_h).train()
    mpd_t = ref_sr_models.MultiPeriodDiscriminator().train()
    msd_t = ref_sr_models.MultiScaleDiscriminator().train()

    lr, b1, b2 = h.learning_rate, h.adam_b1, h.adam_b2
    optim_g = torch.optim.AdamW(gen_t.parameters(), lr, betas=(b1, b2))
    optim_d = torch.optim.AdamW(itertools.chain(msd_t.parameters(),
                                                mpd_t.parameters()),
                                lr, betas=(b1, b2))

    seg_frames = h.segment_size // h.code_hop_size
    rng = np.random.default_rng(5)
    batches = []
    for _ in range(2):
        batches.append(dict(
            code=rng.integers(0, h.num_embeddings, (2, seg_frames)),
            f0=rng.standard_normal((2, seg_frames)).astype(np.float32),
            spkr=rng.integers(0, 10, (2, 1)),
            y=(rng.standard_normal((2, h.segment_size)) * 0.1).astype(np.float32),
        ))

    mel_t = torch.from_numpy(mel_filterbank(
        h.sampling_rate, h.n_fft, h.num_mels, h.fmin, h.fmax_for_loss)).float()

    def torch_step(b):
        y = torch.from_numpy(b["y"]).unsqueeze(1)
        x = dict(code=torch.from_numpy(b["code"]),
                 f0=torch.from_numpy(b["f0"])[:, None, :],
                 spkr=torch.from_numpy(b["spkr"]))
        y_mel = _torch_mel(y.squeeze(1), h, mel_t)
        y_g_hat = gen_t(**x)
        y_g_hat_mel = _torch_mel(y_g_hat.squeeze(1), h, mel_t)

        optim_d.zero_grad()
        y_df_r, y_df_g, _, _ = mpd_t(y, y_g_hat.detach())
        loss_f, _, _ = ref_sr_models.discriminator_loss(y_df_r, y_df_g)
        y_ds_r, y_ds_g, _, _ = msd_t(y, y_g_hat.detach())
        loss_s, _, _ = ref_sr_models.discriminator_loss(y_ds_r, y_ds_g)
        loss_disc = loss_s + loss_f
        loss_disc.backward()
        optim_d.step()

        optim_g.zero_grad()
        loss_mel = torch.nn.functional.l1_loss(y_mel, y_g_hat_mel) * 45
        _, y_df_g, fm_f_r, fm_f_g = mpd_t(y, y_g_hat)
        _, y_ds_g, fm_s_r, fm_s_g = msd_t(y, y_g_hat)
        loss_fm = (ref_sr_models.feature_loss(fm_f_r, fm_f_g)
                   + ref_sr_models.feature_loss(fm_s_r, fm_s_g))
        loss_adv = (ref_sr_models.generator_loss(y_df_g)[0]
                    + ref_sr_models.generator_loss(y_ds_g)[0])
        loss_gen = loss_adv + loss_fm + loss_mel
        loss_gen.backward()
        optim_g.step()
        return dict(loss_disc=float(loss_disc), loss_gen_total=float(loss_gen),
                    loss_mel=float(loss_mel) / 45.0)

    # ---- import the torch init into our state and build our step
    gen_params = import_code_generator(gen_t.state_dict(), h)
    mpd_params = import_mpd(mpd_t.state_dict())
    msd_imported = import_msd(msd_t.state_dict())

    gen_tx = optax.adamw(lr, b1=b1, b2=b2, weight_decay=0.01)
    disc_tx = optax.adamw(lr, b1=b1, b2=b2, weight_decay=0.01)
    disc_params = {"mpd": mpd_params, "msd": msd_imported["params"]}
    state = GANState(
        gen_params=gen_params, mpd_params=mpd_params,
        msd_params=msd_imported["params"],
        msd_spectral=jax.tree.map(jnp.asarray, msd_imported["spectral"]),
        gen_opt=gen_tx.init(gen_params), disc_opt=disc_tx.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )
    train_step, _ = make_gan_train_step(h, gen_tx, disc_tx)

    for i, b in enumerate(batches):
        ref_metrics = torch_step(b)
        batch = {"code": jnp.asarray(b["code"], jnp.int32),
                 "f0": jnp.asarray(b["f0"][..., None]),
                 "spkr": jnp.asarray(b["spkr"], jnp.int32),
                 "audio": jnp.asarray(b["y"])}
        state, metrics = train_step(state, batch)
        for k in ("loss_disc", "loss_gen_total", "loss_mel"):
            ours, ref_v = float(metrics[k]), ref_metrics[k]
            assert abs(ours - ref_v) <= 2e-3 * max(1.0, abs(ref_v)), (
                f"step {i} {k}: ours={ours:.6f} ref={ref_v:.6f}")

    # updated generator params still agree with torch's post-step weights.
    # atol 2e-3 ≈ 2.5 lr units: for params with near-zero gradient, Adam's
    # m/sqrt(v) normalisation amplifies fp-level gradient differences to a
    # full lr-sized step, so a handful of embedding entries can differ by
    # O(lr) while everything else matches to 5e-4; the mean bound pins the
    # aggregate agreement much tighter.
    post = import_code_generator(gen_t.state_dict(), h)
    flat_ours = jax.tree_util.tree_leaves(state.gen_params)
    flat_ref = jax.tree_util.tree_leaves(jax.tree.map(jnp.asarray, post))
    for a, b_ in zip(flat_ours, flat_ref):
        diff = np.abs(np.asarray(a) - np.asarray(b_))
        assert diff.max() < 2e-3, f"max param drift {diff.max():.2e}"
        assert diff.mean() < 2e-5, f"mean param drift {diff.mean():.2e}"
