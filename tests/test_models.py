"""Shape/behaviour tests for the Flax models."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.models.discriminators import MultiPeriodDiscriminator, MultiScaleDiscriminator
from dissc_tpu.models.hifigan import CodeGenerator, Generator
from dissc_tpu.models.prosody import LenPredictor, PitchPredictor, PitchPredictorBase, calc_freq


def _small_vocoder_config():
    return VocoderConfig(
        upsample_rates=(5, 4, 4, 2, 2),
        upsample_kernel_sizes=(11, 8, 8, 4, 4),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        num_embeddings=100,
        embedding_dim=16,
        model_in_dim=33,  # 16 + 1 + 16
    )


def test_len_predictor_shapes_and_norm():
    model = LenPredictor(n_tokens=100, n_speakers=4)
    seq = jnp.array([[1, 2, 2, 100], [3, 3, 4, 5]], jnp.int32)
    spk = jnp.array([[0], [1]], jnp.int32)
    variables = model.init(jax.random.key(0), seq, spk, (0.0, 1.0))
    out = model.apply(variables, seq, spk, (0.0, 1.0))
    assert out.shape == (2, 4)
    out2 = model.apply(variables, seq, spk, (10.0, 2.0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out) * 2.0 + 10.0, atol=1e-4)


def test_len_predictor_train_masking_changes_output():
    model = LenPredictor(n_tokens=100, n_speakers=4, masking_rate=0.9)
    seq = jnp.ones((2, 32), jnp.int32)
    spk = jnp.zeros((2, 1), jnp.int32)
    variables = model.init(jax.random.key(0), seq, spk, (0.0, 1.0))
    eval_out = model.apply(variables, seq, spk, (0.0, 1.0))
    train_out, _ = model.apply(
        variables, seq, spk, (0.0, 1.0), train=True,
        rngs={"mask": jax.random.key(1)}, mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))


@pytest.mark.parametrize("cls", [PitchPredictor, PitchPredictorBase])
def test_pitch_predictor_shapes(cls):
    model = cls(n_tokens=100, n_speakers=4)
    seq = jnp.ones((2, 10), jnp.int32)
    spk = jnp.zeros((2, 1), jnp.int32)
    variables = model.init(jax.random.key(0), seq, spk)
    cls_out, reg_out = model.apply(variables, seq, spk)
    assert cls_out.shape == (2, 10) and reg_out.shape == (2, 10)


def test_calc_freq_gating():
    cls_p = jnp.array([[1.0, -1.0]])
    reg_p = jnp.array([[0.5, 0.5]])
    spk = jnp.array([[0]])
    mean = jnp.array([100.0])
    std = jnp.array([10.0])
    out = np.asarray(calc_freq(cls_p, reg_p, spk, mean, std))
    np.testing.assert_allclose(out, [[105.0, 0.0]])
    out_norm = np.asarray(calc_freq(cls_p, reg_p, spk, mean, std, norm=True))
    np.testing.assert_allclose(out_norm, [[0.5, 0.0]])


def test_generator_upsamples_320x():
    h = _small_vocoder_config()
    model = Generator(h)
    x = jnp.zeros((1, 7, h.model_in_dim))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 7 * 320)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh output


def test_code_generator_end_to_end_shapes():
    h = _small_vocoder_config()
    model = CodeGenerator(h)
    code = jnp.zeros((2, 7), jnp.int32)
    f0 = jnp.zeros((2, 7, 1))
    spkr = jnp.zeros((2, 1), jnp.int32)
    variables = model.init(jax.random.key(0), code, f0, spkr)
    y = model.apply(variables, code, f0, spkr)
    assert y.shape == (2, 7 * 320)


def test_code_generator_f0_rate_mismatch_upsamples_code():
    h = _small_vocoder_config()
    model = CodeGenerator(h)
    code = jnp.zeros((1, 7), jnp.int32)
    f0 = jnp.zeros((1, 28, 1))  # 4x finer (the reference's 200 Hz YAAPT case)
    spkr = jnp.zeros((1, 1), jnp.int32)
    variables = model.init(jax.random.key(0), code, f0, spkr)
    y = model.apply(variables, code, f0, spkr)
    assert y.shape == (1, 28 * 320)


def test_mpd_msd_output_structure():
    y = jnp.zeros((2, 8960))
    y_hat = jnp.zeros((2, 8960))
    mpd = MultiPeriodDiscriminator()
    vars_p = mpd.init(jax.random.key(0), y, y_hat)
    rs, gs, fr, fg = mpd.apply(vars_p, y, y_hat)
    assert len(rs) == len(gs) == 5
    assert all(len(f) == 6 for f in fr)

    msd = MultiScaleDiscriminator()
    vars_s = msd.init(jax.random.key(0), y, y_hat)
    rs, gs, fr, fg = msd.apply(vars_s, y, y_hat)
    assert len(rs) == 3
    assert all(len(f) == 8 for f in fr)


def test_msd_spectral_norm_state_updates():
    y = jnp.ones((1, 4096)) * 0.1
    msd = MultiScaleDiscriminator()
    variables = msd.init(jax.random.key(0), y, y)
    assert "spectral" in variables
    _, new_state = msd.apply(variables, y, y, True, mutable=["spectral"])
    u_old = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u_new = jax.tree_util.tree_leaves(new_state["spectral"])[0]
    assert not np.allclose(np.asarray(u_old), np.asarray(u_new))


def test_mpd_folded_matches_2d_path(rng):
    """DiscriminatorP's batch-folded 1D layout == the literal 2D conv path."""
    from dissc_tpu.models.discriminators import DiscriminatorP

    y = jnp.asarray(rng.standard_normal((2, 1337)).astype(np.float32) * 0.3)
    d2d = DiscriminatorP(period=3, fold_to_batch=False)
    d1d = DiscriminatorP(period=3, fold_to_batch=True)
    variables = d2d.init(jax.random.key(0), y)
    s2, f2 = d2d.apply(variables, y)
    s1, f1 = d1d.apply(variables, y)  # same param tree
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-5)
    assert len(f1) == len(f2)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
