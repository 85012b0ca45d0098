"""bf16 inference-path numerics: mel distance vs the f32 reference path."""
import numpy as np

import jax
import jax.numpy as jnp

from dissc_tpu.core.config import VocoderConfig


def test_bf16_generator_mel_distance_small(rng):
    from dissc_tpu.audio.mel import mel_spectrogram
    from dissc_tpu.models.hifigan import CodeGenerator

    h32 = VocoderConfig(upsample_initial_channel=64, embedding_dim=16, model_in_dim=33)
    h16 = VocoderConfig(upsample_initial_channel=64, embedding_dim=16, model_in_dim=33,
                        compute_dtype="bfloat16")
    code = jnp.asarray(rng.integers(0, 100, (1, 16)).astype(np.int32))
    f0 = jnp.asarray(rng.normal(0, 1, (1, 16, 1)).astype(np.float32))
    spkr = jnp.zeros((1, 1), jnp.int32)

    m32 = CodeGenerator(h32)
    params = m32.init(jax.random.key(0), code, f0, spkr)["params"]
    y32 = np.asarray(m32.apply({"params": params}, code, f0, spkr))
    y16 = np.asarray(CodeGenerator(h16).apply({"params": params}, code, f0, spkr))

    assert y16.dtype == np.float32  # f32 waveform head
    mel32 = np.asarray(mel_spectrogram(jnp.asarray(y32)))
    mel16 = np.asarray(mel_spectrogram(jnp.asarray(y16)))
    # log-mel L1 well under the 0.5 dB end-to-end budget (ln units: 0.5 dB ~ 0.115)
    assert np.abs(mel32 - mel16).mean() < 0.05
    # waveforms track closely
    assert np.abs(y32 - y16).max() < 0.05
