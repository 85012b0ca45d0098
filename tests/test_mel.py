"""Mel-spectrogram parity: our JAX chain vs the reference's torch chain."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dissc_tpu.audio.mel import mel_filterbank, mel_spectrogram, stft_magnitude


def _reference_mel_torch(y, n_fft=1024, num_mels=80, sr=16000, hop=256, win=1024,
                         fmin=0, fmax=8000):
    """Reference semantics (sr/dataset.py:46-69) re-stated with torch ops,
    using our filterbank (validated separately against transformers')."""
    y = torch.tensor(y)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    spec = torch.sqrt(spec.abs().pow(2) + 1e-9)
    mel = torch.tensor(mel_filterbank(sr, n_fft, num_mels, fmin, fmax))
    out = torch.matmul(mel, spec)
    return torch.log(torch.clamp(out, min=1e-5)).numpy()


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=513,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns [freq, mel]
    ours = mel_filterbank(16000, 1024, 80, 0, 8000)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_stft_matches_torch(rng):
    y = rng.standard_normal((2, 8960)).astype(np.float32) * 0.5
    ref = torch.stft(
        torch.tensor(y), 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=False, onesided=True,
        return_complex=True,
    )
    ref_mag = torch.sqrt(ref.abs().pow(2) + 1e-9).numpy()
    for use_matmul, atol in ((False, 2e-4), (True, 5e-3)):
        ours = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024, use_matmul=use_matmul))
        # matmul path carries f32-accumulation error on large-magnitude
        # bins; what matters is the log-mel domain (next test, <1e-3).
        np.testing.assert_allclose(ours, ref_mag, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("use_matmul", [False, True])
def test_mel_spectrogram_matches_reference_chain(rng, use_matmul):
    y = (rng.standard_normal((2, 8960)).astype(np.float32) * 0.3).clip(-1, 1)
    ref = _reference_mel_torch(y)
    ours = np.asarray(mel_spectrogram(jnp.asarray(y), use_matmul=use_matmul))
    assert ours.shape == ref.shape == (2, 80, 35)
    # log-domain agreement well under the 0.5 dB end-to-end budget
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_mel_frame_count_is_hop_aligned(rng):
    # T/hop frames for T % hop == 0 (code frames upsample 320/256-aligned)
    y = jnp.asarray(rng.standard_normal((1, 2560)).astype(np.float32))
    out = mel_spectrogram(y)
    assert out.shape == (1, 80, 10)
