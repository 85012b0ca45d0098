"""F0-tracker behaviour tests on synthetic signals with known pitch."""
import numpy as np
import pytest

from dissc_tpu.audio.yaapt import interp_unvoiced, yaapt_f0, yaapt_f0_batch


def _voiced_tone(f0_hz, dur_s=0.5, sr=16000, harmonics=5):
    t = np.arange(int(dur_s * sr)) / sr
    x = sum((0.6 / (h + 1)) * np.sin(2 * np.pi * f0_hz * (h + 1) * t) for h in range(harmonics))
    return x.astype(np.float32)


@pytest.mark.parametrize("f0_true", [110.0, 180.0, 260.0])
def test_constant_pitch_recovered(f0_true):
    x = _voiced_tone(f0_true)
    f0 = yaapt_f0(x, 16000)
    assert f0.shape[0] == len(x) // 80
    voiced = f0[f0 > 0]
    assert voiced.size > 0.7 * f0.size  # mostly voiced
    # median within 5% of the true pitch
    assert abs(np.median(voiced) - f0_true) / f0_true < 0.05


def test_silence_is_unvoiced():
    x = np.zeros(8000, np.float32)
    x[:40] = 1e-4  # tiny click so energy isn't identically 0
    f0 = yaapt_f0(x, 16000)
    assert (f0 == 0).mean() > 0.9


def test_speech_like_voiced_unvoiced_segmentation(rng):
    sr = 16000
    seg_v = _voiced_tone(150.0, 0.3, sr)
    seg_u = (rng.standard_normal(int(0.3 * sr)) * 0.01).astype(np.float32)
    x = np.concatenate([seg_v, seg_u, seg_v])
    f0 = yaapt_f0(x, sr)
    n = len(f0)
    first, mid, last = f0[: n // 3], f0[n // 3 : 2 * n // 3], f0[2 * n // 3 :]
    assert (first > 0).mean() > 0.6
    assert (mid == 0).mean() > 0.5
    assert (last > 0).mean() > 0.6


def test_pitch_ramp_tracks():
    sr = 16000
    t = np.arange(sr) / sr
    f_inst = 120 + 80 * t  # 120 -> 200 Hz over 1 s
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    x = np.sin(phase).astype(np.float32)
    f0 = yaapt_f0(x, sr)
    voiced_idx = np.where(f0 > 0)[0]
    lo = f0[voiced_idx[: len(voiced_idx) // 4]].mean()
    hi = f0[voiced_idx[-len(voiced_idx) // 4 :]].mean()
    assert hi > lo + 40  # rising contour detected


def test_interp_unvoiced():
    f0 = np.array([0.0, 100.0, 0.0, 0.0, 130.0, 0.0])
    out = interp_unvoiced(f0)
    assert out[0] == 100.0  # edge hold
    assert 100.0 < out[2] < 130.0 and 100.0 < out[3] < 130.0
    assert out[5] == 130.0
    f0_interp = yaapt_f0(_voiced_tone(150.0), interp=True)
    assert (f0_interp > 0).all()


def test_batch_shape():
    x = np.stack([_voiced_tone(120.0, 0.2), _voiced_tone(200.0, 0.2)])
    out = yaapt_f0_batch(x)
    assert out.shape == (2, 1, x.shape[1] // 80)


def test_noisy_tone_tracked():
    """Spectral (SHC) channel keeps the track through heavy noise."""
    rng = np.random.default_rng(3)
    x = _voiced_tone(160.0, 0.5) + rng.standard_normal(8000).astype(np.float32) * 0.3
    f0 = yaapt_f0(x, 16000)
    voiced = f0[f0 > 0]
    assert voiced.size > 0.4 * f0.size
    assert abs(np.median(voiced) - 160.0) / 160.0 < 0.08


def test_missing_fundamental():
    """Harmonics 2..5 only (telephone-style) — SHC recovers the true F0."""
    sr, f0_true = 16000, 140.0
    t = np.arange(int(0.5 * sr)) / sr
    x = sum(0.4 / h * np.sin(2 * np.pi * f0_true * h * t) for h in range(2, 6))
    f0 = yaapt_f0(x.astype(np.float32), sr)
    voiced = f0[f0 > 0]
    assert voiced.size > 0.5 * f0.size
    # no octave-up error: median near 140, not 280
    assert abs(np.median(voiced) - f0_true) / f0_true < 0.1
