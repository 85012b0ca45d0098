"""Native C++ WAV loader vs the Python reference path."""
import numpy as np
import pytest

from dissc_tpu.core.wav import normalize_audio_int16, read_wav, write_wav
from dissc_tpu.data import native_loader


@pytest.fixture
def wav_files(tmp_path, rng):
    paths = []
    for i in range(3):
        data = (rng.standard_normal(4000 + i * 500) * 8000).astype(np.int16)
        p = str(tmp_path / f"s{i}.wav")
        with_open = p
        import wave

        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        paths.append((p, data))
    return paths


def test_native_builds():
    assert native_loader.native_available(), "g++ build of libwavloader.so failed"


def test_wav_info(wav_files):
    for p, data in wav_files:
        sr, n = native_loader.wav_info(p)
        assert sr == 16000 and n == len(data)


def test_load_normalized_matches_python(wav_files):
    for p, data in wav_files:
        ours, sr = native_loader.load_normalized(p)
        ref = normalize_audio_int16(data)
        assert sr == 16000
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        assert abs(np.abs(ours).max() - 0.95) < 1e-5


def test_load_crops_tiling(wav_files):
    paths = [p for p, _ in wav_files]
    starts = [100, 0, 3900]
    crop = 1000
    out = native_loader.load_crops(paths, starts, crop)
    assert out.shape == (3, crop)
    for i, (p, data) in enumerate(wav_files):
        ref = normalize_audio_int16(data)
        idx = (starts[i] + np.arange(crop)) % len(ref)
        np.testing.assert_allclose(out[i], ref[idx], atol=1e-6)
