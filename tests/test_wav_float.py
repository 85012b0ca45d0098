"""IEEE-float WAV reading (format tag 3) in the native reader.

``scipy.io.wavfile.write`` emits format-3 WAVs for float arrays — the
reference's ``sr/inference.py:24`` writes its outputs through scipy, so
the A/B harness (and any user feeding scipy-written audio) needs
``read_wav`` to accept them; the stdlib ``wave`` module rejects the tag.
"""
import numpy as np
import pytest

from dissc_tpu.core.wav import read_wav, write_wav

pytestmark = pytest.mark.fast

sw = pytest.importorskip("scipy.io.wavfile")


@pytest.fixture()
def tone():
    return (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)


def test_float32_wav_roundtrip(tmp_path, tone):
    p = str(tmp_path / "f32.wav")
    sw.write(p, 16000, tone)
    y, sr = read_wav(p, dtype="float32")
    assert sr == 16000
    np.testing.assert_array_equal(y, tone)


def test_float_wav_int16_view(tmp_path, tone):
    p = str(tmp_path / "f32.wav")
    sw.write(p, 16000, tone)
    yi, _ = read_wav(p, dtype="int16")
    assert yi.dtype == np.int16
    np.testing.assert_allclose(yi / 32768.0, tone, atol=1 / 32768.0)


def test_float64_and_stereo(tmp_path, tone):
    p = str(tmp_path / "f64s.wav")
    sw.write(p, 16000, np.stack([tone.astype(np.float64), -tone.astype(np.float64)], -1))
    y, _ = read_wav(p, dtype="float32")  # stereo -> mono mean
    np.testing.assert_allclose(y, 0.0, atol=1e-7)


def test_pcm_path_unchanged(tmp_path, tone):
    p = str(tmp_path / "i16.wav")
    write_wav(p, tone, 16000)
    y, sr = read_wav(p, dtype="float32")
    assert sr == 16000
    np.testing.assert_allclose(y, tone, atol=1 / 32767.0)


def test_corrupt_pcm_raises_wave_error(tmp_path, tone):
    """A damaged int16 PCM file must surface the wave-module error, not a
    misleading 'unsupported WAV format tag 1' from the float fallback
    (ADVICE r4)."""
    import wave

    p = str(tmp_path / "ok.wav")
    write_wav(p, tone, 16000)
    raw = bytearray(open(p, "rb").read())
    # corrupt bits-per-sample to 0 so wave.open raises wave.Error ("bad
    # sample width") while the RIFF walker still sees format tag 1
    i = raw.find(b"fmt ")
    raw[i + 8 + 14:i + 8 + 16] = (0).to_bytes(2, "little")
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(wave.Error):
        read_wav(bad)


def test_missing_fmt_chunk_clean_error(tmp_path):
    """data chunk with no preceding fmt chunk -> clean ValueError, not an
    opaque TypeError (ADVICE r4)."""
    import struct

    payload = struct.pack("<4sI", b"data", 4) + b"\x00" * 4
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(payload), b"WAVE")
    bad = str(tmp_path / "nofmt.wav")
    open(bad, "wb").write(hdr + payload)
    with pytest.raises(ValueError, match="fmt chunk"):
        read_wav(bad)
