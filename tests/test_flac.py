"""Native FLAC decoder round-trip tests (vs the first-party test encoder).

Covers the decode paths used for VCTK ground truth (reference reads FLAC
via torchaudio/soundfile, ``scripts/convert_eval.py:129``): subframe
types, Rice escapes, wasted bits, stereo decorrelation, bit depths.
"""
import numpy as np
import pytest

from flac_ref_encoder import encode_flac

from dissc_tpu.data import flac_native


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    if not flac_native.flac_available():
        pytest.skip("native FLAC decoder failed to build")


def _roundtrip(tmp_path, samples, sr=16000, **kw):
    blob = encode_flac(samples, sr, **kw)
    p = str(tmp_path / "t.flac")
    with open(p, "wb") as f:
        f.write(blob)
    return p


def _speechish(n, seed=0, scale=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = (scale * np.sin(2 * np.pi * 150 * t / 16000)
         + 0.2 * scale * rng.standard_normal(n))
    return np.round(x).astype(np.int64)


def test_info(tmp_path):
    p = _roundtrip(tmp_path, _speechish(5000), sr=48000)
    sr, ch, bits, n = flac_native.flac_info(p)
    assert (sr, ch, bits, n) == (48000, 1, 16, 5000)


@pytest.mark.parametrize("kind", ["verbatim", "constant", "fixed0", "fixed1",
                                  "fixed2", "fixed3", "fixed4", "lpc2"])
def test_mono_subframe_kinds(tmp_path, kind):
    n = 3000
    if kind == "constant":
        x = np.full(n, -123, np.int64)
    else:
        x = _speechish(n, seed=hash(kind) % 100)
    p = _roundtrip(tmp_path, x, kind=kind)
    data, sr = flac_native.read_flac(p, dtype="int32")
    assert sr == 16000
    np.testing.assert_array_equal(data, x)


@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side",
                                    "mid_side"])
def test_stereo_modes(tmp_path, stereo):
    n = 2500
    x = np.stack([_speechish(n, 1), _speechish(n, 2, scale=4000)], axis=1)
    p = _roundtrip(tmp_path, x, stereo=stereo)
    data, _ = flac_native.read_flac(p, dtype="int32")
    np.testing.assert_array_equal(data, x)


def test_rice_escape_partitions(tmp_path):
    x = _speechish(2000, 3, scale=30000)
    p = _roundtrip(tmp_path, x, escape=True)
    data, _ = flac_native.read_flac(p, dtype="int32")
    np.testing.assert_array_equal(data, x)


def test_wasted_bits(tmp_path):
    x = (_speechish(2000, 4) >> 3) << 3  # bottom 3 bits zero
    p = _roundtrip(tmp_path, x, wasted=3)
    data, _ = flac_native.read_flac(p, dtype="int32")
    np.testing.assert_array_equal(data, x)


def test_24bit_and_float_scaling(tmp_path):
    x = (_speechish(2000, 5).astype(np.int64) << 8)
    p = _roundtrip(tmp_path, x, bits=24)
    data, _ = flac_native.read_flac(p, dtype="int32")
    np.testing.assert_array_equal(data, x)
    f, _ = flac_native.read_flac(p, dtype="float32")
    np.testing.assert_allclose(f, x / (1 << 23), atol=1e-7)
    i16, _ = flac_native.read_flac(p, dtype="int16")
    np.testing.assert_array_equal(i16, (x >> 8).astype(np.int16))


def test_multiple_frames_and_tail(tmp_path):
    # non-multiple of block_size -> short last frame
    x = _speechish(1024 * 3 + 321, 6)
    p = _roundtrip(tmp_path, x, block_size=1024)
    data, _ = flac_native.read_flac(p, dtype="int32")
    np.testing.assert_array_equal(data, x)


def test_read_audio_dispatch(tmp_path):
    from dissc_tpu.core.wav import read_audio, write_wav

    x = _speechish(2000, 7)
    p = _roundtrip(tmp_path, x)
    got, sr = read_audio(p, dtype="int16")
    np.testing.assert_array_equal(got, x.astype(np.int16))
    wp = str(tmp_path / "t.wav")
    write_wav(wp, x.astype(np.int16), 16000)
    got2, _ = read_audio(wp, dtype="int16")
    np.testing.assert_array_equal(got2, x.astype(np.int16))
