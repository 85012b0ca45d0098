"""Streaming chunked synthesis: bit-exactness vs the monolithic forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.infer.streaming import StreamingVocoder, receptive_field_frames
from dissc_tpu.models.hifigan import CodeGenerator


def _thin_config(**kw):
    # full-size rates/kernels (the receptive field of the VCTK config)
    # but thin channels so the CPU monolithic reference stays fast
    d = dict(upsample_initial_channel=32, model_in_dim=17, embedding_dim=8,
             num_embeddings=100, multispkr="from_input_file", f0=True)
    d.update(kw)
    return VocoderConfig(**d)


def _make(h, key):
    model = CodeGenerator(h)
    code = jnp.zeros((1, 8), jnp.int32)
    f0 = jnp.zeros((1, 8, 1), jnp.float32)
    spk = jnp.zeros((1, 1), jnp.int32)
    return model, model.init(key, code, f0, spk)["params"]


def test_receptive_field_vctk_config():
    rf = receptive_field_frames(VocoderConfig())
    # hand-computed: conv_pre 3 + ConvT windows + 60-frame MRFs at hops
    # 64/16/4/2/1 + conv_post ~= 6.6k samples ~= 21 code frames
    assert 18 <= rf <= 24, rf


@pytest.mark.parametrize("T", [200, 230, 257])
def test_streaming_matches_monolithic(T):
    # chunk=64, context=rf-derived; T values cover: tail shorter than a
    # chunk (200 -> R=8), tail in the tricky (chunk, chunk+cx) range
    # (230 -> R=38 with cx=24), and an off-grid prime length
    h = _thin_config()
    key = jax.random.key(0)
    model, params = _make(h, key)
    rng = np.random.default_rng(1)

    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T, 1)) * 0.5).astype(np.float32)
    spk = np.array([3], np.int32)

    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0[None], spk[None])[0])
    sv = StreamingVocoder(h, params, chunk_frames=64)
    assert sv.context >= receptive_field_frames(h)
    out = sv.synthesize(code, f0, spk)

    assert out.shape == full.shape
    np.testing.assert_allclose(out, full, atol=2e-6, rtol=0)


def test_streaming_f0_rate_multiple():
    # f0 at 4x the code rate (the 80-sample-hop YAAPT contract)
    h = _thin_config()
    key = jax.random.key(2)
    model, params = _make(h, key)
    rng = np.random.default_rng(3)
    T = 220
    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T * 4, 1)) * 0.5).astype(np.float32)
    spk = np.array([1], np.int32)

    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0[None], spk[None])[0])
    out = StreamingVocoder(h, params, chunk_frames=64).synthesize(code, f0, spk)
    np.testing.assert_allclose(out, full, atol=2e-6, rtol=0)


def test_streaming_short_input_fallback():
    h = _thin_config()
    key = jax.random.key(4)
    model, params = _make(h, key)
    rng = np.random.default_rng(5)
    T = 40  # < chunk + 2*context -> monolithic path
    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T, 1)) * 0.5).astype(np.float32)
    spk = np.array([0], np.int32)
    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0[None], spk[None])[0])
    out = StreamingVocoder(h, params, chunk_frames=64).synthesize(code, f0, spk)
    np.testing.assert_allclose(out, full, atol=2e-6, rtol=0)


def test_streaming_rejects_thin_context():
    h = _thin_config()
    key = jax.random.key(6)
    _, params = _make(h, key)
    with pytest.raises(ValueError):
        StreamingVocoder(h, params, chunk_frames=64, context_frames=4)


def test_streaming_f0_nonmultiple_padded():
    # real YAAPT contours are rarely an exact multiple of the code length;
    # synthesize must pad/trim to the nearest multiple instead of raising
    h = _thin_config()
    key = jax.random.key(8)
    model, params = _make(h, key)
    rng = np.random.default_rng(9)
    T = 220
    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T * 4 - 3, 1)) * 0.5).astype(np.float32)
    spk = np.array([1], np.int32)

    f0_pad = np.zeros((T * 4, 1), np.float32)
    f0_pad[: len(f0)] = f0
    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0_pad[None], spk[None])[0])
    out = StreamingVocoder(h, params, chunk_frames=64).synthesize(code, f0, spk)
    np.testing.assert_allclose(out, full, atol=2e-6, rtol=0)


def test_engine_bucket_path_finer_f0():
    # bucketed (non-streaming) path with f0 at 4x the code rate: the
    # engine must keep the full contour and trim the waveform with the
    # effective rate (len(code)*r*hop), not silently discard 3/4 of it
    from dissc_tpu.infer.streaming import receptive_field_frames
    from dissc_tpu.infer.vocoder import VocoderEngine

    h = _thin_config()
    key = jax.random.key(10)
    model, params = _make(h, key)
    rng = np.random.default_rng(11)
    T = 50
    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T * 4 - 2, 1)) * 0.5).astype(np.float32)
    spk = np.array([2], np.int32)

    f0_pad = np.zeros((T * 4, 1), np.float32)
    f0_pad[: len(f0)] = f0
    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0_pad[None], spk[None])[0])
    eng = VocoderEngine(h, params, frame_buckets=(64, 128))
    wavs, rtf = eng.synthesize_utterances([{"code": code, "f0": f0, "spkr": spk}])
    assert wavs[0].shape == full.shape  # T*4*320 samples, none discarded
    # bucket padding may perturb only the final receptive field of audio
    tail = receptive_field_frames(h) * 4 * 320
    np.testing.assert_allclose(wavs[0][:-tail], full[:-tail], atol=2e-6, rtol=0)

    # exact_lengths mode matches everywhere, including the tail
    eng_exact = VocoderEngine(h, params, frame_buckets=(64, 128),
                              exact_lengths=True)
    wavs, _ = eng_exact.synthesize_utterances([{"code": code, "f0": f0, "spkr": spk}])
    np.testing.assert_allclose(wavs[0], full, atol=2e-6, rtol=0)


def test_engine_exact_lengths_and_folding():
    # exact_lengths=True: per-length program, no padding -> exact tail;
    # weight-norm folding (on by default) must not change numerics
    from dissc_tpu.infer.vocoder import VocoderEngine

    h = _thin_config()
    key = jax.random.key(14)
    model, params = _make(h, key)
    rng = np.random.default_rng(15)
    items, fulls = [], []
    for T in (37, 41, 37):
        code = rng.integers(0, 100, T).astype(np.int32)
        f0 = (rng.standard_normal((T, 1)) * 0.5).astype(np.float32)
        spk = np.array([1], np.int32)
        items.append({"code": code, "f0": f0, "spkr": spk})
        fulls.append(np.asarray(model.apply({"params": params}, code[None],
                                            f0[None], spk[None])[0]))
    eng = VocoderEngine(h, params, frame_buckets=(64,), exact_lengths=True)
    assert eng.h.folded_weights and "conv_pre" in str(jax.tree_util.tree_structure(eng.params))
    wavs, _ = eng.synthesize_utterances(items)
    for wav, full in zip(wavs, fulls):
        assert wav.shape == full.shape
        np.testing.assert_allclose(wav, full, atol=2e-6, rtol=0)

    # folding off gives the same result too
    eng_nf = VocoderEngine(h, params, frame_buckets=(64,), exact_lengths=True,
                           fold_weights=False)
    wavs_nf, _ = eng_nf.synthesize_utterances(items)
    for a, b in zip(wavs, wavs_nf):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_engine_streaming_path_finer_f0():
    # the streaming (long-utterance) path must agree with the bucket path
    # for the same finer-rate item
    from dissc_tpu.infer.vocoder import VocoderEngine

    h = _thin_config()
    key = jax.random.key(12)
    model, params = _make(h, key)
    rng = np.random.default_rng(13)
    T = 200
    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T * 4, 1)) * 0.5).astype(np.float32)
    spk = np.array([0], np.int32)

    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0[None], spk[None])[0])
    eng = VocoderEngine(h, params, frame_buckets=(32, 64), stream_chunk=64)
    wavs, _ = eng.synthesize_utterances([{"code": code, "f0": f0, "spkr": spk}])
    assert wavs[0].shape == full.shape
    np.testing.assert_allclose(wavs[0], full, atol=2e-6, rtol=0)


def test_engine_streams_past_last_bucket():
    # utterances longer than the last bucket go through the streaming
    # path and must match the monolithic forward exactly
    from dissc_tpu.infer.vocoder import VocoderEngine

    h = _thin_config()
    key = jax.random.key(20)
    model, params = _make(h, key)
    rng = np.random.default_rng(21)
    T = 200
    code = rng.integers(0, 100, T).astype(np.int32)
    f0 = (rng.standard_normal((T, 1)) * 0.5).astype(np.float32)
    spk = np.array([2], np.int32)

    full = np.asarray(model.apply({"params": params}, code[None],
                                  f0[None], spk[None])[0])
    eng = VocoderEngine(h, params, frame_buckets=(32, 64), stream_chunk=64)
    wavs, rtf = eng.synthesize_utterances(
        [{"code": code, "f0": f0, "spkr": spk}])
    np.testing.assert_allclose(wavs[0], full, atol=2e-6, rtol=0)
    assert rtf > 0
