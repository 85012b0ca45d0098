"""Whisper architecture parity vs transformers' WhisperForConditionalGeneration.

Same methodology as test_hubert.py: no pretrained weights exist in this
sandbox (zero egress), so parity is checked the strong way — build HF's
model with random init, convert its state dict through our converter,
and require near-identical encoder states and teacher-forced logits.
This validates both the architecture and the converter, so the released
openai/whisper-medium.en checkpoint will load correctly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.models.whisper import (
    WhisperConfig,
    config_from_hf,
    convert_hf_state_dict,
    decode_full,
    encode,
    greedy_decode,
    init_params,
    log_mel_spectrogram,
    pad_or_trim,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_hf():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=100,
        num_mel_bins=8,
        d_model=16,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=32,
        decoder_ffn_dim=32,
        max_source_positions=32,
        max_target_positions=16,
        activation_function="gelu",
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
    )
    model = transformers.WhisperForConditionalGeneration(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_encoder_matches_transformers(rng):
    hf, hf_cfg = _tiny_hf()
    cfg = config_from_hf(hf_cfg)
    mel = rng.standard_normal((2, 8, 64)).astype(np.float32)  # [B, mels, F]

    with torch.no_grad():
        ref = hf.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()

    params = convert_hf_state_dict(hf.state_dict(), cfg)
    ours = encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-3)


def test_decoder_logits_match_transformers(rng):
    hf, hf_cfg = _tiny_hf()
    cfg = config_from_hf(hf_cfg)
    mel = rng.standard_normal((2, 8, 64)).astype(np.float32)
    toks = rng.integers(0, 100, (2, 7)).astype(np.int64)

    with torch.no_grad():
        ref = hf(input_features=torch.tensor(mel),
                 decoder_input_ids=torch.tensor(toks)).logits.numpy()

    params = convert_hf_state_dict(hf.state_dict(), cfg)
    enc_out = encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1)))
    ours = decode_full(params, cfg, jnp.asarray(toks.astype(np.int32)), enc_out)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-3)


def test_greedy_cache_path_consistent(rng):
    """The KV-cached greedy scan must agree step-for-step with the full
    (uncached) teacher-forced decoder it was validated against."""
    cfg = WhisperConfig(vocab_size=50, num_mel_bins=8, d_model=16,
                        encoder_layers=2, decoder_layers=2, num_heads=4,
                        ffn_dim=32, max_source_positions=32,
                        max_target_positions=16)
    params = init_params(cfg, jax.random.key(0))
    mel = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    init = jnp.asarray([3, 7], jnp.int32)
    eos = 49
    max_len = 8

    toks = np.asarray(greedy_decode(params, cfg, mel, init, eos, max_len))
    assert toks.shape == (2, max_len)

    enc_out = encode(params, cfg, mel)
    for b_row in range(2):
        seq = list(np.asarray(init))
        for i in range(max_len):
            logits = decode_full(
                params, cfg, jnp.asarray([seq], jnp.int32), enc_out[b_row:b_row + 1])
            nxt = int(jnp.argmax(logits[0, -1]))
            assert nxt == toks[b_row, i], (b_row, i, seq)
            if nxt == eos:
                # after EOS the cached path pads with eos
                assert (toks[b_row, i:] == eos).all()
                break
            seq.append(nxt)


def test_transcriber_plumbing(rng, tmp_path):
    """wav file -> WhisperTranscriber -> text, with a stub tokenizer
    (no real tokenizer files exist in this zero-egress sandbox)."""
    from dissc_tpu.core.wav import write_wav
    from dissc_tpu.models.whisper import WhisperTranscriber

    class StubTok:
        eos_token_id = 49

        def convert_tokens_to_ids(self, tok):
            return {"<|startoftranscript|>": 47, "<|notimestamps|>": 48}[tok]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{int(i)}" for i in ids)

    cfg = WhisperConfig(vocab_size=50, num_mel_bins=80, d_model=16,
                        encoder_layers=2, decoder_layers=2, num_heads=4,
                        ffn_dim=32, max_source_positions=1500,
                        max_target_positions=32)
    params = init_params(cfg, jax.random.key(1))
    tr = WhisperTranscriber(params, cfg, StubTok(), max_len=6)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, wav, 16000)
    text = tr(p)
    assert isinstance(text, str)

    # batched path agrees with the single-file path (same program, B=2)
    wav2 = (rng.standard_normal(6000) * 0.1).astype(np.float32)
    batch = tr.transcribe_batch([wav, wav2])
    assert len(batch) == 2
    assert batch[0] == text


def test_log_mel_matches_hf_feature_extractor(rng):
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]

    ours = np.asarray(log_mel_spectrogram(jnp.asarray(pad_or_trim(wav)[None]))[0])
    assert ours.T.shape == ref.shape
    np.testing.assert_allclose(ours.T, ref, atol=2e-4, rtol=1e-3)
