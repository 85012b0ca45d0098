"""Whisper ASR wrapper tests (error path + stubbed happy path).

Real Whisper weights are gated by the zero-egress image (like the
reference's external download, ``eval.py:18``), so the happy path runs
through stubbed transformers entry points — exercising load_whisper's
wiring (processor call, generate, decode, resampling) end-to-end.
"""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from dissc_tpu.core.wav import write_wav
from dissc_tpu.eval.asr import load_whisper


def test_missing_checkpoint_raises_actionable_error():
    with pytest.raises(RuntimeError, match="Whisper weights not found"):
        load_whisper("/nonexistent/whisper-dir")


class _StubProcessor:
    def __call__(self, wav, sampling_rate, return_tensors):
        import torch

        assert sampling_rate == 16000
        self.last_len = len(wav)

        class Inputs:
            input_features = torch.from_numpy(
                np.asarray(wav, np.float32)[None])

        return Inputs()

    def batch_decode(self, ids, skip_special_tokens):
        return [f"decoded:{int(ids[0, 0])}"]


class _StubModel:
    def eval(self):
        return self

    def generate(self, input_features):
        import torch

        # derive the "token" from the audio so the test sees real data flow
        return torch.tensor([[int(input_features.shape[-1])]])


def test_happy_path_with_stubbed_transformers(tmp_path, monkeypatch, rng):
    monkeypatch.setattr(
        transformers.WhisperProcessor, "from_pretrained",
        classmethod(lambda cls, path, **kw: _StubProcessor()))
    monkeypatch.setattr(
        transformers.WhisperForConditionalGeneration, "from_pretrained",
        classmethod(lambda cls, path, **kw: _StubModel()))

    # native=False: this test covers the torch/transformers fallback
    # pipeline; the native engine's plumbing is covered in
    # tests/test_whisper.py::test_transcriber_plumbing
    transcribe = load_whisper("/fake/dir", native=False)

    # 16 kHz file passes through unresampled
    p16 = str(tmp_path / "a16.wav")
    write_wav(p16, (rng.standard_normal(16000) * 0.1).astype(np.float32), 16000)
    assert transcribe(p16) == "decoded:16000"

    # 8 kHz file is resampled to 16 kHz before the processor sees it
    p8 = str(tmp_path / "a8.wav")
    write_wav(p8, (rng.standard_normal(4000) * 0.1).astype(np.float32), 8000)
    assert transcribe(p8) == "decoded:8000"
