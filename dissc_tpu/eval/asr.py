"""ASR wrapper for WER/CER metrics.

The reference loads OpenAI Whisper ``medium.en`` (``eval.py:18,156``).
This deployment is zero-egress, so transcription is pluggable: pass any
``fn(path) -> text`` to ``calc_errors``; :func:`load_whisper` builds one
from a *local* transformers Whisper checkpoint directory when available.
"""
from __future__ import annotations

from typing import Callable, Optional


def load_whisper(model_path: str = "openai/whisper-medium.en",
                 device: str = "cpu") -> Callable[[str], str]:
    """Build ``transcribe(path) -> text`` from a local Whisper checkpoint.

    Raises a clear error when the weights are not present locally.
    """
    try:
        from transformers import WhisperForConditionalGeneration, WhisperProcessor
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers is required for Whisper ASR metrics") from e

    try:
        processor = WhisperProcessor.from_pretrained(model_path, local_files_only=True)
        model = WhisperForConditionalGeneration.from_pretrained(model_path,
                                                                local_files_only=True)
    except Exception as e:
        raise RuntimeError(
            f"Whisper weights not found at '{model_path}'. Download them on a "
            "connected machine and pass the local directory, or inject a custom "
            "transcribe callable into calc_errors()."
        ) from e
    model.eval()

    def transcribe(path: str) -> str:
        import torch

        from dissc_tpu.core.wav import read_wav

        wav, sr = read_wav(path, dtype="float32")
        if sr != 16000:
            from dissc_tpu.audio.resample import resample_poly_np

            wav = resample_poly_np(wav, sr, 16000)
        inputs = processor(wav, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(inputs.input_features)
        return processor.batch_decode(ids, skip_special_tokens=True)[0]

    return transcribe
