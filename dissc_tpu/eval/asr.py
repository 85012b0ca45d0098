"""ASR for WER/CER metrics.

The reference loads OpenAI Whisper ``medium.en`` (``eval.py:18,156``).
Transcription here is native-first: :func:`load_whisper` converts a
local HF Whisper checkpoint into the JAX model in
``models/whisper.py`` (scanned layers, KV-cached greedy decode — the
TPU path) and only falls back to the torch/transformers pipeline when
``native=False`` is requested.  This deployment is zero-egress, so all
loaders require local weights; any ``fn(path) -> text`` can also be
injected straight into ``calc_errors``.
"""
from __future__ import annotations

from typing import Callable


def load_whisper_native(model_path: str = "openai/whisper-medium.en",
                        max_len: int = 224) -> Callable[[str], str]:
    """Native JAX Whisper transcriber from a local HF checkpoint dir.

    transformers is used only to read the checkpoint (torch state dict)
    and for the tokenizer string table; the model itself runs as one
    jitted XLA program (``models/whisper.py``).
    """
    try:
        from transformers import WhisperForConditionalGeneration, WhisperTokenizer
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers is required to load Whisper weights") from e

    from dissc_tpu.models.whisper import (
        WhisperTranscriber,
        config_from_hf,
        convert_hf_state_dict,
    )

    try:
        tokenizer = WhisperTokenizer.from_pretrained(model_path, local_files_only=True)
        hf = WhisperForConditionalGeneration.from_pretrained(
            model_path, local_files_only=True)
    except Exception as e:
        raise RuntimeError(
            f"Whisper weights not found at '{model_path}'. Download them on a "
            "connected machine and pass the local directory, or inject a custom "
            "transcribe callable into calc_errors()."
        ) from e
    cfg = config_from_hf(hf.config)
    params = convert_hf_state_dict(hf.state_dict(), cfg)
    del hf
    return WhisperTranscriber(params, cfg, tokenizer, max_len=max_len)


def load_whisper(model_path: str = "openai/whisper-medium.en",
                 device: str = "cpu", native: bool = True) -> Callable[[str], str]:
    """Build ``transcribe(path) -> text`` from a local Whisper checkpoint.

    ``native=True`` (default) returns the JAX engine; ``native=False``
    keeps the torch/transformers generate pipeline (CPU) for A/B
    cross-checks.  Raises a clear error when weights are absent.
    """
    if native:
        return load_whisper_native(model_path)
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
