"""torchaudio stub: ``load`` with torchaudio's normalize-to-float semantics.

Covers the reference call sites eval.py:81-82, eval_sv.py:12 and
scripts/convert_eval.py:118.
"""
import numpy as np
import torch

from dissc_tpu.core.wav import read_audio, write_wav


def load(path, channels_first=True, normalize=True):
    data, sr = read_audio(str(path), dtype="int16")
    if normalize:
        wav = torch.from_numpy(data.astype(np.float32) / 32768.0)
    else:
        wav = torch.from_numpy(data.astype(np.int16))
    wav = wav.reshape(1, -1) if channels_first else wav.reshape(-1, 1)
    return wav, sr


def save(path, src, sample_rate, channels_first=True, **kwargs):
    wav = src.detach().cpu().numpy()
    wav = wav.reshape(-1) if channels_first else wav.reshape(-1)
    wav = np.clip(wav, -1.0, 1.0)
    write_wav(str(path), (wav * 32767.0).astype(np.int16), sample_rate)
