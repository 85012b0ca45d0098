"""soundfile stub: read/write backed by dissc_tpu.core.wav + native FLAC.

The reference loads training audio with ``sf.read(path, dtype='int16')``
(sr/dataset.py:72-74) and only ever reads mono files.
"""
import numpy as np

from dissc_tpu.core.wav import read_audio, write_wav


def read(path, dtype="float64", always_2d=False, **kwargs):
    data, sr = read_audio(str(path), dtype="int16")
    if dtype == "int16":
        out = data.astype(np.int16)
    else:
        out = (data.astype(np.float64) / 32768.0).astype(dtype)
    if always_2d and out.ndim == 1:
        out = out[:, None]
    return out, sr


def write(path, data, samplerate, **kwargs):
    data = np.asarray(data)
    if data.dtype != np.int16:
        data = np.clip(data, -1.0, 1.0)
        data = (data * 32767.0).astype(np.int16)
    write_wav(str(path), data, samplerate)
