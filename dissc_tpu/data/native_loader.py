"""ctypes binding for the native C++ WAV/crop loader (``native/wavloader.cc``).

Builds the shared library on first use (g++, cached next to the
source); every entry point has a pure-numpy fallback so the framework
runs without a compiler.  The batch crop loader replaces python-side
per-file reads with one threaded C++ call — the TPU-side equivalent of
the reference's DataLoader worker processes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "wavloader.cc")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavloader.so")

_lib = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB_PATH, _SRC, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_long)]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_load_normalized.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_load_normalized.restype = ctypes.c_long
        lib.wav_load_crops.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.wav_load_crops.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def wav_info(path: str) -> Tuple[int, int]:
    """(sample_rate, n_samples) without decoding the payload."""
    lib = _get_lib()
    if lib is not None:
        sr = ctypes.c_int()
        n = ctypes.c_long()
        if lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(n)) == 0:
            return sr.value, n.value
    from dissc_tpu.core.wav import read_wav

    data, sr = read_wav(path, dtype="int16")
    return sr, len(data)


def load_normalized(path: str) -> Tuple[np.ndarray, int]:
    """Full waveform with the training amplitude convention applied."""
    lib = _get_lib()
    if lib is not None:
        _, n = wav_info(path)
        out = np.empty(n, np.float32)
        sr = ctypes.c_int()
        got = lib.wav_load_normalized(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, ctypes.byref(sr),
        )
        if got >= 0:
            return out[:got], sr.value
    from dissc_tpu.core.wav import normalize_audio_int16, read_wav

    data, sr = read_wav(path, dtype="int16")
    return normalize_audio_int16(data).astype(np.float32), sr


def load_crops(paths: Sequence[str], starts: Sequence[int], crop_len: int,
               eff_lens: Optional[Sequence[int]] = None,
               n_threads: int = 8) -> np.ndarray:
    """[len(paths), crop_len] float batch of normalised crops, wrapping
    modulo ``eff_lens[i]`` (code-aligned trim; <=0 = full file)."""
    lib = _get_lib()
    n = len(paths)
    out = np.empty((n, crop_len), np.float32)
    eff = list(eff_lens) if eff_lens is not None else [-1] * n
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        c_starts = (ctypes.c_long * n)(*[int(s) for s in starts])
        c_lens = (ctypes.c_long * n)(*[int(v) for v in eff])
        n_failed = lib.wav_load_crops(
            c_paths, n, c_starts, c_lens, crop_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
        )
        if n_failed:
            # the C++ side zero-fills failed rows; identify and report them
            # instead of silently training on silence
            bad = []
            for p in paths:
                try:
                    if not os.path.exists(p) or wav_info(p)[1] <= 0:
                        bad.append(p)
                except Exception:
                    bad.append(p)
            raise IOError(
                f"native crop loader: {n_failed}/{n} wav files failed to "
                f"decode (unreadable or non-PCM16): {bad[:8]}"
            )
        return out
    for i, (p, s) in enumerate(zip(paths, starts)):
        wav, _ = load_normalized(p)
        if eff[i] > 0:
            wav = wav[: eff[i]]
        if wav.size == 0:
            out[i] = 0.0
            continue
        idx = (int(s) + np.arange(crop_len)) % wav.size
        out[i] = wav[idx]
    return out
