"""Log-mel spectrogram, bit-matching the reference's torch/librosa chain.

Reference ``sr/dataset.py:46-104``: reflect-pad (n_fft-hop)/2, hann
window (periodic), ``torch.stft(center=False)``, magnitude
``sqrt(re^2+im^2+1e-9)``, slaney-scale/slaney-norm librosa mel basis,
then ``log(clamp(x, 1e-5))``.  This is both the training mel-loss target
and the validation metric, so numerics matter.

TPU-first implementation notes:
  * Framing uses a reshape + 4 shifted slices (hop divides n_fft), not a
    gather — XLA fuses it with the window multiply.
  * The DFT can run either through ``jnp.fft.rfft`` or as two real
    matmuls against precomputed DFT bases (``use_matmul=True``) — the
    matmul form runs on the MXU and is the fast path on TPU for the
    short 1024-point transforms used here.
  * The mel projection is a single [freq, mel] matmul.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible: slaney scale, slaney norm)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    mels = f / (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-10)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe_f / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    freqs = m * (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sampling_rate: int, n_fft: int, num_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """[num_mels, n_fft//2+1] triangular filterbank, slaney-normalised.

    Equivalent to ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)``
    with the library defaults (htk=False, norm='slaney') used by the
    reference at ``sr/dataset.py:54``.
    """
    if fmax is None:
        fmax = sampling_rate / 2.0
    fftfreqs = np.linspace(0, sampling_rate / 2.0, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), num_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : num_mels + 2] - mel_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def _frame(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[B, T] -> [B, F, n_fft] frames at stride ``hop`` (center=False).

    When hop divides n_fft the frames are built from ``n_fft//hop``
    shifted views of a [B, T/hop, hop] reshape — pure data movement that
    XLA folds into the consumer.
    """
    b, t = y.shape
    n_frames = 1 + (t - n_fft) // hop
    if n_fft % hop == 0:
        r = n_fft // hop
        blocks = y[:, : (t // hop) * hop].reshape(b, -1, hop)
        parts = [blocks[:, i : i + n_frames, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[:, idx]


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int) -> tuple:
    """Real/imag DFT bases [n_fft, n_fft//2+1] for the matmul STFT path."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop: int,
    win_size: int,
    use_matmul: bool = True,
    eps: float = 1e-9,
) -> jax.Array:
    """[B, T] -> [B, freq, F] magnitude spectrogram, torch.stft semantics.

    Periodic hann window, center=False, onesided, magnitude with the
    reference's ``sqrt(.^2 + 1e-9)`` floor (``sr/dataset.py:61-64``).
    """
    window = np.hanning(win_size + 1)[:-1].astype(np.float32)  # periodic hann
    if win_size < n_fft:  # torch.stft centre-pads the window to n_fft
        lpad = (n_fft - win_size) // 2
        window = np.pad(window, (lpad, n_fft - win_size - lpad))
    frames = _frame(y, n_fft, hop) * jnp.asarray(window)  # [B, F, n_fft]
    if use_matmul:
        cos_b, sin_b = _dft_bases(n_fft)
        # HIGHEST precision: the DFT must not run through bf16 MXU passes
        # or the mel-loss target drifts from the reference numerics.
        re = jnp.matmul(frames, jnp.asarray(cos_b), precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, jnp.asarray(sin_b), precision=jax.lax.Precision.HIGHEST)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        re, im = spec.real, spec.imag
    mag = jnp.sqrt(re * re + im * im + eps)  # [B, F, freq]
    return mag.transpose(0, 2, 1)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 16000,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0,
    fmax: Optional[float] = 8000,
    use_matmul: bool = True,
) -> jax.Array:
    """[B, T] waveform -> [B, num_mels, T/hop] log-mel, reference-exact.

    Matches ``sr/dataset.py:46-69`` (mel_spectrogram + spectral
    normalisation): reflect pad, magnitude STFT, mel projection,
    ``log(clamp(., 1e-5))``.
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    mag = stft_magnitude(y, n_fft, hop_size, win_size, use_matmul=use_matmul)
    mel = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    melspec = jnp.einsum("mf,bft->bmt", mel, mag, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(melspec, min=1e-5))
