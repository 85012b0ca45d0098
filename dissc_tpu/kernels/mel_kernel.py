"""Pallas fused log-mel-spectrogram kernel.

The mel loss target is computed every vocoder training step
(``train.vocoder_trainer``) on both the real and generated segment, so
the whole chain — framing, windowing, DFT, magnitude, mel projection,
log — is fused into ONE kernel here: each grid step DMAs its block of
overlapping frames from HBM once (frames overlap by n_fft - hop, so a
blocked DMA with a manual slice is required — BlockSpecs can't express
overlap), runs two MXU matmuls against window-folded DFT bases
([1024, 513] f32, resident in VMEM), the magnitude on the VPU, a third
MXU matmul onto the mel basis, and writes only the [block, 80] log-mel
tile back — the [F, 513] magnitude spectrogram never touches HBM (~6x
less HBM traffic than the unfused chain at hop 256).

Matches ``audio.mel.mel_spectrogram`` numerics (same bases, same
``sqrt(.^2+1e-9)`` floor and ``log(clip(., 1e-5))``), which in turn
bit-matches the reference torch/librosa chain (``sr/dataset.py:46-69``).
Requires ``hop | n_fft`` (the DISSC config: 1024/256).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dissc_tpu.audio.mel import _dft_bases, mel_filterbank

FRAME_BLOCK = 128


@functools.lru_cache(maxsize=8)
def _folded_bases(n_fft: int, win_size: int, sampling_rate: int, num_mels: int,
                  fmin: float, fmax):
    """(window-folded cos, sin [n_fft, n_fft//2+1], mel.T [freq, mels])."""
    window = np.hanning(win_size + 1)[:-1].astype(np.float32)
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        window = np.pad(window, (lpad, n_fft - win_size - lpad))
    cos_b, sin_b = _dft_bases(n_fft)
    mel = mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    return window[:, None] * cos_b, window[:, None] * sin_b, mel.T.copy()


def _mel_kernel(y_hbm, cos_ref, sin_ref, mel_ref, out_ref, scratch, sem, *,
                hop: int, n_fft: int, block: int, rows: int):
    bi = pl.program_id(0)
    fj = pl.program_id(1)
    r = n_fft // hop
    # One sublane-aligned DMA of this block's hop-chunk rows (start
    # fj*block is a multiple of 8; `rows` covers the r-1 overlap frames,
    # rounded up to the sublane tile), then the shifted frame views are
    # built with tpu.roll + offset-0 slices — Mosaic supports neither
    # unaligned DMA row starts nor concat of sublane-offset slices.
    dma = pltpu.make_async_copy(
        y_hbm.at[bi, pl.ds(fj * block, rows), :], scratch, sem
    )
    dma.start()
    dma.wait()

    x = scratch[:]
    # roll takes non-negative shifts: rolling by rows-k == shifting by -k
    frames = jnp.concatenate(
        [(x if k == 0 else pltpu.roll(x, x.shape[0] - k, 0))[:block]
         for k in range(r)], axis=-1
    )
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-9)
    melspec = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.clip(melspec, min=1e-5))[None]


def mel_spectrogram_pallas(
    y: jax.Array,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 16000,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0,
    fmax: Optional[float] = 8000,
    interpret: bool = False,
) -> jax.Array:
    """[B, T] waveform -> [B, num_mels, T/hop] log-mel, fused on-chip."""
    assert n_fft % hop_size == 0 and win_size <= n_fft
    b, t = y.shape
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_size

    # Mosaic must prove fj*block (the DMA row start) divisible by the
    # sublane tiling (8), so the block size itself must be a multiple of 8
    block = min(FRAME_BLOCK, -(-n_frames // 8) * 8)
    n_blocks = -(-n_frames // block)
    r = n_fft // hop_size
    rows = -(-(block + r - 1) // 8) * 8  # sublane-aligned DMA row count
    # pad so every block (incl. the last) has its full row span, then
    # pre-chunk to [B, chunks, hop] for 2D-native DMAs in the kernel
    needed = ((n_blocks - 1) * block + rows) * hop_size
    y = jnp.pad(y, ((0, 0), (0, max(0, needed - y.shape[1]))))
    y = y.reshape(b, -1, hop_size)

    cos_b, sin_b, mel_t = _folded_bases(n_fft, win_size, sampling_rate, num_mels,
                                        fmin, fmax)
    freq = n_fft // 2 + 1

    out = pl.pallas_call(
        functools.partial(_mel_kernel, hop=hop_size, n_fft=n_fft, block=block,
                          rows=rows),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # y stays in HBM; manual DMA
            pl.BlockSpec((n_fft, freq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, freq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((freq, num_mels), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, num_mels), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * block, num_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, hop_size), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(y, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_t))
    return out[:, :n_frames, :].transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def mel_spectrogram_pallas_grad(y, n_fft=1024, num_mels=80, sampling_rate=16000,
                                hop_size=256, win_size=1024, fmin=0.0,
                                fmax=8000.0):
    """Differentiable fused log-mel: Pallas forward, XLA-recompute backward.

    The fused kernel never materialises the [F, 513] magnitudes the
    backward needs, so the VJP re-runs the (numerically identical)
    ``audio.mel`` chain under ``jax.vjp`` — the forward stays fused
    (the hot path: it runs under ``stop_gradient`` once and with grad
    once per train step), the backward pays one XLA recompute.
    """
    return mel_spectrogram_pallas(y, n_fft, num_mels, sampling_rate, hop_size,
                                  win_size, fmin, fmax)


def _mel_grad_fwd(y, n_fft, num_mels, sampling_rate, hop_size, win_size, fmin,
                  fmax):
    out = mel_spectrogram_pallas(y, n_fft, num_mels, sampling_rate, hop_size,
                                 win_size, fmin, fmax)
    return out, y


def _mel_grad_bwd(n_fft, num_mels, sampling_rate, hop_size, win_size, fmin,
                  fmax, y, g):
    from dissc_tpu.audio.mel import mel_spectrogram

    _, vjp = jax.vjp(
        lambda yy: mel_spectrogram(yy, n_fft=n_fft, num_mels=num_mels,
                                   sampling_rate=sampling_rate,
                                   hop_size=hop_size, win_size=win_size,
                                   fmin=fmin, fmax=fmax), y)
    return vjp(g)


mel_spectrogram_pallas_grad.defvjp(_mel_grad_fwd, _mel_grad_bwd)
