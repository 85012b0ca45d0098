"""Streaming / chunked long-form vocoder synthesis.

The reference synthesizes whole utterances in one generator call
(``sr/inference.py:172-256``), which for long-form audio (audiobooks,
podcasts) means unbounded activation memory and one giant XLA program
per length.  This module synthesizes arbitrarily long unit sequences as
fixed-size chunks with enough *real* left/right context that the output
is numerically identical to the monolithic forward up to float
tolerance (~2e-6 — differing program shapes can legitimately change XLA
fusion/reduction order; the *math* is exact: the generator is fully
convolutional, so a sample only depends on codes within its receptive
field).

Design:
  * Chunk windows carry ``context`` extra code frames on each interior
    side; the first/last windows are aligned flush with the true signal
    boundary, so the layer-wise zero padding of the chunked program
    matches the monolithic program's exactly — no crossfading, no
    approximation anywhere.
  * Exactly TWO compiled programs regardless of utterance length:
    ``chunk + context`` (boundary) and ``chunk + 2*context`` (interior).
  * Constant device memory: ~``(chunk + 2*context) * 320`` samples of
    activations, independent of utterance length.

The default context is derived from the config's actual receptive field
(:func:`receptive_field_frames`), rounded up to a multiple of 8 for
sublane-friendly shapes.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.models.hifigan import CodeGenerator


def receptive_field_frames(h: VocoderConfig) -> int:
    """One-sided receptive field of the generator, in code frames.

    Accumulates, at each stage's own rate, the 'same'-padded context of
    the pre-conv, the transposed-conv window, every MRF branch (max over
    kernel banks; convs1 dilated + convs2 undilated per ResBlock1 step,
    dilated only for ResBlock2), and the post-conv, then converts to
    code frames (ceil).
    """
    hop = int(np.prod(h.upsample_rates))  # samples per code frame
    rf_samples = 3 * hop  # conv_pre k7 'same' at the code rate
    rate = hop
    for u, k in zip(h.upsample_rates, h.upsample_kernel_sizes):
        # ConvT: output sample depends on ceil((k-1)/2 / u) input frames
        rf_samples += math.ceil((k - 1) / 2 / u) * rate
        rate //= u
        mrf = 0
        for rk, rd in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            half = (rk - 1) // 2
            if h.resblock == "1":
                c = sum(half * d + half for d in rd)
            else:
                c = sum(half * d for d in rd)
            mrf = max(mrf, c)
        rf_samples += mrf * rate
    rf_samples += 3  # conv_post k7 at the sample rate
    return math.ceil(rf_samples / hop)


class StreamingVocoder:
    """Chunked synthesis, numerically matching the monolithic forward."""

    def __init__(self, h: VocoderConfig, gen_params,
                 chunk_frames: int = 512, context_frames: Optional[int] = None,
                 pipeline_depth: int = 2):
        self.h = h
        self.model = CodeGenerator(h)
        self.params = gen_params
        # overlapped dispatch: keep up to this many chunks in flight on
        # the device before fetching the oldest — the host-side copy of
        # chunk i then overlaps the device computing chunk i+1 (jax
        # async dispatch), hiding per-chunk round-trip latency.  1 = the
        # serial dispatch-fetch-dispatch pattern.
        self.pipeline_depth = max(1, pipeline_depth)
        self.hop = int(np.prod(h.upsample_rates))
        rf = receptive_field_frames(h)
        self.context = context_frames if context_frames is not None else ((rf + 7) // 8) * 8
        if self.context < rf:
            raise ValueError(
                f"context_frames={self.context} < receptive field {rf} frames: "
                "chunk boundaries would be audible")
        self.chunk = chunk_frames
        if self.chunk < self.context:
            raise ValueError("chunk_frames must be >= context_frames")
        self._jitted = jax.jit(
            lambda params, code, f0, spkr: self.model.apply(
                {"params": params}, code, f0, spkr))

    def _dispatch(self, code_w: np.ndarray, f0_w: Optional[np.ndarray],
                  spkr: Optional[np.ndarray]):
        """Async-dispatch one window; returns the device array (unfetched)."""
        return self._jitted(self.params, jnp.asarray(code_w[None]),
                            None if f0_w is None else jnp.asarray(f0_w[None]),
                            None if spkr is None else jnp.asarray(spkr[None]))

    def _run(self, code_w: np.ndarray, f0_w: Optional[np.ndarray],
             spkr: Optional[np.ndarray]) -> np.ndarray:
        return np.asarray(self._dispatch(code_w, f0_w, spkr)[0])

    def synthesize(self, code: np.ndarray, f0: Optional[np.ndarray] = None,
                   spkr: Optional[np.ndarray] = None) -> np.ndarray:
        """[T] int codes (+ [Tf,1] f0 at an integer multiple of the code
        rate, + [1] speaker id) -> [T*hop] float waveform.

        Falls back to a single monolithic call when the sequence fits in
        one boundary window.
        """
        code = np.asarray(code, np.int32)
        T = len(code)
        r = 1
        if f0 is not None:
            f0 = np.asarray(f0, np.float32).reshape(-1, 1)
            # real YAAPT contours (frames ~= audio/80) are rarely an exact
            # multiple of the code length — pad with zeros / trim to the
            # nearest multiple, the same tolerance as the bucketed path
            r = max(1, int(round(len(f0) / max(T, 1))))
            if len(f0) != T * r:
                buf = np.zeros((T * r, 1), np.float32)
                n = min(len(f0), T * r)
                buf[:n] = f0[:n]
                f0 = buf
        # when f0 is finer than the code rate, the conditioning (and the
        # output) runs at the f0 rate: r*hop samples per code frame
        # (reference ``sr/models.py:206-211`` upsamples the coarser side)
        eff = r * self.hop
        ch, cx = self.chunk, self.context
        if T < ch + 2 * cx:
            w = self._run(code, f0, spkr)
            return w[: T * eff]

        out = np.empty(T * eff, np.float32)

        # window plan: (code_lo, code_hi, out_lo, out_hi, y_lo, y_hi) with
        # out[out_lo:out_hi] = y[y_lo:y_hi] (sample units)
        # first chunk: window flush with the signal start (zero padding
        # inside the convs == the monolithic program's padding)
        plan = [(0, ch + cx, 0, ch * eff, 0, ch * eff)]
        # interior chunks: full real context both sides
        s = ch
        while s + ch + cx <= T:
            plan.append((s - cx, s + ch + cx, s * eff, (s + ch) * eff,
                         cx * eff, (cx + ch) * eff))
            s += ch
        # tail: an interior-SHAPED window (ch + 2*cx frames — reuses the
        # interior compile) flush with the signal end.  The remaining
        # R = T - s < ch + cx frames keep >= cx frames of real left
        # context inside it, so the tail is exact too.
        if s < T:
            wlen = (ch + 2 * cx) * eff
            plan.append((T - (ch + 2 * cx), T, s * eff, T * eff,
                         wlen - (T - s) * eff, wlen))

        # overlapped dispatch: keep up to pipeline_depth windows in
        # flight; fetching chunk i overlaps the device computing i+1
        pending = []

        def flush_one():
            (o_lo, o_hi, y_lo, y_hi), y_dev = pending.pop(0)
            out[o_lo:o_hi] = np.asarray(y_dev[0])[y_lo:y_hi]

        for (lo, hi, o_lo, o_hi, y_lo, y_hi) in plan:
            y_dev = self._dispatch(
                code[lo:hi], None if f0 is None else f0[lo * r : hi * r], spkr)
            pending.append(((o_lo, o_hi, y_lo, y_hi), y_dev))
            if len(pending) > self.pipeline_depth:
                flush_one()
        while pending:
            flush_one()
        return out
