"""YAAPT-compatible F0 tracker.

The reference extracts F0 with ``amfm_decompy.pYAAPT.yaapt`` (reference
``sr/dataset.py:27-43``, ``eval.py:26-33``; params: frame_length 20 ms,
frame_space 5 ms, nccf_thresh1 0.25, tda_frame_length 25 ms, F0 range
60-400 Hz).  That library is pure-NumPy and unavailable here, so this
module implements the same spectro-temporal pitch-tracking structure
natively, designed TPU-first:

  * bandpass prefilter (FIR 150-1500 Hz) + a squared ("nonlinear")
    signal path, as in YAAPT's preprocessing;
  * NCCF (normalised cross-correlation) candidate generation on both
    paths — computed as one batched einsum over [frames, lags] so the
    whole utterance's correlation hits the MXU at once;
  * per-frame candidate peaks with merits, plus an unvoiced candidate
    gated by the ``nccf_thresh1`` threshold and frame energy;
  * Viterbi smoothing over candidates (octave-jump and voicing-
    transition costs) as a ``lax.scan``;
  * outputs: ``samp_values`` (0 at unvoiced frames) and ``samp_interp``
    (contour linearly interpolated through unvoiced regions), the two
    variants the reference consumes.

Numerics are not bit-identical to pYAAPT (different candidate pruning
and DP weights) but track the same contour on voiced speech; the
interface, framing (5 ms hop after 20 ms/2 two-sided padding) and
voicing semantics match.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F0_MIN = 60.0
F0_MAX = 400.0
NCCF_THRESH = 0.25
N_CANDS = 5


@functools.lru_cache(maxsize=4)
def _bandpass_fir(sr: int, lo: float = 50.0, hi: float = 1500.0, ntaps: int = 151):
    from scipy.signal import firwin

    return firwin(ntaps, [lo, hi], fs=sr, pass_zero=False).astype(np.float32)


def _frames(x: jnp.ndarray, frame_len: int, hop: int, n_frames: int) -> jnp.ndarray:
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[idx]


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "n_frames", "max_lag", "min_lag"))
def _nccf(x: jnp.ndarray, frame_len: int, hop: int, n_frames: int,
          min_lag: int, max_lag: int) -> jnp.ndarray:
    """[F, max_lag-min_lag+1] normalised cross-correlation per frame.

    nccf[t, k] = <x_t[0:N], x_t[k:k+N]> / sqrt(|x_t[0:N]|^2 |x_t[k:k+N]|^2)
    """
    span = frame_len + max_lag
    fr = _frames(x, span, hop, n_frames)  # [F, span]
    base = fr[:, :frame_len]  # [F, N]
    e0 = jnp.sum(base * base, axis=-1, keepdims=True)  # [F, 1]

    # energy of every shifted window via cumsum of squares
    sq = fr * fr
    csum = jnp.concatenate([jnp.zeros((n_frames, 1)), jnp.cumsum(sq, axis=-1)], axis=-1)
    lags = jnp.arange(min_lag, max_lag + 1)
    ek = csum[:, lags + frame_len] - csum[:, lags]  # [F, L]

    # cross terms: one matmul per lag batch — a [F, N] x [N, L] gather-free
    # einsum over a strided view of the frames
    lag_idx = lags[None, :] + jnp.arange(frame_len)[:, None]  # [N, L]
    shifted = fr[:, lag_idx]  # [F, N, L]
    cross = jnp.einsum("fn,fnl->fl", base, shifted,
                       precision=jax.lax.Precision.HIGHEST)
    denom = jnp.sqrt(jnp.maximum(e0 * ek, 1e-12))
    return cross / denom


def _local_max_mask(a: jnp.ndarray) -> jnp.ndarray:
    left = jnp.concatenate([jnp.full_like(a[:, :1], -jnp.inf), a[:, :-1]], axis=1)
    right = jnp.concatenate([a[:, 1:], jnp.full_like(a[:, :1], -jnp.inf)], axis=1)
    return (a >= left) & (a > right)


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_frames",
                                             "frame_len", "n_harm"))
def _shc(x: jnp.ndarray, sr: int, n_fft: int, hop: int, n_frames: int,
         frame_len: int, n_harm: int = 3, wl_hz: float = 40.0):
    """Spectral Harmonics Correlation (YAAPT's spectral pitch channel).

    SHC(t, f) = sum_{f' in +-WL/2} prod_{r=1..NH+1} |S(t, r*f + f')| over
    the magnitude spectrogram of the (squared) signal — peaks at the true
    F0 even when the fundamental is weak, complementing NCCF's
    subharmonic ambiguity.  Returns ([F, n_f0_bins] SHC, f0 bin centres).
    """
    frames = _frames(x, frame_len, hop, n_frames)
    win = jnp.asarray(np.hanning(frame_len).astype(np.float32))
    spec = jnp.abs(jnp.fft.rfft(frames * win, n=n_fft, axis=-1))  # [F, n_fft//2+1]
    df = sr / n_fft
    half_w = max(1, int(wl_hz / 2 / df))
    f0_bins = jnp.arange(int(F0_MIN / df), int(F0_MAX / df) + 1)

    # product over harmonics of windowed sums around r*f0_bin
    csum = jnp.cumsum(spec, axis=-1)
    max_bin = spec.shape[-1] - 1

    def harm_window_sum(r):
        centers = jnp.clip(f0_bins * r, 0, max_bin)
        lo = jnp.clip(centers - half_w, 0, max_bin)
        hi = jnp.clip(centers + half_w, 0, max_bin)
        return csum[:, hi] - jnp.where(lo > 0, csum[:, lo - 1], 0.0)  # [F, B]

    shc = harm_window_sum(1)
    for r in range(2, n_harm + 2):
        shc = shc * harm_window_sum(r)
    # per-frame normalisation to [0, 1]
    shc = shc / jnp.maximum(jnp.max(shc, axis=-1, keepdims=True), 1e-12)
    return shc, f0_bins.astype(jnp.float32) * df


@functools.partial(jax.jit, static_argnames=("sr", "min_lag", "max_lag"))
def _candidates(nccf: jnp.ndarray, sr: int, min_lag: int, max_lag: int):
    """Top-K local-max NCCF peaks per frame -> (f0 candidates, merits).

    A small lag-proportional decay breaks the subharmonic tie of
    periodic signals (NCCF peaks at every multiple of the period are
    equal) in favour of the shortest lag — the same shorter-lag bias
    RAPT/YAAPT apply to their merits.
    """
    lag_axis = jnp.arange(nccf.shape[1]) + min_lag
    decay = 0.08 * lag_axis / max_lag
    peaked = jnp.where(_local_max_mask(nccf), nccf - decay[None, :], -1.0)
    merits, idx = jax.lax.top_k(peaked, N_CANDS)  # [F, K]
    lags = idx + min_lag
    f0 = sr / lags.astype(jnp.float32)
    return f0, merits


@jax.jit
def _viterbi(f0_cands: jnp.ndarray, merits: jnp.ndarray, energy: jnp.ndarray,
             spec_f0: jnp.ndarray, spec_strength: jnp.ndarray,
             voicing_score: jnp.ndarray):
    """DP over [K voiced candidates + 1 unvoiced state] per frame.

    Costs: emission = 1 - merit plus an octave-distance penalty to the
    spectral (SHC) pitch estimate when that estimate is confident —
    YAAPT's combination of temporal and spectral channels; unvoiced
    emission keyed to the per-frame ``voicing_score`` (original-path
    NCCF merit + in-band energy ratio — calibrated on real speech, see
    tests/test_yaapt_real_speech.py) and frame energy; transition =
    octave distance between voiced states, fixed cost for voicing
    flips.  Returns the best path's f0 (0 = unvoiced).
    """
    F, K = f0_cands.shape
    VOICING_COST = 0.35
    TRANS_W = 0.6
    SPEC_W = 0.25
    UV_ALPHA = 0.8   # slope of the unvoiced emission in the score
    UV_T = 1.05      # voicing-score operating point (see module tests)

    energy_db = 10.0 * jnp.log10(energy + 1e-10)
    silent = energy_db < (jnp.max(energy_db) - 35.0)

    voiced_cost = jnp.where(merits > 0, 1.0 - merits, 1e3)  # [F, K]
    # spectral-channel penalty, SELF-VALIDATED: the SHC estimate only
    # counts when it agrees (within ~a semitone) with some NCCF
    # candidate — on pure tones / coarse-resolution frames the SHC peak
    # is spurious and the gate rejects it.
    spec_dist = jnp.abs(
        jnp.log2(jnp.maximum(f0_cands, 1.0))
        - jnp.log2(jnp.maximum(spec_f0, 1.0))[:, None]
    )
    spec_valid = (jnp.min(spec_dist, axis=-1) < 0.08) & (spec_strength > 0.2)
    spec_gate = spec_valid.astype(jnp.float32) * spec_strength
    voiced_cost = voiced_cost + SPEC_W * spec_gate[:, None] * jnp.minimum(spec_dist, 2.0)

    # a confident matching spectral channel is voicing evidence too
    score = voicing_score + 0.15 * spec_gate
    unvoiced_cost = jnp.where(silent, -0.5, UV_ALPHA * (score - UV_T))
    emis = jnp.concatenate([voiced_cost, unvoiced_cost[:, None]], axis=-1)  # [F, K+1]

    log_f0 = jnp.log2(jnp.maximum(f0_cands, 1.0))  # [F, K]

    def step(carry, inp):
        prev_cost, prev_logf = carry  # [K+1], [K]
        emis_t, logf_t = inp  # [K+1], [K]
        # voiced->voiced transition: octave distance
        d = jnp.abs(logf_t[None, :] - prev_logf[:, None])  # [Kprev, Know]
        vv = prev_cost[:K, None] + TRANS_W * d
        uv = prev_cost[K] + VOICING_COST  # unvoiced -> voiced
        to_voiced = jnp.minimum(jnp.min(vv, axis=0), uv)  # [K]
        arg_vv = jnp.argmin(vv, axis=0)
        back_voiced = jnp.where(jnp.min(vv, axis=0) <= uv, arg_vv, K)

        vu = jnp.min(prev_cost[:K]) + VOICING_COST  # voiced -> unvoiced
        uu = prev_cost[K]
        to_unvoiced = jnp.minimum(vu, uu)
        back_unvoiced = jnp.where(vu <= uu, jnp.argmin(prev_cost[:K]), K)

        cost = jnp.concatenate([to_voiced, to_unvoiced[None]]) + emis_t
        back = jnp.concatenate([back_voiced, back_unvoiced[None]])
        return (cost, logf_t), back

    init = (emis[0], log_f0[0])
    (final_cost, _), backs = jax.lax.scan(step, init, (emis[1:], log_f0[1:]))

    # backtrack
    last = jnp.argmin(final_cost)

    def bt(state, back_t):
        prev = back_t[state]
        return prev, state

    _, states_rev = jax.lax.scan(bt, last, backs, reverse=True)
    states = jnp.concatenate([states_rev, last[None]])  # [F]

    f0_ext = jnp.concatenate([f0_cands, jnp.zeros((F, 1))], axis=-1)
    return jnp.take_along_axis(f0_ext, states[:, None], axis=-1)[:, 0]


def yaapt_f0(
    audio: np.ndarray,
    sr: int = 16000,
    interp: bool = False,
    frame_length_ms: float = 20.0,
    frame_space_ms: float = 5.0,
    tda_frame_length_ms: float = 25.0,
) -> np.ndarray:
    """Track F0 of a mono waveform; returns one value per 5 ms frame.

    Mirrors the reference call pattern (``sr/dataset.py:27-43``): the
    input is padded by frame_length/2 on both sides, unvoiced frames are
    0 (or interpolated when ``interp``).  Combines the temporal (NCCF)
    and spectral (SHC on the squared signal, ``tda_frame_length``)
    channels as YAAPT does.
    """
    audio = np.asarray(audio, np.float32).reshape(-1)
    frame_len = int(frame_length_ms / 1000 * sr)
    hop = int(frame_space_ms / 1000 * sr)
    to_pad = frame_len // 2
    x = np.pad(audio, (to_pad, to_pad))

    # two signal paths: bandpassed original + bandpassed squared signal
    fir = _bandpass_fir(sr)
    xf = np.convolve(x, fir, mode="same").astype(np.float32)
    sq = x * x
    xnl = np.convolve(sq - sq.mean(), fir, mode="same").astype(np.float32)

    min_lag = int(sr / F0_MAX)
    max_lag = int(np.ceil(sr / F0_MIN))
    span = frame_len + max_lag
    n_frames = max(1, 1 + (len(x) - span) // hop)

    nccf_a = _nccf(jnp.asarray(xf), frame_len, hop, n_frames, min_lag, max_lag)
    nccf_b = _nccf(jnp.asarray(xnl), frame_len, hop, n_frames, min_lag, max_lag)
    nccf = jnp.maximum(nccf_a, 0.85 * nccf_b)

    f0_cands, merits = _candidates(nccf, sr, min_lag, max_lag)
    frames = _frames(jnp.asarray(xf), frame_len, hop, n_frames)
    energy = jnp.sum(frames * frames, axis=-1)

    # voicing evidence: original-path NCCF merit (the nonlinear path's
    # spurious envelope periodicity on fricatives must not vote here)
    # plus the in-band (50-1500 Hz) to full-band energy ratio — voiced
    # speech concentrates energy in-band, fricatives above it
    merit_orig = jnp.max(nccf_a, axis=-1)
    frames_raw = _frames(jnp.asarray(x), frame_len, hop, n_frames)
    e_full = jnp.sum(frames_raw * frames_raw, axis=-1)
    band_ratio = energy / jnp.maximum(e_full, 1e-12)
    voicing_score = merit_orig + 0.6 * jnp.clip(band_ratio, 0.0, 1.2)

    # spectral channel: SHC peaks over both paths — the original signal
    # covers pure/strong-fundamental frames, the squared signal restores
    # a missing fundamental (sin^2 puts energy at 2f, so alone it would
    # mislead on pure tones)
    tda_len = int(tda_frame_length_ms / 1000 * sr)
    if len(x) >= tda_len + (n_frames - 1) * hop:
        shc_a, f0_axis = _shc(jnp.asarray(xf), sr, 2048, hop, n_frames, tda_len)
        shc_b, _ = _shc(jnp.asarray(xnl), sr, 2048, hop, n_frames, tda_len)
        shc = jnp.maximum(shc_a, shc_b)
        spec_idx = jnp.argmax(shc, axis=-1)
        spec_f0 = f0_axis[spec_idx]
        # confidence: peak sharpness (peak / mean); boundary-bin argmaxes
        # are window-mainlobe artifacts, not pitch — zero them out
        interior = (spec_idx > 1) & (spec_idx < shc.shape[-1] - 2)
        spec_strength = jnp.where(
            interior,
            jnp.clip(
                shc[jnp.arange(n_frames), spec_idx]
                / jnp.maximum(jnp.mean(shc, axis=-1), 1e-9) / 20.0, 0.0, 1.0,
            ),
            0.0,
        )
    else:
        spec_f0 = jnp.zeros((n_frames,))
        spec_strength = jnp.zeros((n_frames,))

    f0 = np.asarray(_viterbi(f0_cands, merits, energy, spec_f0, spec_strength,
                             voicing_score))

    # frame count the reference observes: len(audio)//hop
    target = max(1, int(round(len(audio) / hop)))
    if len(f0) < target:
        f0 = np.pad(f0, (0, target - len(f0)))
    f0 = f0[:target]

    if interp:
        f0 = interp_unvoiced(f0)
    return f0


def interp_unvoiced(f0: np.ndarray) -> np.ndarray:
    """Linear interpolation through unvoiced (0) regions, edges held —
    pYAAPT's ``samp_interp`` behaviour."""
    f0 = np.asarray(f0, np.float64).copy()
    voiced = f0 > 0
    if not voiced.any():
        return f0
    idx = np.arange(len(f0))
    f0[~voiced] = np.interp(idx[~voiced], idx[voiced], f0[voiced])
    return f0


def yaapt_f0_batch(audio: np.ndarray, sr: int = 16000, interp: bool = False) -> np.ndarray:
    """[B, T] -> [B, 1, F] like the reference's ``get_yaapt_f0`` vstack."""
    outs = [yaapt_f0(a, sr, interp)[None, None, :] for a in np.atleast_2d(audio)]
    return np.vstack(outs)
