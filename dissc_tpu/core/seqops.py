"""Unit-sequence operations.

The reference pipeline is built around three dynamic-shape operations
(reference: ``dataset/utils.py:14-16``, ``infer.py:32,158-172``,
``utils.py:39-52``):

  * run-length dedup of a unit sequence  ("rhythm" representation),
  * ``repeat_interleave`` of units by predicted durations (re-timing),
  * carryover rounding of fractional durations.

On TPU, data-dependent output shapes cannot live inside a jitted
program, so every op here comes in two flavours:

  * a **host** flavour (numpy, exact reference semantics) used by the
    offline data-prep layer, and
  * a **device** flavour (``*_padded``) that works on fixed-*capacity*
    buffers with explicit lengths/masks and is fully jittable — this is
    what inference and training use so that the whole conversion runs
    as one XLA program.
"""
from __future__ import annotations

from itertools import groupby
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host-side (numpy) reference-exact ops
# ---------------------------------------------------------------------------


def dedup_seq(seq: Sequence[int]) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Run-length encode ``seq`` -> (unique values, run lengths).

    Matches reference ``dataset/utils.py:14-16``.
    """
    vals, counts = zip(*[(k, sum(1 for _ in g)) for k, g in groupby(seq)])
    return vals, counts


def interp(vals: Sequence[float], target_len: int) -> np.ndarray:
    """Nearest-neighbour resample of ``vals`` to ``target_len`` points.

    Matches reference ``utils.py:39-45`` (scipy interp1d, kind='nearest',
    fill_value=0, over a unit grid).
    """
    from scipy.interpolate import interp1d

    cur_len = len(vals)
    if cur_len == 1:
        # Type-dependent on purpose, exactly as the reference: a list is
        # *repeated* target_len times (the morph_seq_len path), while an
        # ndarray is *scalar-multiplied* into a length-1 array that then
        # broadcasts (the eval aligned_ffe path).  Both behaviors are
        # load-bearing for numeric parity with eval.py.
        return np.array(target_len * vals)
    if target_len == cur_len:
        return np.array(vals)
    f = interp1d(
        np.linspace(0.0, 1.0, cur_len), vals, bounds_error=False, kind="nearest", fill_value=0
    )
    return f(np.linspace(0.0, 1.0, target_len))


def morph_seq_len(units: np.ndarray, pitch: np.ndarray, t_lens: np.ndarray) -> np.ndarray:
    """Re-time a pitch contour to new per-run lengths.

    For each run of identical units, nearest-resample that run's pitch
    values to the new target length.  Matches reference ``utils.py:47-52``
    (the heuristic pitch path of ``infer.py`` when no pitch model is used).
    """
    out = []
    for i, (_, g) in enumerate(groupby(zip(units, pitch), key=lambda x: x[0])):
        out.append(interp([f for _, f in g], int(t_lens[i])))
    return np.concatenate(out)


def repeat_interleave_host(vals: Sequence[int], lens: Sequence[int]) -> np.ndarray:
    """Expand run-length encoding back to a flat sequence (numpy)."""
    return np.repeat(np.asarray(vals), np.asarray(lens))


# ---------------------------------------------------------------------------
# Device-side (jittable, static-capacity) ops
# ---------------------------------------------------------------------------


def dedup_padded(
    seq: jax.Array, length: jax.Array, capacity: int, pad_val: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run-length encode a padded sequence into fixed-capacity buffers.

    Args:
      seq: ``[T]`` int array; only the first ``length`` entries are valid.
      length: scalar int, number of valid entries.
      capacity: static maximum number of runs (typically ``T``).
      pad_val: value used to fill unused output slots.

    Returns:
      ``(vals[capacity], counts[capacity], n_runs)`` — ``counts`` is 0 and
      ``vals`` is ``pad_val`` beyond ``n_runs``.
    """
    T = seq.shape[0]
    idx = jnp.arange(T)
    valid = idx < length
    prev = jnp.concatenate([seq[:1] - 1, seq[:-1]])  # force a boundary at t=0
    is_new = (seq != prev) & valid
    run_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    run_id = jnp.where(valid, run_id, capacity)  # pads -> overflow bin
    counts = jax.ops.segment_sum(
        jnp.ones((T,), jnp.int32), run_id, num_segments=capacity + 1
    )[:capacity]
    vals = jnp.full((capacity + 1,), pad_val, dtype=seq.dtype)
    vals = vals.at[jnp.where(is_new, run_id, capacity)].set(jnp.where(is_new, seq, pad_val))
    n_runs = is_new.sum()
    return vals[:capacity], counts, n_runs


def repeat_interleave_padded(
    vals: jax.Array, lens: jax.Array, capacity: int, pad_val: int
) -> Tuple[jax.Array, jax.Array]:
    """``repeat_interleave`` with a static output capacity.

    Replaces the dynamic-output-shape ``torch.repeat_interleave`` of
    reference ``infer.py:32``.  Output position ``j`` takes the value of
    the run whose cumulative-length interval contains ``j`` (a
    ``searchsorted`` gather — O(T log C), fully vectorised on the VPU).

    Args:
      vals: ``[C]`` run values.
      lens: ``[C]`` non-negative run lengths (0 for padded runs).
      capacity: static output length.
      pad_val: fill for positions beyond the total length.

    Returns:
      ``(out[capacity], total_len)``.
    """
    ends = jnp.cumsum(lens)
    total = ends[-1] if lens.shape[0] > 0 else jnp.int32(0)
    j = jnp.arange(capacity)
    seg = jnp.searchsorted(ends, j, side="right")
    seg = jnp.clip(seg, 0, max(vals.shape[0] - 1, 0))
    out = jnp.where(j < total, vals[seg], pad_val)
    return out, total


def len_carryover_correction(lens: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Round predicted (float) durations to ints without length bias.

    Rounds each duration to ``round(clamp(len, 1))`` and carries the
    fractional residual forward, emitting a +/-1 correction whenever the
    running residual crosses +/-1 — so the *total* sequence length stays
    unbiased.  Matches reference ``infer.py:158-172`` exactly (including
    round-half-to-even), expressed as a ``lax.scan``.

    Args:
      lens: ``[C]`` float predicted durations.
      mask: optional ``[C]`` bool; padded entries contribute no residual
        and return length 0.

    Returns:
      ``[C]`` int32 corrected durations (0 where masked).
    """
    base = jnp.round(jnp.clip(lens, min=1.0))
    resid = lens - base
    if mask is not None:
        resid = jnp.where(mask, resid, 0.0)

    def step(total, r):
        total = total + r
        corr = jnp.where(total >= 1.0, 1, jnp.where(total <= -1.0, -1, 0))
        total = total - corr
        return total, corr

    _, corrs = jax.lax.scan(step, jnp.zeros((), lens.dtype), resid)
    out = base.astype(jnp.int32) + corrs
    if mask is not None:
        out = jnp.where(mask, out, 0)
    return out


def nearest_upsample(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-repeat upsampling along the time axis (..., T, C) -> (..., T*factor, C).

    TPU-native equivalent of reference ``sr/models.py:158-177``
    (``CodeGenerator._upsample``), which repeats each conditioning frame
    ``factor`` times.  Implemented as a reshape-broadcast so XLA fuses it
    into the consumer.
    """
    if factor == 1:
        return x
    *lead, t, c = x.shape
    y = jnp.broadcast_to(x[..., :, None, :], (*lead, t, factor, c))
    return y.reshape(*lead, t * factor, c)
