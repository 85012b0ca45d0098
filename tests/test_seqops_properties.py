"""Property/invariant tests for the capacity-padded sequence ops.

The golden-value tests (test_seqops.py) pin specific reference
behaviours; these sweep randomized inputs and assert the algebraic
invariants that every downstream stage relies on:

  * dedup ∘ repeat_interleave == identity on valid prefixes
  * repeat_interleave ∘ dedup reconstructs the original sequence
  * run counts sum to the sequence length; runs are maximal
  * carryover rounding preserves total length within 1 frame and every
    emitted duration is >= 1 (reference infer.py:158-172 semantics)
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from dissc_tpu.core.seqops import (  # noqa: E402
    dedup_padded,
    dedup_seq,
    len_carryover_correction,
    repeat_interleave_host,
    repeat_interleave_padded,
)


def _random_padded_seq(rng, T, n_tokens=100, pad_val=100):
    length = int(rng.integers(1, T + 1))
    # draw run-structured content (repeats are the interesting case)
    seq = np.full(T, pad_val, np.int32)
    i = 0
    while i < length:
        run = int(rng.integers(1, 5))
        seq[i : min(i + run, length)] = int(rng.integers(0, n_tokens))
        i += run
    return seq, length


@pytest.mark.fast
def test_dedup_roundtrip_random():
    rng = np.random.default_rng(0)
    T = 64
    for trial in range(50):
        seq, length = _random_padded_seq(rng, T)
        vals, counts, n_runs = map(
            np.asarray, dedup_padded(jnp.asarray(seq), length, T, 100))
        n_runs = int(n_runs)
        # counts sum to the valid length; padded slots are empty
        assert counts[:n_runs].sum() == length
        assert (counts[n_runs:] == 0).all() and (vals[n_runs:] == 100).all()
        # runs are maximal: no two adjacent runs share a value
        assert (vals[1:n_runs] != vals[: n_runs - 1]).all()
        # matches the host implementation exactly
        h_vals, h_lens = dedup_seq(seq[:length].tolist())
        assert list(h_vals) == vals[:n_runs].tolist()
        assert list(h_lens) == counts[:n_runs].tolist()
        # repeat_interleave inverts it
        out, total = repeat_interleave_padded(
            jnp.asarray(vals), jnp.asarray(counts), T, 100)
        assert int(total) == length
        np.testing.assert_array_equal(np.asarray(out)[:length], seq[:length])
        # and the host repeat agrees
        np.testing.assert_array_equal(
            repeat_interleave_host(vals[:n_runs], counts[:n_runs]), seq[:length])


@pytest.mark.fast
def test_repeat_interleave_truncates_at_capacity():
    vals = jnp.asarray([7, 8, 9], jnp.int32)
    lens = jnp.asarray([4, 4, 4], jnp.int32)
    out, total = repeat_interleave_padded(vals, lens, 8, 100)
    assert int(total) == 12  # true total reported even beyond capacity
    np.testing.assert_array_equal(np.asarray(out), [7, 7, 7, 7, 8, 8, 8, 8])


@pytest.mark.fast
def test_carryover_total_unbiased_random():
    rng = np.random.default_rng(1)
    for trial in range(50):
        C = int(rng.integers(2, 40))
        lens = rng.uniform(0.2, 6.0, C).astype(np.float32)
        out = np.asarray(len_carryover_correction(jnp.asarray(lens)))
        # every duration at least 1 (clamp semantics)... up to a -1
        # carryover correction on a length-1 run, matching the reference
        # exactly, which can emit 0 when the running residual underflows
        assert (out >= 0).all()
        # total length unbiased: the residual is tracked against the RAW
        # predictions (reference infer.py:161-170), so the emitted total
        # stays within one frame of sum(lens) — clamping never
        # accumulates bias because its deficit rides the carryover
        assert abs(out.sum() - lens.sum()) <= 1.0 + 1e-4
        # integer result
        assert out.dtype == np.int32


@pytest.mark.fast
def test_carryover_masked_entries_silent():
    lens = jnp.asarray([2.4, 2.4, 2.4, 2.4], jnp.float32)
    mask = jnp.asarray([True, True, False, False])
    out = np.asarray(len_carryover_correction(lens, mask))
    assert (out[2:] == 0).all()
    # masked tail must not absorb or emit residual: prefix matches the
    # unmasked 2-element case
    out2 = np.asarray(len_carryover_correction(lens[:2]))
    np.testing.assert_array_equal(out[:2], out2)


@pytest.mark.fast
def test_dedup_constant_and_alternating_extremes():
    T = 32
    const = jnp.full((T,), 5, jnp.int32)
    vals, counts, n = dedup_padded(const, T, T, 100)
    assert int(n) == 1 and int(counts[0]) == T and int(vals[0]) == 5
    alt = jnp.asarray([i % 2 for i in range(T)], jnp.int32)
    vals, counts, n = dedup_padded(alt, T, T, 100)
    assert int(n) == T and (np.asarray(counts) == 1).all()
