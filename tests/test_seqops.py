"""Golden-value tests for sequence ops against reference semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from dissc_tpu.core import seqops


def test_dedup_seq_basic():
    vals, counts = seqops.dedup_seq([3, 3, 1, 1, 1, 2, 3, 3])
    assert vals == (3, 1, 2, 3)
    assert counts == (2, 3, 1, 2)


def test_dedup_padded_matches_host(rng):
    for _ in range(20):
        n = int(rng.integers(1, 60))
        seq = rng.integers(0, 5, size=n)
        T = 64
        padded = np.full(T, 100, np.int32)
        padded[:n] = seq
        ref_vals, ref_counts = seqops.dedup_seq(seq.tolist())
        vals, counts, n_runs = seqops.dedup_padded(jnp.asarray(padded), jnp.int32(n), T, 100)
        n_runs = int(n_runs)
        assert n_runs == len(ref_vals)
        np.testing.assert_array_equal(np.asarray(vals)[:n_runs], ref_vals)
        np.testing.assert_array_equal(np.asarray(counts)[:n_runs], ref_counts)
        assert np.all(np.asarray(counts)[n_runs:] == 0)
        assert np.all(np.asarray(vals)[n_runs:] == 100)


def test_repeat_interleave_padded_matches_numpy(rng):
    for _ in range(20):
        c = int(rng.integers(1, 20))
        vals = rng.integers(0, 100, size=c)
        lens = rng.integers(0, 5, size=c)
        cap = 128
        out, total = seqops.repeat_interleave_padded(
            jnp.asarray(vals), jnp.asarray(lens), cap, -1
        )
        ref = np.repeat(vals, lens)
        assert int(total) == ref.shape[0]
        np.testing.assert_array_equal(np.asarray(out)[: ref.shape[0]], ref)
        assert np.all(np.asarray(out)[ref.shape[0] :] == -1)


def _carryover_reference(lens):
    """Literal re-statement of reference infer.py:158-172 in numpy."""
    base = np.round(np.clip(lens, 1, None))
    a = lens - base
    vals_, total = [], 0.0
    for x in a:
        total += x
        if total >= 1:
            vals_.append(1)
            total -= 1
        elif total <= -1:
            vals_.append(-1)
            total += 1
        else:
            vals_.append(0)
    return base.astype(np.int64) + np.array(vals_)


@pytest.mark.parametrize("seed", range(5))
def test_len_carryover_correction(seed):
    rng = np.random.default_rng(seed)
    lens = rng.uniform(0.2, 9.0, size=50).astype(np.float32)
    ref = _carryover_reference(lens.astype(np.float64))
    got = np.asarray(seqops.len_carryover_correction(jnp.asarray(lens)))
    np.testing.assert_array_equal(got, ref)


def test_len_carryover_correction_masked():
    lens = np.array([2.6, 2.6, 2.6, 2.6, 7.7, 7.7], np.float32)
    mask = np.array([True, True, True, True, False, False])
    got = np.asarray(seqops.len_carryover_correction(jnp.asarray(lens), jnp.asarray(mask)))
    ref = _carryover_reference(lens[:4].astype(np.float64))
    np.testing.assert_array_equal(got[:4], ref)
    assert np.all(got[4:] == 0)
    # total length is unbiased for the valid prefix
    assert abs(got[:4].sum() - lens[:4].sum()) <= 1.0


def test_interp_matches_scipy_semantics():
    # length-1 input is tiled
    np.testing.assert_array_equal(seqops.interp([5.0], 3), [5.0, 5.0, 5.0])
    # same-length passthrough
    np.testing.assert_array_equal(seqops.interp([1.0, 2.0], 2), [1.0, 2.0])
    # nearest resample
    out = seqops.interp([0.0, 10.0], 4)
    assert out.shape == (4,)
    assert out[0] == 0.0 and out[-1] == 10.0


def test_morph_seq_len_total_length():
    units = np.array([1, 1, 2, 2, 2, 3])
    pitch = np.array([100.0, 110.0, 200.0, 210.0, 220.0, 50.0])
    t_lens = np.array([3, 2, 4])
    out = seqops.morph_seq_len(units, pitch, t_lens)
    assert out.shape[0] == t_lens.sum()


def test_nearest_upsample():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    y = seqops.nearest_upsample(x, 2)
    assert y.shape == (1, 6, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :, 0]), [0, 0, 2, 2, 4, 4])
