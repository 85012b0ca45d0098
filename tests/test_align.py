"""DTW fallback aligner: boundary transfer accuracy on synthetic audio."""
import os

import numpy as np
import pytest

from dissc_tpu.eval.align import (
    align_textgrid,
    dtw_path,
    grid_to_text,
    warp_function,
    write_dtw_textgrids,
)
from dissc_tpu.eval.textgrid import Interval, TextGrid

pytestmark = pytest.mark.fast

SR = 16000


def _two_tone(dur_a, dur_b, fa=220.0, fb=880.0):
    """Tone A then tone B with distinct spectra (what DTW aligns on)."""
    ta = np.arange(int(dur_a * SR)) / SR
    tb = np.arange(int(dur_b * SR)) / SR
    a = 0.5 * np.sin(2 * np.pi * fa * ta)
    b = 0.5 * np.sign(np.sin(2 * np.pi * fb * tb))  # square: rich spectrum
    return np.concatenate([a, b]).astype(np.float32)


def test_dtw_path_identity():
    d = 1.0 - np.eye(5)
    pis, pjs = dtw_path(d)
    assert pis[0] == pjs[0] == 0 and pis[-1] == pjs[-1] == 4
    np.testing.assert_array_equal(pis, pjs)  # diagonal is optimal


def test_warp_recovers_boundary_shift():
    """ref: 1.0 s A + 1.0 s B; syn: 1.5 s A + 0.75 s B.  The warped
    position of the ref A/B boundary (t=1.0) must land near the syn
    boundary (t=1.5)."""
    ref = _two_tone(1.0, 1.0)
    syn = _two_tone(1.5, 0.75)
    warp = warp_function(ref, syn, SR)
    b = float(warp(1.0))
    assert abs(b - 1.5) < 0.1, b
    # monotone over the whole range
    ts = np.linspace(0, 2.0, 50)
    ws = warp(ts)
    assert (np.diff(ws) >= -1e-9).all()


def test_align_textgrid_and_results_tree(tmp_path):
    from dissc_tpu.core.wav import write_wav

    ref = _two_tone(1.0, 1.0)
    syn = _two_tone(1.5, 0.75)
    grid_text = grid_to_text(
        [("words", [Interval(0.0, 1.0, "aaa"), Interval(1.0, 2.0, "bbb")]),
         ("phones", [Interval(0.0, 1.0, "a"), Interval(1.0, 2.0, "b")])], 2.0)
    ref_grid = TextGrid.fromString(grid_text)

    out = align_textgrid(ref, syn, ref_grid, SR)
    g = TextGrid.fromString(out)
    assert len(g) == 2 and len(g[0]) == 2
    assert g[0][0].mark == "aaa"
    assert abs(g[0][0].maxTime - 1.5) < 0.1
    assert abs(g.maxTime - 2.25) < 0.02

    # results-tree walk: grids land where calc_errors reads MFA output
    base = str(tmp_path)
    os.makedirs(f"{base}/orig/txtgrid")
    os.makedirs(f"{base}/m/s9")
    write_wav(f"{base}/orig/s9_001.wav", ref, SR)
    with open(f"{base}/orig/txtgrid/s9_001.TextGrid", "w") as f:
        f.write(grid_text)
    write_wav(f"{base}/m/s9/src_001.wav", syn, SR)
    n = write_dtw_textgrids(base, "m", ["s9"], SR)
    assert n == 1
    assert os.path.isfile(f"{base}/m/s9/txtgrid/src_001.TextGrid")
