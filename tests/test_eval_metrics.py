"""Eval metric suite: edit distance, EMD, FFE, TextGrid parsing, and the
full calc_errors sweep over a synthetic results directory."""
import os

import numpy as np
import pytest

from dissc_tpu.core.wav import write_wav
from dissc_tpu.eval.metrics import (
    aligned_ffe,
    calc_asr_er,
    calc_errors,
    edit_distance,
    log_results,
    pitch_emd,
)
from dissc_tpu.eval.sv import compute_eer
from dissc_tpu.eval.textgrid import Interval, TextGrid

MFA_STYLE_TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.5
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.5
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.5
            text = "hello"
        intervals [2]:
            xmin = 0.5
            xmax = 0.9
            text = ""
        intervals [3]:
            xmin = 0.9
            xmax = 1.5
            text = "world"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.5
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 0.7
            text = "HH"
        intervals [2]:
            xmin = 0.7
            xmax = 1.5
            text = "W"
"""


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance("abc", "abc") == 0


def test_calc_asr_er_normalisation():
    cer_s, cer_d, wer_s, wer_d = calc_asr_er("Hello, world!", "hello 1 world")
    # digits -> words only on the hypothesis; punctuation stripped
    assert wer_d == 2
    assert wer_s == 1  # inserted "one"
    assert cer_d == len("hello world")


def test_textgrid_parser():
    grid = TextGrid.fromString(MFA_STYLE_TEXTGRID)
    assert len(grid) == 2
    assert grid.maxTime == 1.5
    words = [i for i in grid[0] if i.mark]
    assert [w.mark for w in words] == ["hello", "world"]
    assert np.isclose(words[0].duration(), 0.5)
    phones = [i for i in grid[1] if i.mark]
    assert [p.mark for p in phones] == ["HH", "W"]


def test_pitch_emd_identical_is_zero():
    p = np.array([100.0, 110.0, 0.0, 120.0])
    assert pitch_emd(p, p) == 0.0
    assert pitch_emd(p, p + 50) > 0


def test_aligned_ffe():
    iv = [Interval(0.0, 0.1, "a")]
    pitch_ref = np.full(50, 100.0)
    pitch_same = np.full(50, 100.0)
    pitch_off = np.full(50, 150.0)
    assert aligned_ffe(iv, iv, pitch_ref, pitch_same) == 0.0
    assert aligned_ffe(iv, iv, pitch_ref, pitch_off) == 1.0


def test_compute_eer_separable():
    pos = np.array([0.9, 0.8, 0.85, 0.95])
    neg = np.array([0.1, 0.2, 0.15, 0.05])
    eer, thr = compute_eer(pos, neg)
    assert eer == 0.0
    overlapped_eer, _ = compute_eer(np.array([0.6, 0.4]), np.array([0.5, 0.3]))
    assert 0.0 < overlapped_eer <= 0.5


def test_compute_eer_matches_bruteforce():
    # the sort-based sweep must agree with the direct per-threshold scan
    rng = np.random.default_rng(7)
    pos = rng.normal(0.4, 0.3, 400)
    neg = rng.normal(-0.1, 0.3, 600)
    eer, thr = compute_eer(pos, neg)
    thresholds = np.unique(np.concatenate([pos, neg]))
    far = np.array([(neg >= t).mean() for t in thresholds])
    frr = np.array([(pos < t).mean() for t in thresholds])
    i = int(np.argmin(np.abs(far - frr)))
    assert eer == (far[i] + frr[i]) / 2.0
    assert thr == thresholds[i]


def test_compute_eer_large_scale_fast():
    # VCTK-scale pair list (~10k) must complete near-instantly
    import time

    rng = np.random.default_rng(8)
    pos = rng.normal(0.5, 0.2, 5000)
    neg = rng.normal(0.0, 0.2, 5000)
    t0 = time.time()
    eer, _ = compute_eer(pos, neg)
    assert time.time() - t0 < 1.0
    assert 0.0 < eer < 0.25


def _tone(f0, n, sr=16000):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_calc_errors_full_sweep(tmp_path):
    base = str(tmp_path)
    os.makedirs(f"{base}/orig/txtgrid", exist_ok=True)
    os.makedirs(f"{base}/m/p2/txtgrid", exist_ok=True)

    # target speaker p2; converted sample from source p1, utterance 007
    write_wav(f"{base}/orig/p2_007.wav", _tone(220.0, 16000), 16000)
    write_wav(f"{base}/m/p2/p1_007.wav", _tone(200.0, 17600), 16000)
    # reconstruction (target in name) must be skipped
    write_wav(f"{base}/m/p2/p2_007.wav", _tone(220.0, 16000), 16000)
    with open(f"{base}/orig/txtgrid/p2_007.TextGrid", "w") as f:
        f.write(MFA_STYLE_TEXTGRID)
    # no syn TextGrid -> uniform fallback grid path

    errs = calc_errors(base, "m", ["p2"], transcribe=None)
    assert len(errs["len"]) == 1
    assert errs["len"][0] == 1600
    assert len(errs["emd"]) == 1 and errs["emd"][0] >= 0
    assert len(errs["w_len"]) == 1 and len(errs["p_len"]) == 1
    summary = log_results(errs, base, "m")
    assert os.path.exists(f"{base}/m_results.pkl")
    assert np.isfinite(summary["EMD"])


def test_calc_errors_skips_p270_024(tmp_path):
    base = str(tmp_path)
    os.makedirs(f"{base}/orig", exist_ok=True)
    os.makedirs(f"{base}/m/p2", exist_ok=True)
    write_wav(f"{base}/orig/p2_024.wav", _tone(220.0, 8000), 16000)
    write_wav(f"{base}/m/p2/p270_024.wav", _tone(200.0, 8000), 16000)
    errs = calc_errors(base, "m", ["p2"], transcribe=None)
    assert errs["len"] == []  # the known-bad sample was excluded
