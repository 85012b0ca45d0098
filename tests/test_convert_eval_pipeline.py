"""End-to-end convert_eval pipeline test (VERDICT r1 item 2).

Builds a toy Syn_VCTK-shaped corpus, trains tiny len/pitch/vocoder
checkpoints, runs ``cli.convert_eval --sort_gt`` exactly as a user
would (reference ``scripts/convert_eval.py`` flow), and asserts the
results pickle holds populated EMD/len metrics and the gt restructure
exists.  Heavy (~minutes): the real compile+train+YAAPT path, no mocks.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from toy_convert_eval import SRC_SPK, TRGT_IDS, build_corpus, run_pipeline, train_checkpoints


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("convert_eval"))
    build_corpus(root, n_seq=2)
    train_checkpoints(root)
    return root


def test_convert_eval_end_to_end_with_sort_gt(pipeline_root):
    errs = run_pipeline(pipeline_root, sort_gt=True)

    # gt restructure (reference scripts/convert_eval.py:112-136)
    orig = os.path.join(pipeline_root, "results", "syn_vctk", "orig")
    gt_wavs = [f for f in os.listdir(orig) if f.endswith(".wav")]
    gt_txts = [f for f in os.listdir(orig) if f.endswith(".txt")]
    assert len(gt_wavs) == len(SRC_SPK) * 2  # every (src, seq) pair
    assert len(gt_txts) == len(gt_wavs)

    # converted outputs per target speaker, named {src}_{seq}.wav
    for trg in TRGT_IDS:
        d = os.path.join(pipeline_root, "results", "syn_vctk", "dissc_b", trg)
        wavs = [f for f in os.listdir(d) if f.endswith(".wav")]
        assert len(wavs) == len(SRC_SPK) * 2, (trg, wavs)

    # metrics populated: 4 targets x 5 non-self sources x 2 seqs
    expected_pairs = len(TRGT_IDS) * (len(SRC_SPK) - 1) * 2
    assert len(errs["len"]) == expected_pairs
    assert len(errs["emd"]) == expected_pairs
    assert all(np.isfinite(v) for v in errs["emd"])

    # results pickle written by log_results
    assert os.path.exists(os.path.join(
        pipeline_root, "results", "syn_vctk", "dissc_b_results.pkl"))
