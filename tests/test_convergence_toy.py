"""Convergence-run machinery: corpus build, train, stop, auto-resume.

A micro version of ``scripts/train_convergence.py`` (the real multi-
thousand-step TPU evidence lives in PERFORMANCE.md): tiny model, a few
steps, asserting the stop/resume path continues the step count and the
validation-curve artifact is written.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from train_convergence import build_corpus

    root = str(tmp_path_factory.mktemp("conv"))
    base = build_corpus(root, n_utt=3, n_frames=16)
    return root, base


def test_corpus_is_deterministic_mapping(corpus):
    from train_convergence import synth_utterance, unit_freq

    _, base = corpus
    recs = [json.loads(l) for l in open(os.path.join(base, "train.txt"))]
    assert len(recs) >= 8
    r = recs[0]
    assert len(r["f0"]) == len(r["units"])
    assert r["f0"][0] == unit_freq(r["units"][0])
    # same units + timbre + SEED -> identical waveform (learnable
    # mapping); different seeds vary (the natural-variability redesign
    # that keeps the GAN discriminator from saturating — see the
    # synth_utterance docstring)
    w1 = synth_utterance(r["units"][:4], 0.5, np.random.default_rng(7))
    w2 = synth_utterance(r["units"][:4], 0.5, np.random.default_rng(7))
    np.testing.assert_array_equal(w1, w2)
    w3 = synth_utterance(r["units"][:4], 0.5, np.random.default_rng(8))
    assert not np.array_equal(w1, w3)
    assert w1.shape == (4 * 320,)


def test_vocoder_stop_resume_and_curve(corpus, capsys):
    from train_convergence import read_metric, run_vocoder

    root, base = corpus

    class A:
        batch = 2
        segment = 1280
        channels = 32
        steps1 = 6
        steps2 = 12
        val_interval = 3
        ckpt_interval = 3
        dtype = "float32"
        disc_dtype = "float32"

    res = run_vocoder(base, root, A())
    assert res["steps"] == 12
    # resume actually happened (phase 2 loaded the phase-1 checkpoint)
    assert "Resumed from" in capsys.readouterr().out
    # validation curve recorded across BOTH phases
    steps = [s for s, _ in res["val_mel"]]
    assert any(s <= A.steps1 for s in steps) and any(s > A.steps1 for s in steps)
    assert all(v > 0 for _, v in res["val_mel"])
    # g_/do_ checkpoints exist at the final step
    assert os.path.exists(os.path.join(res["ckpt"], "g_00000012"))
    assert os.path.exists(os.path.join(res["ckpt"], "do_00000012"))


def test_prosody_trainers_descend(corpus):
    from train_convergence import run_prosody

    root, base = corpus
    res = run_prosody(base, root, epochs=3)
    for name in ("len", "pitch"):
        r = res[name]
        assert r["best_saved"], name
        assert len(r["val"]) == 3, name
        assert all(np.isfinite(v) for _, v in r["val"]), name
