"""Speaker-verification EER (reference ``eval_sv.py``).

The reference scores (gt, converted) pairs with speechbrain's ECAPA
model and computes EER with ``speechbrain.utils.metric_stats.EER``.
speechbrain is unavailable here, so:
  * :func:`compute_eer` natively reproduces the EER computation
    (threshold where FAR == FRR, interpolated),
  * the embedding model is pluggable — ``run_sv_eval`` takes any
    ``score(path_a, path_b) -> float`` (cosine similarity of speaker
    embeddings); :func:`cosine_scorer` builds one from an arbitrary
    ``embed(wav) -> vec``.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Tuple

import numpy as np


def compute_eer(positive_scores: np.ndarray, negative_scores: np.ndarray) -> Tuple[float, float]:
    """Equal error rate + threshold.

    Sweeps all observed scores as thresholds; FAR = P(neg >= thr),
    FRR = P(pos < thr); returns the point where they cross (mean of the
    two rates at the minimising threshold), matching speechbrain's EER
    up to interpolation detail.
    """
    positive_scores = np.sort(np.asarray(positive_scores, np.float64))
    negative_scores = np.sort(np.asarray(negative_scores, np.float64))
    thresholds = np.unique(np.concatenate([positive_scores, negative_scores]))
    # sort-based sweep: O((N+T) log N) instead of a Python O(N*T) loop —
    # the VCTK speaker_verification.csv is ~10k pairs
    far = (len(negative_scores)
           - np.searchsorted(negative_scores, thresholds, side="left")) / len(negative_scores)
    frr = np.searchsorted(positive_scores, thresholds, side="left") / len(positive_scores)
    i = int(np.argmin(np.abs(far - frr)))
    return float((far[i] + frr[i]) / 2.0), float(thresholds[i])


def cosine_scorer(embed: Callable[[np.ndarray], np.ndarray]) -> Callable[[str, str], float]:
    """Build a file-pair scorer from an embedding function."""
    from dissc_tpu.core.wav import read_audio

    def score(path_a: str, path_b: str) -> float:
        ea = embed(read_audio(path_a, dtype="float32")[0])
        eb = embed(read_audio(path_b, dtype="float32")[0])
        return float(np.dot(ea, eb) / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-9))

    return score


def run_sv_eval(
    sample_csv: str,
    gt_path: str,
    syn_path: str,
    score_fn: Callable[[str, str], float],
    file_suffix: str = "_mic2.flac",
) -> float:
    """EER over the speaker_verification.csv pair list
    (columns ref, syn_trgt, syn_sample, label in {0,1} —
    ``eval_sv.py:40-57``)."""
    import pandas as pd

    df = pd.read_csv(sample_csv, index_col=0)
    scores: Dict[int, List[float]] = {0: [], 1: []}
    for _, row in df.iterrows():
        gt = f"{gt_path}/{row.ref}{file_suffix}"
        syn = f"{syn_path}/{row.syn_trgt}/{row.syn_sample}.wav"
        if os.path.isfile(gt) and os.path.isfile(syn):
            scores[row.label].append(score_fn(gt, syn))
        else:
            print(row.ref, row.syn_trgt)
    eer, _ = compute_eer(np.asarray(scores[1]), np.asarray(scores[0]))
    print("\nEER:", eer)
    return eer
