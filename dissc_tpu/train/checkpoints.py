"""Checkpointing.

Mirrors the reference's two schemes (SURVEY §5):
  (a) prosody predictors — overwrite ``best_model.pth`` on improved val
      metric + a separate ``len_norm_stats.pth`` (reference
      ``train_len_predictor.py:32,100-103``);
  (b) vocoder — periodic ``g_<08d>`` (generator only) and ``do_<08d>``
      (discriminators + both optimizer states + step + epoch), latest
      selected by name sort on resume (``sr/train.py:206-214``,
      ``sr/utils.py:62-67``).

Trees are stored as numpy pickles (framework-neutral, no torch needed);
the same helpers serve both schemes.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(filepath: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    tmp = filepath + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(tree), f)
    os.replace(tmp, filepath)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(filepath: str) -> Any:
    with open(filepath, "rb") as f:
        return pickle.load(f)


def scan_checkpoint(cp_dir: str, prefix: str) -> Optional[str]:
    """Latest checkpoint with ``prefix`` + 8-digit step, by name sort
    (reference ``sr/utils.py:62-67``)."""
    cp_list = glob.glob(os.path.join(cp_dir, prefix + "????????"))
    if not cp_list:
        return None
    return sorted(cp_list)[-1]


def step_checkpoint_name(prefix: str, step: int) -> str:
    return f"{prefix}{step:08d}"
