"""Determinism helpers.

JAX is deterministic by construction (explicit threaded PRNG keys), so
the reference's ``seed_everything`` CUDA/CUBLAS machinery
(``utils.py:10-20``) reduces to seeding the host-side numpy/python RNGs
used by data shuffling and interval sampling.
"""
from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int) -> None:
    if seed == -1:
        return
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
