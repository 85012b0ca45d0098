"""librosa stub: the three entry points the reference uses.

``librosa.filters.mel`` (sr/dataset.py:21,54), ``librosa.util.normalize``
(sr/inference.py:206,250,255, eval.py:13,30) and ``librosa.effects.trim``
(data/preprocess.py:26), each backed by first-party dissc_tpu DSP.
"""
from . import effects, filters, util  # noqa: F401

__version__ = "0.0-dissc-stub"
