"""textgrid stub — re-exports the native Praat TextGrid reader.

Covers the reference surface at eval.py:105-129: ``TextGrid.fromFile``,
indexable tiers, ``Interval(minTime, maxTime, mark)``, ``.duration()``.
"""
from dissc_tpu.eval.textgrid import Interval, IntervalTier, TextGrid  # noqa: F401
