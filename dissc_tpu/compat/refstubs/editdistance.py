"""editdistance stub — ``eval(a, b)`` Levenshtein (reference eval.py:47)."""
from dissc_tpu.eval.metrics import edit_distance


def eval(a, b) -> int:  # noqa: A001 - upstream package's name
    return edit_distance(list(a), list(b))
