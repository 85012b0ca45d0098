"""librosa.util.normalize (inf-norm along axis 0 — the library default)."""
import numpy as np


def normalize(S, norm=np.inf, axis=0, threshold=None, fill=None):
    if norm is not np.inf or fill is not None:
        raise NotImplementedError("stub supports the reference's defaults only")
    S = np.asarray(S)
    mag = np.abs(S).astype(float)
    length = np.max(mag, axis=axis, keepdims=True)
    if threshold is None:
        threshold = np.finfo(np.float32).tiny
    small = length < threshold
    Snorm = np.empty_like(S, dtype=float)
    length = np.where(small, 1.0, length)
    np.divide(S, length, out=Snorm)
    return Snorm
