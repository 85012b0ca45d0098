"""librosa.effects.trim -> dissc_tpu.audio trim (data/preprocess.py:26)."""
import numpy as np


def trim(y, top_db=60, ref=np.max, frame_length=2048, hop_length=512):
    from dissc_tpu.audio.resample import trim_silence

    out, (start, end) = trim_silence(
        np.asarray(y), top_db=top_db, frame_length=frame_length,
        hop_length=hop_length)
    return out, np.array([start, end])
