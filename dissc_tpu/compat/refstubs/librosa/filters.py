"""librosa.filters.mel -> dissc_tpu.audio.mel.mel_filterbank.

The native filterbank is slaney-normalised/htk=False like the library
default the reference relies on (torch-parity proven in tests/test_mel.py).
Old-librosa positional signature, as called at sr/dataset.py:54.
"""
import numpy as np


def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm="slaney",
        dtype=np.float32):
    if htk or norm != "slaney":
        raise NotImplementedError("stub supports the reference's defaults only")
    from dissc_tpu.audio.mel import mel_filterbank

    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(dtype)
