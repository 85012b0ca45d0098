"""Pallas kernel correctness (interpret mode on the CPU mesh)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dissc_tpu.audio.mel import mel_spectrogram
from dissc_tpu.kernels.mel_kernel import mel_spectrogram_pallas


@pytest.mark.parametrize("t", [8960, 2560, 40960])
def test_mel_kernel_matches_reference_chain(rng, t):
    y = (rng.standard_normal((2, t)).astype(np.float32) * 0.3).clip(-1, 1)
    ref = np.asarray(mel_spectrogram(jnp.asarray(y)))
    out = np.asarray(mel_spectrogram_pallas(jnp.asarray(y), interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)
