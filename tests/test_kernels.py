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


def test_mel_kernel_vjp_matches_xla_chain(rng):
    """mel_spectrogram_pallas_grad: fused forward (interpret here) and an
    XLA-recompute backward that must equal the reference chain's VJP."""
    import jax

    from dissc_tpu.kernels import mel_kernel

    y = jnp.asarray((rng.standard_normal((2, 2560)).astype(np.float32) * 0.3))
    # interpret-mode forward on CPU: patch the kernel entry the wrapper uses
    orig = mel_kernel.mel_spectrogram_pallas
    mel_kernel_interp = lambda yy, *a, **kw: orig(yy, *a, interpret=True, **kw)
    try:
        mel_kernel.mel_spectrogram_pallas = mel_kernel_interp

        def loss_pallas(yy):
            return jnp.abs(mel_kernel.mel_spectrogram_pallas_grad(yy)).mean()

        def loss_ref(yy):
            return jnp.abs(mel_spectrogram(yy)).mean()

        vp, gp = jax.value_and_grad(loss_pallas)(y)
        vr, gr = jax.value_and_grad(loss_ref)(y)
    finally:
        mel_kernel.mel_spectrogram_pallas = orig
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-6)
