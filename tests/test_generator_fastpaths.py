"""Equivalence of the generator's TPU fast paths vs the plain formulation.

Two rewrites of the same math (both default-on):
  * polyphase ConvTranspose1d (one dense conv + phase interleave) vs the
    input-dilated correlation;
  * space-to-channel packed MRF (narrow stages as kron-structured
    128-lane convs) vs sequential resblocks.
Both must be numerically identical (same params, same outputs, same
gradients) — the checkpoint format and the reference parity suite pin
the semantics, these pin the rewrites.
"""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.models.hifigan import Generator
from dissc_tpu.models.layers import ConvTranspose1d


@pytest.mark.parametrize("k,u", [(11, 5), (8, 4), (4, 2), (9, 3)])
def test_polyphase_convt_matches_dilated(k, u):
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    x = jnp.asarray(rng.standard_normal((2, 13, 12)).astype(np.float32))
    m_poly = ConvTranspose1d(6, k, stride=u, padding=(k - u) // 2,
                             norm="weight", polyphase=True)
    m_dil = ConvTranspose1d(6, k, stride=u, padding=(k - u) // 2,
                            norm="weight", polyphase=False)
    v = m_dil.init(key, x)
    y0 = m_dil.apply(v, x)
    y1 = m_poly.apply(v, x)
    assert y0.shape == y1.shape == (2, 13 * u, 6)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    g0 = jax.grad(lambda v: jnp.sum(jnp.sin(m_dil.apply(v, x))))(v)
    g1 = jax.grad(lambda v: jnp.sum(jnp.sin(m_poly.apply(v, x))))(v)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_polyphase_falls_back_when_shapes_dont_tile():
    # k - 2*padding != stride -> output is not T*stride; the dilated
    # path must be taken and produce the torch-semantics length
    key = jax.random.key(1)
    x = jnp.zeros((1, 10, 4))
    m = ConvTranspose1d(3, 5, stride=2, padding=1, polyphase=True)
    v = m.init(key, x)
    y = m.apply(v, x)
    assert y.shape[1] == (10 - 1) * 2 - 2 * 1 + 5  # 21


def test_packed_mrf_matches_sequential():
    # channels 64,32,16,8,4 all divide 128 -> packing applies at every
    # stage (merge disabled); outputs and gradients must be identical
    h_k = VocoderConfig(upsample_initial_channel=128, model_in_dim=17)
    h_p = VocoderConfig(upsample_initial_channel=128, model_in_dim=17,
                        mrf_pack_max_ch=0)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 17)).astype(np.float32) * 0.1)
    gp, gk = Generator(h_p), Generator(h_k)
    v = gp.init(jax.random.key(9), x)
    np.testing.assert_allclose(np.asarray(gp.apply(v, x)),
                               np.asarray(gk.apply(v, x)), atol=1e-6)

    def loss(params, g):
        return jnp.mean(jnp.square(g.apply({"params": params}, x)))

    g0 = flax.traverse_util.flatten_dict(jax.grad(loss)(v["params"], gp))
    g1 = flax.traverse_util.flatten_dict(jax.grad(loss)(v["params"], gk))
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   atol=1e-6, err_msg="/".join(k))


def test_packed_mrf_skips_nondividing_T():
    # T*320 not divisible by P at some stage -> that stage must fall
    # back to the sequential path rather than mis-shape; with T=15 the
    # stage outputs stay divisible (all rates even) so force the skip
    # via channels that don't divide 128 instead
    h = VocoderConfig(upsample_initial_channel=96,
                      model_in_dim=17)  # channels 48,24,12,6,3: 128%ch != 0
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 8, 17)).astype(np.float32) * 0.1)
    g = Generator(h)
    v = g.init(jax.random.key(11), x)
    y = g.apply(v, x)  # must simply run the sequential path
    assert y.shape == (1, 8 * 320)


def test_strided_conv_custom_vjp_matches_ad():
    # discriminator-shaped strided grouped convs: forward bit-identical,
    # dx/dW identical to jax AD (which would emit lhs_dilation for dx)
    from dissc_tpu.models.layers import _conv_plain, _strided_conv_fast

    rng = np.random.default_rng(12)
    for (k, s, pad, G, Ci, Co, T) in [(41, 2, 20, 4, 16, 24, 64),
                                      (41, 4, 20, 16, 32, 32, 80),
                                      (5, 3, 2, 1, 6, 10, 33),
                                      (3, 2, 1, 1, 4, 4, 9)]:
        x = jnp.asarray(rng.standard_normal((2, T, Ci)).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((k, Ci // G, Co)).astype(np.float32) * 0.1)
        y0 = _conv_plain(x, W, s, pad, G)
        y1 = _strided_conv_fast(x, W, s, pad, G)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

        def loss(fn, x, W, s=s, pad=pad, G=G):
            return jnp.sum(jnp.sin(fn(x, W, s, pad, G)))

        g0 = jax.grad(loss, argnums=(1, 2))(_conv_plain, x, W)
        g1 = jax.grad(loss, argnums=(1, 2))(_strided_conv_fast, x, W)
        np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]), atol=1e-5)


def test_strided_conv_s2d_matches_plain():
    # space-to-depth strided conv: same math as the native strided conv
    # (AD then derives a stride-1 backward with no lhs_dilation)
    from dissc_tpu.models.layers import _conv_plain, _strided_conv_s2d

    rng = np.random.default_rng(21)
    for (k, s, pad, G, Ci, Co, T) in [(41, 2, 20, 4, 16, 24, 64),
                                      (41, 2, 20, 16, 32, 32, 80),
                                      (41, 4, 20, 16, 32, 32, 96),
                                      (5, 3, 2, 1, 6, 10, 33),
                                      (4, 2, 1, 1, 4, 4, 10),
                                      (3, 2, 1, 1, 4, 4, 9)]:
        x = jnp.asarray(rng.standard_normal((2, T, Ci)).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((k, Ci // G, Co)).astype(np.float32) * 0.1)
        y0 = _conv_plain(x, W, s, pad, G)
        y1 = _strided_conv_s2d(x, W, s, pad, G)
        assert y0.shape == y1.shape, (k, s, pad, G)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5,
                                   err_msg=str((k, s, pad, G)))

        def loss(fn, x, W, s=s, pad=pad, G=G):
            return jnp.sum(jnp.sin(fn(x, W, s, pad, G)))

        g0 = jax.grad(loss, argnums=(1, 2))(_conv_plain, x, W)
        g1 = jax.grad(loss, argnums=(1, 2))(_strided_conv_s2d, x, W)
        np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]), atol=1e-5)


def test_discriminators_s2d_equivalent():
    # full MPD+MSD with the s2d lowering: identical param tree, same
    # scores/fmaps and same input-gradient as the native strided path
    from dissc_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )

    rng = np.random.default_rng(22)
    y = jnp.asarray(rng.standard_normal((2, 1280)).astype(np.float32) * 0.3)
    y_hat = jnp.asarray(rng.standard_normal((2, 1280)).astype(np.float32) * 0.3)
    for cls in (MultiPeriodDiscriminator, MultiScaleDiscriminator):
        d0, d1 = cls(s2d=False), cls(s2d=True)
        v = d0.init(jax.random.key(23), y, y_hat)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            d1.init(jax.random.key(23), y, y_hat))

        def score_sum(yh, d, v=v):
            if "spectral" in v:
                (rs, gs, fr, fg), _ = d.apply(v, y, yh, mutable=["spectral"])
            else:
                rs, gs, fr, fg = d.apply(v, y, yh)
            return (sum(jnp.sum(jnp.sin(s)) for s in gs)
                    + sum(jnp.sum(jnp.sin(f)) for fm in fg for f in fm))

        s0, g0 = jax.value_and_grad(score_sum)(y_hat, d0)
        s1, g1 = jax.value_and_grad(score_sum)(y_hat, d1)
        np.testing.assert_allclose(float(s0), float(s1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=2e-5)


def test_packed_waveform_head_matches_plain():
    # final stage ch=8 (>=8, divides 128) -> the packed conv_post path
    h_k = VocoderConfig(upsample_initial_channel=256, model_in_dim=17)
    h_p = VocoderConfig(upsample_initial_channel=256, model_in_dim=17,
                        mrf_pack_max_ch=0)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 8, 17)).astype(np.float32) * 0.1)
    gp, gk = Generator(h_p), Generator(h_k)
    v = gp.init(jax.random.key(14), x)
    np.testing.assert_allclose(np.asarray(gp.apply(v, x)),
                               np.asarray(gk.apply(v, x)), atol=1e-6)

    def loss(params, g):
        return jnp.mean(jnp.square(g.apply({"params": params}, x)))

    g0 = flax.traverse_util.flatten_dict(jax.grad(loss)(v["params"], gp))
    g1 = flax.traverse_util.flatten_dict(jax.grad(loss)(v["params"], gk))
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   atol=1e-6, err_msg="/".join(k))
