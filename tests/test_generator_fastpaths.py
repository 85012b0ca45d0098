"""Equivalence of the generator's TPU fast paths vs the plain formulation.

Two rewrites of the same math (both default-on):
  * polyphase ConvTranspose1d (one dense conv + phase interleave) vs the
    input-dilated correlation;
  * merged block-diagonal MRF (all 3 resblock branches as one grouped
    conv chain) vs sequential resblocks.
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


def _gens():
    # thin generator: channels 64,32,16,8,4 -> min_ch=1 merges every stage
    h_m = VocoderConfig(upsample_initial_channel=128, model_in_dim=17,
                        mrf_merge_min_ch=1)
    h_p = VocoderConfig(upsample_initial_channel=128, model_in_dim=17,
                        mrf_merge_min_ch=0)
    return Generator(h_m), Generator(h_p)


def test_merged_mrf_matches_sequential():
    gm, gp = _gens()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 17)).astype(np.float32) * 0.1)
    v = gp.init(jax.random.key(3), x)
    vm = gm.init(jax.random.key(3), x)
    assert (set(flax.traverse_util.flatten_dict(v["params"]))
            == set(flax.traverse_util.flatten_dict(vm["params"])))
    y0 = gp.apply(v, x)
    y1 = gm.apply(v, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_merged_mrf_gradients_match():
    gm, gp = _gens()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 17)).astype(np.float32) * 0.1)
    v = gp.init(jax.random.key(5), x)

    def loss(params, g):
        return jnp.mean(jnp.square(g.apply({"params": params}, x)))

    g0 = jax.grad(loss)(v["params"], gp)
    g1 = jax.grad(loss)(v["params"], gm)
    flat0 = flax.traverse_util.flatten_dict(g0)
    flat1 = flax.traverse_util.flatten_dict(g1)
    for k in flat0:
        np.testing.assert_allclose(np.asarray(flat0[k]), np.asarray(flat1[k]),
                                   atol=1e-6, err_msg="/".join(k))


def test_merge_respects_channel_cap():
    # mrf_merge_min_ch=32: only the wide stages (64, 32 ch) merge;
    # numerics must still match the fully sequential model
    h_cap = VocoderConfig(upsample_initial_channel=128, model_in_dim=17,
                          mrf_merge_min_ch=32)
    h_p = VocoderConfig(upsample_initial_channel=128, model_in_dim=17,
                        mrf_merge_min_ch=0)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 12, 17)).astype(np.float32) * 0.1)
    gp = Generator(h_p)
    v = gp.init(jax.random.key(7), x)
    y0 = gp.apply(v, x)
    y1 = Generator(h_cap).apply(v, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
