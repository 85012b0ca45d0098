"""Fused MSD G-step (models/msd_fused.py) vs the flax module.

The fused path must be a drop-in for ``MultiScaleDiscriminator.apply``
inside the G step: identical forward outputs (scores + feature maps +
advanced spectral state) and an AD-equivalent gradient w.r.t. the
generated waveform — the custom_vjp backward is hand-written (polyphase
input-gradients, fmap-recovered leaky-relu masks), so this is the
correctness gate for VERDICT r3 item 3.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dissc_tpu.losses.gan import feature_loss, generator_loss
from dissc_tpu.models.discriminators import MultiScaleDiscriminator
from dissc_tpu.models.msd_fused import fold_msd_weights, msd_g_apply

pytestmark = pytest.mark.heavy  # full-width MSD stack: a big CPU compile


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    b, t = 2, 1000  # t indivisible by 4: stresses the pool-length chain
    y = jnp.asarray(rng.normal(0, 0.3, (b, t)).astype(np.float32))
    y_hat = jnp.asarray(rng.normal(0, 0.3, (b, t)).astype(np.float32))
    msd = MultiScaleDiscriminator()
    variables = msd.init(jax.random.PRNGKey(1), y, y_hat)
    return msd, variables, y, y_hat


def _module_apply(msd, variables, y, y_hat):
    return msd.apply(
        {"params": variables["params"], "spectral": variables["spectral"]},
        y, y_hat, True, mutable=["spectral"])


def test_forward_and_spectral_state_match(setup):
    msd, variables, y, y_hat = setup
    (rs, gs, fr, fg), spec = _module_apply(msd, variables, y, y_hat)
    weights, new_spec = fold_msd_weights(variables["params"],
                                         variables["spectral"], train=True)
    rs2, gs2, fr2, fg2 = msd_g_apply(weights, y, y_hat)
    for a, b_ in zip(rs + gs, list(rs2) + list(gs2)):
        np.testing.assert_allclose(a, b_, rtol=0, atol=1e-6)
    for fa, fb in zip(fr + fg, list(fr2) + list(fg2)):
        for a, b_ in zip(fa, fb):
            np.testing.assert_allclose(a, b_, rtol=0, atol=1e-6)
    # the power-iteration state advances exactly like the mutable apply
    for lname, leaf in new_spec["disc_0"].items():
        np.testing.assert_allclose(
            leaf["u"], spec["spectral"]["disc_0"][lname]["u"],
            rtol=0, atol=1e-6)


def test_grad_wrt_waveform_matches_ad(setup):
    msd, variables, y, y_hat = setup

    def loss_module(y_hat):
        (_, s_gs, s_fr, s_fg), _ = _module_apply(msd, variables, y, y_hat)
        return generator_loss(s_gs)[0] + feature_loss(s_fr, s_fg)

    def loss_fused(y_hat):
        weights, _ = fold_msd_weights(variables["params"],
                                      variables["spectral"], train=True)
        _, s_gs, s_fr, s_fg = msd_g_apply(weights, y, y_hat)
        return generator_loss(list(s_gs))[0] + feature_loss(list(s_fr),
                                                            list(s_fg))

    l1, g1 = jax.value_and_grad(loss_module)(y_hat)
    l2, g2 = jax.value_and_grad(loss_fused)(y_hat)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(g1, g2, rtol=0, atol=3e-4 * scale)


def test_bf16_forward_runs(setup):
    msd, variables, y, y_hat = setup
    weights, _ = fold_msd_weights(variables["params"], variables["spectral"],
                                  train=True, dtype=jnp.bfloat16)
    _, s_gs, _, fg = msd_g_apply(weights, y, y_hat)
    assert fg[0][0].dtype == jnp.bfloat16
    g = jax.grad(lambda yh: jnp.sum(msd_g_apply(weights, y, yh)[1][0]))(y_hat)
    assert g.dtype == y_hat.dtype and bool(jnp.all(jnp.isfinite(g)))


def test_composed_train_step_equivalent():
    """2 full GAN train steps with ``msd_fused_gstep`` on vs off: losses
    and resulting params must match (the fused path changes only the
    backward's lowering, not its math — SGD isolates reassociation)."""
    import dataclasses

    import optax

    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import (init_gan_state,
                                                 make_gan_train_step)

    h = VocoderConfig(upsample_initial_channel=32, embedding_dim=8,
                      model_in_dim=17, segment_size=1280, batch_size=4)
    rng = np.random.default_rng(3)
    batches = [{
        "code": jnp.asarray(rng.integers(0, 100, (4, 4)).astype(np.int32)),
        "f0": jnp.asarray(rng.normal(0, 1, (4, 4, 1)).astype(np.float32)),
        "spkr": jnp.asarray(rng.integers(0, 4, (4, 1)).astype(np.int32)),
        "audio": jnp.asarray(rng.uniform(-0.5, 0.5, (4, 1280)).astype(np.float32)),
    } for _ in range(2)]

    def run(hh):
        state, gen_tx, disc_tx = init_gan_state(
            hh, jax.random.key(0), seg_frames=4,
            gen_tx=optax.sgd(1e-3), disc_tx=optax.sgd(1e-3))
        step, _ = make_gan_train_step(hh, gen_tx, disc_tx)
        ms = []
        for b in batches:
            state, m = step(state, b)
            ms.append(m)
        return state, ms

    s_plain, m_plain = run(h)
    s_fused, m_fused = run(dataclasses.replace(h, msd_fused_gstep=True))

    for m1, m2 in zip(m_plain, m_fused):
        for k in m1:
            assert np.isclose(float(m1[k]), float(m2[k]), rtol=5e-4), (k, m1[k], m2[k])
    # tree_map (not zip over leaves) so a structural divergence between
    # the plain and fused state trees raises instead of silently
    # truncating the element-wise comparison
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5),
        s_plain.gen_params, s_fused.gen_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        s_plain.msd_spectral, s_fused.msd_spectral)
