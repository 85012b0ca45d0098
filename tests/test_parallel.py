"""Distributed-correctness tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.parallel.mesh import create_mesh, mesh_for_batch, shard_batch


def test_mesh_for_batch_divides():
    m = mesh_for_batch(4)
    assert 4 % m.shape["data"] == 0
    m = mesh_for_batch(32)
    assert m.shape["data"] == 8  # all virtual devices used
    m = mesh_for_batch(3)
    assert m.shape["data"] in (1, 3)


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh(n_data=8, n_model=1)
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    (sx,) = shard_batch(mesh, (x,))
    assert sx.sharding.is_fully_replicated is False
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_training_equivalent_on_1_and_8_devices():
    """The same rhythm-model train step on a 1-device and an 8-device mesh
    must produce (numerically) the same updated params — the GSPMD psum
    IS the reference's DDP allreduce."""
    import optax

    from dissc_tpu.models.prosody import LenPredictor
    from dissc_tpu.train.prosody_trainer import TrainState, make_len_steps

    rng = np.random.default_rng(0)
    model = LenPredictor(n_tokens=100, n_speakers=4)
    vals = rng.integers(0, 100, (8, 12)).astype(np.int32)
    lens = rng.integers(1, 5, (8, 12)).astype(np.float32)
    spk = rng.integers(0, 4, (8, 1)).astype(np.int32)

    variables = model.init(jax.random.key(0), vals[:1], spk[:1], (0.0, 1.0))

    def run(mesh):
        # SGD: updates proportional to grads, so cross-sharding float
        # reduction-order noise (~1e-6) stays ~1e-6 in the params.
        # (Adam would amplify near-zero grads to +-lr via the sign-like
        # m/sqrt(v) normaliser — not a sharding bug.)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            tx=optax.sgd(1e-3), batch_stats=variables["batch_stats"],
        )
        train_step, eval_step = make_len_steps(model, (0.0, 1.0))
        b = shard_batch(mesh, (jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(spk)))
        state, metrics = train_step(state, *b, jax.random.key(42))
        return state, metrics

    s1, m1 = run(create_mesh(n_data=1, n_model=1, devices=jax.devices()[:1]))
    s8, m8 = run(create_mesh(n_data=8, n_model=1))

    assert np.isclose(float(m1["Loss"]), float(m8["Loss"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_vq_codebook_identical_across_shardings():
    """EMA-VQ update with a GSPMD-sharded batch matches the single-device
    update (the reference's all_reduce'd codebook stats)."""
    from dissc_tpu.models.vq import Bottleneck

    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 4, 6)).astype(np.float32)
    vq = Bottleneck(l_bins=4, emb_width=6, mu=0.9, levels=1)
    variables = vq.init({"params": jax.random.key(0), "vq": jax.random.key(1)},
                        [jnp.asarray(x)])

    def run(mesh):
        (xs,) = shard_batch(mesh, (jnp.asarray(x),))
        @jax.jit
        def step(v, xs):
            return vq.apply(v, [xs], rngs={"vq": jax.random.key(2)},
                            mutable=["vq_state"])
        (outs, new_state) = step(variables, xs)
        return new_state["vq_state"]

    k1 = jax.tree_util.tree_leaves(run(create_mesh(n_data=1, n_model=1,
                                                   devices=jax.devices()[:1])))
    k8 = jax.tree_util.tree_leaves(run(create_mesh(n_data=8, n_model=1)))
    for a, b in zip(k1, k8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
