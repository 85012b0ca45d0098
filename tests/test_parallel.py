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


def test_gan_step_equivalent_on_1_and_8_devices():
    """The FULL GAN train step (both optimizers, spectral state) on a
    (4, 2) data x model mesh — conv kernels tensor-sharded on their
    output-channel dim like dryrun_multichip — must match the 1-device
    step. SGD isolates sharding effects from Adam's grad-noise
    amplification (see test_training_equivalent_on_1_and_8_devices)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    h = VocoderConfig(upsample_initial_channel=32, embedding_dim=8,
                      model_in_dim=17, segment_size=1280, batch_size=8)
    rng = np.random.default_rng(2)
    batch_np = {
        "code": rng.integers(0, 100, (8, 4)).astype(np.int32),
        "f0": rng.normal(0, 1, (8, 4, 1)).astype(np.float32),
        "spkr": rng.integers(0, 4, (8, 1)).astype(np.int32),
        "audio": rng.uniform(-0.5, 0.5, (8, 1280)).astype(np.float32),
    }

    def run(mesh, n_model):
        state, gen_tx, disc_tx = init_gan_state(
            h, jax.random.key(0), seg_frames=4,
            gen_tx=optax.sgd(1e-3), disc_tx=optax.sgd(1e-3))

        def shard_param(x):
            if (getattr(x, "ndim", 0) >= 2 and x.shape[-1] % n_model == 0
                    and x.shape[-1] >= n_model):
                spec = P(*([None] * (x.ndim - 1)), "model")
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(mesh, spec))

        state = jax.tree_util.tree_map(shard_param, state)
        batch = {
            k: jax.device_put(jnp.asarray(v), NamedSharding(
                mesh, P("data", *([None] * (v.ndim - 1)))))
            for k, v in batch_np.items()
        }
        train_step, _ = make_gan_train_step(h, gen_tx, disc_tx)
        with mesh:
            new_state, metrics = train_step(state, batch)
            jax.block_until_ready(new_state.gen_params)
        return new_state, metrics

    s1, m1 = run(create_mesh(n_data=1, n_model=1, devices=jax.devices()[:1]), 1)
    s8, m8 = run(create_mesh(n_data=4, n_model=2), 2)

    for k in ("loss_disc", "loss_gen_total", "loss_mel"):
        assert np.isclose(float(m1[k]), float(m8[k]), rtol=1e-4), k
    for name, t1, t8 in (("gen", s1.gen_params, s8.gen_params),
                         ("mpd", s1.mpd_params, s8.mpd_params),
                         ("msd", s1.msd_params, s8.msd_params)):
        for a, b in zip(jax.tree_util.tree_leaves(t1),
                        jax.tree_util.tree_leaves(t8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                       err_msg=name)


def test_dataset_process_sharding_disjoint_and_covering(tmp_path):
    """CodeDataset.batches(process_index/count) gives each host a disjoint
    covering shard of the same shuffled epoch (DistributedSampler
    semantics, reference sr/train.py:102)."""
    import json

    from dissc_tpu.core.wav import write_wav
    from dissc_tpu.data.code_dataset import CodeDataset, parse_manifest

    rng = np.random.default_rng(0)
    records = []
    for i in range(7):  # odd count exercises the wrap-around pad
        wav = (rng.standard_normal(8 * 320) * 0.2).astype(np.float32)
        name = f"p1_{i:03d}.wav"
        write_wav(str(tmp_path / name), wav, 16000)
        # unique constant code value identifies the item in a batch
        records.append({"units": [i] * 8, "f0": [100.0] * 8, "audio": name})
    mani = str(tmp_path / "train.txt")
    with open(mani, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    files = parse_manifest(mani, str(tmp_path))

    def items_for(pi, pc):
        ds = CodeDataset(files, 1280, 320, 16000, seed=5)
        seen = []
        for b in ds.batches(2, shuffle=True, seed=11, process_index=pi,
                            process_count=pc):
            seen.extend(int(v) for v in b["code"][:, 0])
        return seen

    shard0, shard1 = items_for(0, 2), items_for(1, 2)
    assert len(shard0) == len(shard1) == 4  # ceil(7/2)=4 each (one wrapped)
    # disjoint up to the single wrap-around duplicate
    dup = set(shard0) & set(shard1)
    assert len(dup) <= 1
    assert set(shard0) | set(shard1) == set(range(7))  # covering
    # single-process run sees everything in the same epoch order
    full = items_for(0, 1)
    assert sorted(set(full)) == list(range(6)) or len(full) == 6
