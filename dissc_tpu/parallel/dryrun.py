"""Multi-chip dry-run phases, each runnable as a standalone subprocess.

``__graft_entry__.dryrun_multichip`` re-execs this module once per phase
(``python -m dissc_tpu.parallel.dryrun --phase ...``) instead of running
everything in-process.  Why (all reproduced on a 1-core host, jaxlib
0.9.0, 8 virtual CPU devices):

* XLA's in-process CPU communicator executes collective thunks
  *blocking* on the shared intra-op Eigen pool.  The pool is sized by
  ``sched_getaffinity`` — with fewer pool threads than collective
  participants, a big program (concurrent ThunkExecutor mode) starves:
  the blocked participant owns the only worker thread, its peers never
  run, and the 40 s rendezvous watchdog CHECK-aborts the process
  (``xla::cpu::InProcessCommunicator::AllGather`` →
  ``AwaitAndLogIfStuck``).  Small programs execute inline/sequentially
  and are immune — which is why the prosody phase always passed while
  the GAN phase died (round-3 ``MULTICHIP_r03.json``).
* The parent works around it by (a) preloading a tiny shim that reports
  ``n_devices`` CPUs so the pool gets enough threads to park in
  rendezvous, (b) raising the collective watchdog timeouts, (c) keeping
  the tensor-parallel sharding on the *wide* generator layers only so
  the all-gather count stays bounded, and (d) watchdogging each phase
  from outside so a stuck child is killed and reported instead of
  hanging the driver.

Phases:
  prosody     — full LenPredictor train step, params replicated, batch
                sharded over ``data`` (its production shape at ~1M params).
  gan         — full GAN train step (generator + MPD + MSD + both
                optimizers) on a tiny config.  ``--shard tp`` tensor-shards
                the wide generator kernels over ``model`` (XLA inserts the
                activation all-gathers) with data-parallel gradients;
                ``--shard dp`` is data-parallel only; ``--shard replicated``
                replicates everything (zero collectives — last-resort
                liveness proof that the full step executes under the mesh).

Reference counterpart: the NCCL/DDP init-and-allreduce path at
``sr/train.py:23-24,36-41,72-79`` — here the mesh + shardings replace
process groups, and XLA emits the collectives.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def _force_cpu(n_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


_T0 = time.time()


def _log(phase: str, msg: str) -> None:
    print(f"[{phase} {time.time() - _T0:6.1f}s] {msg}", flush=True)


def _mesh(n_devices: int, n_model: int):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < n_devices:
        devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    n_data = n_devices // n_model
    return Mesh(
        np.asarray(devices[:n_devices]).reshape(n_data, n_model), ("data", "model")
    )


def tiny_gan_config(batch_size: int):
    """Full-semantics GAN step on the smallest graph that still runs
    every component CLASS: 2 chained polyphase upsample stages, an MRF
    resblock, a period-folding MPD pair, a 2-scale MSD (spectral norm on
    scale 0, avg-pool chain), mel + feature-matching + adversarial
    losses, both AdamW optimizers.  Ensemble sizes are cut from the
    production (5 periods, 3 scales) because the dry run executes 8
    virtual devices time-sliced on however few cores the driver host has
    — op count is the wall-clock driver there (see module docstring),
    and the production ensembles' numerics are already covered by
    tests/test_parallel.py on multi-core hosts."""
    from dissc_tpu.core.config import VocoderConfig

    return VocoderConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),),
        embedding_dim=16, model_in_dim=17,
        code_hop_size=8, segment_size=64, batch_size=batch_size,
        n_fft=32, hop_size=8, win_size=32, num_mels=8, num_freq=17,
        fmax=None, fmax_for_loss=None, mrf_pack_max_ch=0,
        mpd_periods=(2, 3), msd_scales=2,
    )


def run_gan_phase(n_devices: int, shard: str) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    phase = f"gan/{shard}"
    n_model = 2 if (shard == "tp" and n_devices % 2 == 0 and n_devices > 1) else 1
    n_data = n_devices // n_model
    mesh = _mesh(n_devices, n_model)
    _log(phase, f"mesh=({n_data},{n_model}) devices={n_devices} "
                f"backend={jax.default_backend()}")

    h = tiny_gan_config(batch_size=max(n_data, 2))
    state, gen_tx, disc_tx = init_gan_state(h, jax.random.key(0), seg_frames=8)
    _log(phase, "params initialized")

    repl = NamedSharding(mesh, P())

    def gen_param_spec(path, x):
        # Tensor parallelism where it pays on real chips: the wide
        # generator kernels (conv_pre / embeddings — output dim ==
        # upsample_initial_channel).  The narrow tail and the
        # discriminators stay replicated, which also bounds the
        # all-gather count so the dryrun is runnable on CPU hosts.
        wide = (
            getattr(x, "ndim", 0) >= 2
            and x.shape[-1] >= h.upsample_initial_channel
            and x.shape[-1] % n_model == 0
        )
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), "model")) if wide else repl

    if shard == "tp":
        gen_sh = jax.tree_util.tree_map_with_path(gen_param_spec, state.gen_params)
        shardings = state._replace(
            gen_params=gen_sh,
            **{f: jax.tree_util.tree_map(lambda _: repl, getattr(state, f))
               for f in ("mpd_params", "msd_params", "msd_spectral", "disc_opt", "step")},
            gen_opt=jax.tree_util.tree_map(
                # Adam moments follow their parameters' sharding
                lambda _: repl, state.gen_opt),
        )
        n_sharded = sum(
            1 for s in jax.tree_util.tree_leaves(
                gen_sh, is_leaf=lambda x: isinstance(x, NamedSharding))
            if s.spec != P())
        _log(phase, f"tensor-sharding {n_sharded} wide generator kernels "
                    f"over 'model'; grads psum over 'data'")
    else:
        shardings = jax.tree_util.tree_map(lambda _: repl, state)
    state = jax.device_put(state, shardings)

    B, T = h.batch_size, h.segment_size // h.code_hop_size
    batch = {
        "code": jnp.zeros((B, T), jnp.int32),
        "f0": jnp.zeros((B, T, 1), jnp.float32),
        "spkr": jnp.zeros((B, 1), jnp.int32),
        "audio": jnp.zeros((B, h.segment_size), jnp.float32),
    }
    if shard == "replicated":
        batch_sh = {k: repl for k in batch}
    else:
        batch_sh = {
            k: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            for k, v in batch.items()
        }
    batch = jax.device_put(batch, batch_sh)
    jax.block_until_ready(state.gen_params)
    _log(phase, "state + batch sharded")

    train_step, _ = make_gan_train_step(h, gen_tx, disc_tx)
    step_before = int(state.step)  # read BEFORE the step: state is donated
    with mesh:
        lowered = train_step.lower(state, batch)
        _log(phase, "traced")
        compiled = lowered.compile()
        try:
            txt = compiled.as_text()
            counts = {k: txt.count(f" {k}(") + txt.count(f" {k}-start(")
                      for k in ("all-reduce", "all-gather", "reduce-scatter",
                                "collective-permute")}
            _log(phase, "compiled; collectives in program: " +
                        " ".join(f"{k}={v}" for k, v in counts.items() if v))
        except Exception:
            _log(phase, "compiled")
        new_state, metrics = compiled(state, batch)
        jax.block_until_ready(new_state.gen_params)
    assert int(new_state.step) == step_before + 1
    _log(phase, f"OK disc_loss={float(metrics['loss_disc']):.3f} "
                f"gen_loss={float(metrics['loss_gen_total']):.3f}")


def run_prosody_phase(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dissc_tpu.models.prosody import LenPredictor
    from dissc_tpu.train.prosody_trainer import TrainState, make_len_steps

    phase = "prosody"
    n_model = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = _mesh(n_devices, n_model)
    _log(phase, f"mesh=({n_devices // n_model},{n_model}) "
                f"backend={jax.default_backend()}")

    model = LenPredictor(n_tokens=100, n_speakers=4)
    norm_stats = (jnp.float32(4.0), jnp.float32(2.0))
    B, T = max(2 * (n_devices // n_model), 2), 16
    vals = jnp.zeros((B, T), jnp.int32)
    lens = jnp.ones((B, T), jnp.float32)
    spk = jnp.zeros((B, 1), jnp.int32)
    variables = model.init(jax.random.key(1), vals[:1], spk[:1], norm_stats)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(3e-4), batch_stats=variables["batch_stats"],
    )
    _log(phase, "params initialized")
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, jax.tree_util.tree_map(lambda _: repl, state))

    def shard_b(v):
        return jax.device_put(
            v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))

    train_step, _ = make_len_steps(model, norm_stats)
    with mesh:
        state2, metrics = train_step(
            state, shard_b(vals), shard_b(lens), shard_b(spk), jax.random.key(2))
        jax.block_until_ready(state2.params)
    assert int(state2.step) == 1
    _log(phase, f"OK loss={float(metrics['Loss']):.3f}")


def run_serving_phase(n_devices: int) -> None:
    """Batch-sharded inference over a data-only mesh (multi-chip serving,
    the replacement for the reference's one-GPU-per-process inference
    pool, ``sr/inference.py:288-292``): the VocoderEngine synthesizes a
    1.5x-mesh batch of variable-length utterances — exercising the
    pad-to-mesh rounding — and must match the single-device engine.  The
    sharded forward is per-sample (no collectives), so this phase is
    immune to the in-process-communicator constraint."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dissc_tpu.infer.vocoder import VocoderEngine
    from dissc_tpu.models.hifigan import CodeGenerator

    phase = "serving"
    mesh = _mesh(n_devices, 1)
    _log(phase, f"mesh=({n_devices},1) backend={jax.default_backend()}")

    h = tiny_gan_config(batch_size=2)
    model = CodeGenerator(h)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8, 1), jnp.float32), jnp.zeros((1, 1), jnp.int32),
    )["params"]
    _log(phase, "params initialized")

    rng = np.random.default_rng(3)
    items = []
    for _ in range(n_devices + max(n_devices // 2, 1)):  # non-multiple of mesh
        T = int(rng.integers(4, 9))
        items.append({
            "code": rng.integers(0, h.num_embeddings, T).astype(np.int32),
            "f0": rng.normal(0, 1, (T, 1)).astype(np.float32),
            "spkr": rng.integers(0, 4, 1).astype(np.int32),
        })
    e1 = VocoderEngine(h, params, frame_buckets=(8,), stream_long=False)
    w1, _ = e1.synthesize_utterances(items, batch_size=len(items))
    _log(phase, "single-device engine done")
    eN = VocoderEngine(h, params, frame_buckets=(8,), stream_long=False,
                       mesh=mesh)
    wN, _ = eN.synthesize_utterances(items, batch_size=len(items))
    for a, b in zip(w1, wN):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)
    _log(phase, f"OK {len(items)} utterances sharded over {n_devices} "
                f"devices match the 1-device engine")


def run_multiproc_worker(n_local: int, n_procs: int, proc_id: int,
                         coordinator: str) -> None:
    """One process of the 2-process rendezvous phase.

    Mirrors the reference's ACTUAL multi-process shape
    (``sr/train.py:36-41``: one process per device, NCCL rendezvous,
    DistributedSampler shards): ``jax.distributed.initialize`` over a
    TCP coordinator, a global mesh spanning both processes' devices,
    per-process DISJOINT batch shards assembled with
    ``jax.make_array_from_process_local_data`` (the
    ``parallel/mesh.py::shard_batch`` multi-process path), and one full
    rhythm-predictor train step whose gradient psum crosses the process
    boundary through the gloo CPU collectives.
    """
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_procs, process_id=proc_id)
    phase = f"mp{proc_id}"
    _log(phase, f"rendezvous OK: process {jax.process_index()}/"
                f"{jax.process_count()} global_devices={jax.device_count()} "
                f"local={jax.local_device_count()}")
    assert jax.process_count() == n_procs
    assert jax.device_count() == n_local * n_procs

    import jax.numpy as jnp
    import numpy as np
    import optax

    from dissc_tpu.models.prosody import LenPredictor
    from dissc_tpu.parallel.mesh import create_mesh, shard_batch
    from dissc_tpu.train.prosody_trainer import TrainState, make_len_steps
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh()  # data axis spans all global devices
    model = LenPredictor(n_tokens=100, n_speakers=4)
    norm_stats = (jnp.float32(4.0), jnp.float32(2.0))
    T = 16
    b_global = 2 * jax.device_count()
    b_local = b_global // n_procs

    variables = model.init(jax.random.key(1), jnp.zeros((1, T), jnp.int32),
                           jnp.zeros((1, 1), jnp.int32), norm_stats)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(3e-4), batch_stats=variables["batch_stats"],
    )
    repl = NamedSharding(mesh, P())

    def to_global_replicated(x):
        # multi-process-safe replicated global array: identical host
        # value on every process (deterministic init above)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, repl, lambda idx: x[idx])

    state = jax.tree_util.tree_map(to_global_replicated, state)
    _log(phase, "replicated state built across processes")

    # disjoint per-process shard of a deterministic global batch
    rng = np.random.default_rng(7)
    vals_g = rng.integers(0, 100, (b_global, T)).astype(np.int32)
    lens_g = rng.integers(1, 5, (b_global, T)).astype(np.float32)
    spk_g = rng.integers(0, 4, (b_global, 1)).astype(np.int32)
    sl = slice(proc_id * b_local, (proc_id + 1) * b_local)
    batch = shard_batch(mesh, {"vals": vals_g[sl], "lens": lens_g[sl],
                               "spk": spk_g[sl]})
    assert batch["vals"].shape == (b_global, T)  # global shape, local shard
    _log(phase, f"global batch assembled from process-local data "
                f"(local {b_local} -> global {b_global})")

    train_step, _ = make_len_steps(model, norm_stats)
    with mesh:
        state2, metrics = train_step(
            state, batch["vals"], batch["lens"], batch["spk"], jax.random.key(2))
        jax.block_until_ready(state2.params)
    assert int(state2.step) == 1
    loss = float(metrics["Loss"])
    assert np.isfinite(loss)
    # fixed format: the launcher asserts both processes computed the SAME
    # loss (i.e. the gradient/metric psums really crossed processes)
    _log(phase, f"OK loss={loss:.6f}")


def run_multiproc_launcher(n_devices: int, n_procs: int) -> None:
    """Spawn the worker processes and verify they agree.

    Runs as its own subprocess phase (``--phase multiproc``) so the
    parent watchdog in ``__graft_entry__`` bounds the whole rendezvous.
    """
    import socket
    import subprocess

    n_local = n_devices // n_procs
    assert n_local * n_procs == n_devices

    with socket.socket() as s:  # find a free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    # rewrite the device count for the WORKERS (the parent env carries
    # the single-process count); keep the scheduler/watchdog flags
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    if env.get("FAKE_NPROC"):
        env["FAKE_NPROC"] = str(n_local)

    procs = []
    for pid in range(n_procs):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "dissc_tpu.parallel.dryrun",
             "--phase", "multiproc-worker", "--n-devices", str(n_local),
             "--n-procs", str(n_procs), "--proc-id", str(pid),
             "--coordinator", coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate()
        outs.append(out)
        for line in out.splitlines():
            print(f"  <w{pid}> {line}", flush=True)
        if p.returncode != 0:
            ok = False
            _log("multiproc", f"worker {pid} FAILED rc={p.returncode}")
    if not ok:
        raise RuntimeError("multiproc workers failed")
    losses = set()
    for out in outs:
        for line in out.splitlines():
            if "OK loss=" in line:
                losses.add(line.rsplit("loss=", 1)[1].strip())
    assert len(losses) == 1, (
        f"processes disagree on the psum'd loss: {losses}")
    _log("multiproc", f"OK {n_procs} processes x {n_local} devices, "
                      f"agreed loss={losses.pop()}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--phase", required=True,
                        choices=["prosody", "gan", "serving", "multiproc",
                                 "multiproc-worker"])
    parser.add_argument("--n-devices", type=int, default=8)
    parser.add_argument("--shard", default="tp",
                        choices=["tp", "dp", "replicated"])
    parser.add_argument("--n-procs", type=int, default=2)
    parser.add_argument("--proc-id", type=int, default=0)
    parser.add_argument("--coordinator", default="127.0.0.1:12765")
    args = parser.parse_args(argv)

    if args.phase == "multiproc":
        # launcher only spawns subprocesses — it must not touch jax
        run_multiproc_launcher(args.n_devices, args.n_procs)
        return 0

    _force_cpu(args.n_devices)
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the container sitecustomize force-registers the tunneled TPU
        # backend even when JAX_PLATFORMS=cpu is exported (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    if args.phase == "prosody":
        run_prosody_phase(args.n_devices)
    elif args.phase == "serving":
        run_serving_phase(args.n_devices)
    elif args.phase == "multiproc-worker":
        run_multiproc_worker(args.n_devices, args.n_procs, args.proc_id,
                             args.coordinator)
    else:
        run_gan_phase(args.n_devices, args.shard)
    return 0


if __name__ == "__main__":
    sys.exit(main())
