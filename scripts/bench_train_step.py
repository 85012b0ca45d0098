"""GAN train-step throughput on the current device (full VCTK config).

Reference headline: 400k steps in "a couple of days" on 2 GPUs
(README.md:192) ~= 2.3 steps/s.  Prints steps/s and the projected
wall-clock for the 400k-step budget on this chip.

Flags: [batch] [--s2d] [--disc_bf16] [--trunk_bf16] [--msd_fused]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch_size = int(pos[0]) if pos else 16
    h = VocoderConfig(
        batch_size=batch_size,
        disc_s2d="--s2d" in sys.argv,
        disc_compute_dtype="bfloat16" if "--disc_bf16" in sys.argv else "float32",
        compute_dtype="bfloat16" if "--trunk_bf16" in sys.argv else "float32",
        msd_fused_gstep="--msd_fused" in sys.argv,
    )
    print(f"config: s2d={h.disc_s2d} msd_fused={h.msd_fused_gstep} disc_dtype={h.disc_compute_dtype} "
          f"trunk_dtype={h.compute_dtype}", flush=True)
    seg_frames = h.segment_size // h.code_hop_size

    state, gen_tx, disc_tx = init_gan_state(h, jax.random.key(0), seg_frames)
    train_step, _ = make_gan_train_step(h, gen_tx, disc_tx)

    rng = np.random.default_rng(0)

    def make_batch(i):
        return {
            "code": jnp.asarray(rng.integers(0, 100, (batch_size, seg_frames))
                                .astype(np.int32)),
            "f0": jnp.asarray(rng.normal(0, 1, (batch_size, seg_frames, 1))
                              .astype(np.float32)),
            "spkr": jnp.asarray(rng.integers(0, 100, (batch_size, 1)).astype(np.int32)),
            "audio": jnp.asarray((rng.standard_normal((batch_size, h.segment_size))
                                  * 0.3).astype(np.float32)),
        }

    batches = [make_batch(i) for i in range(12)]
    t0 = time.time()
    state, metrics = train_step(state, batches[0])
    print(f"compile + first step: {time.time()-t0:.1f}s "
          f"(first loss_disc {float(metrics['loss_disc']):.3f})")

    # chain n steps, then force-materialise the FINAL state (a reduction
    # over a param leaf) — block_until_ready on an intermediate scalar
    # can return early on remote backends, which under-reports wildly.
    n = 10
    start = time.time()
    for i in range(1, n + 1):
        state, metrics = train_step(state, batches[i])
    leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
    _ = float(jnp.sum(leaf))
    dt = (time.time() - start) / n
    print(f"train step: {dt*1e3:.1f} ms/step @ batch {batch_size} "
          f"({1/dt:.2f} steps/s; 400k steps ~= {400000*dt/3600:.1f} h)")

    # MFU accounting: XLA's own cost model for the whole compiled step.
    # Peak for one TPU v5e chip: 197 TFLOP/s (bf16 MXU); f32 convs run
    # at half MXU rate, so f32-dominated MFU vs the bf16 peak is
    # conservative (a 50% f32 MFU is the f32 roofline).
    try:
        ca = train_step.lower(state, batches[11]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = 197e12
        if flops > 0:
            print(f"flops/step: {flops/1e12:.3f} TF; achieved "
                  f"{flops/dt/1e12:.1f} TF/s; MFU(bf16 peak) "
                  f"{flops/dt/peak*100:.1f}%  MFU(f32 roofline) "
                  f"{flops/dt/(peak/2)*100:.1f}%")
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
