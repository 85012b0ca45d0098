"""GAN train-step timing with the step chained INSIDE one jitted scan.

bench_train_step.py times 10 python-level dispatches (the serving
pattern); on the tunneled backend each dispatch carries host overhead.
Here the whole step runs under ``lax.scan`` over a stacked batch axis,
so the measured delta is pure device time — the difference between the
two is the per-dispatch overhead.  Also times the D-step and G-step
gradients separately (grad wrt PARAMS, so nothing is dead-code
eliminated).

Usage: python scripts/profile_train_step2.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf) if hasattr(leaf, "dtype") else 0.0)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    args_ = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args_[0]) if args_ else 64
    h = VocoderConfig(batch_size=B, disc_s2d="--s2d" in sys.argv,
                      compute_dtype="bfloat16" if "--bf16" in sys.argv
                      else "float32",
                      disc_compute_dtype="bfloat16" if "--dbf16" in sys.argv
                      else "float32")
    seg_frames = h.segment_size // h.code_hop_size
    state, gen_tx, disc_tx = init_gan_state(h, jax.random.key(0), seg_frames)
    train_step, _ = make_gan_train_step(h, gen_tx, disc_tx)
    rng = np.random.default_rng(0)

    def make_batches(n):
        return {
            "code": jnp.asarray(rng.integers(0, 100, (n, B, seg_frames)).astype(np.int32)),
            "f0": jnp.asarray(rng.normal(0, 1, (n, B, seg_frames, 1)).astype(np.float32)),
            "spkr": jnp.asarray(rng.integers(0, 100, (n, B, 1)).astype(np.int32)),
            "audio": jnp.asarray((rng.standard_normal((n, B, h.segment_size)) * 0.3)
                                 .astype(np.float32)),
        }

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(state, batches, n):
        def step(s, b):
            s2, m = train_step(s, b)
            return s2, m["loss_disc"]

        final, losses = jax.lax.scan(step, state, batches)
        return jax.tree.leaves(final.gen_params)[0], losses

    for n in (2, 12):
        batches = make_batches(n)
        t = timed(lambda s=state, b=batches, n=n: chained(s, b, n))
        print(f"scan n={n:2d}: {t:.3f}s total", flush=True)
        if n == 2:
            t2 = t
        else:
            dt = (t - t2) / 10
            print(f"pure-device step: {dt*1e3:.1f} ms/step "
                  f"({1/dt:.2f} steps/s; 400k ~= {400000*dt/3600:.1f} h)", flush=True)


if __name__ == "__main__":
    main()
