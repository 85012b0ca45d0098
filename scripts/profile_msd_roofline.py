"""MSD/MPD G-step roofline check: XLA cost-model FLOPs vs achieved time.

Decides whether the discriminator backward is worth more relowering work
(low MFU) or is already compute-bound (high MFU -> the remaining levers
are dtype or FLOP reduction, not scheduling).

Usage: python scripts/profile_msd_roofline.py [batch] [--s2d] [--bf16]
       [--fused]   # MSD via the whole-stack custom_vjp (models/msd_fused.py)
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.losses.gan import feature_loss, generator_loss
    from dissc_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 64
    s2d = "--s2d" in sys.argv
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    h = VocoderConfig(batch_size=B)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    y = jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3).astype(np.float32))
    yh = jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3).astype(np.float32))

    # --bf16 builds the modules with a bf16 compute dtype (params f32);
    # casting only the inputs would silently promote back to f32 convs
    ddt = jnp.bfloat16 if dtype == jnp.bfloat16 else None
    mpd = MultiPeriodDiscriminator(s2d=s2d, dtype=ddt)
    mpd_vars = mpd.init(key, y[:2], y[:2])
    msd = MultiScaleDiscriminator(s2d=s2d, dtype=ddt)
    msd_vars = msd.init(key, y[:2], y[:2])

    fused = "--fused" in sys.argv

    for name, mod, vars_ in (("MPD", mpd, mpd_vars), ("MSD", msd, msd_vars)):
        if fused and name == "MSD":
            from dissc_tpu.models.msd_fused import fold_msd_weights, msd_g_apply

            def g_step(a, b, vars_=vars_):
                def loss(bb):
                    weights, _ = fold_msd_weights(
                        vars_["params"], vars_["spectral"], train=True,
                        dtype=ddt)
                    rs, gs, fr, fg = msd_g_apply(weights, a, bb)
                    lg, _ = generator_loss([g.astype(jnp.float32) for g in gs])
                    return lg + feature_loss(
                        [[x.astype(jnp.float32) for x in f] for f in fr],
                        [[x.astype(jnp.float32) for x in f] for f in fg])
                return jax.grad(loss)(b)

            name = "MSD(fused)"
        else:
            def g_step(a, b, mod=mod, vars_=vars_):
                def loss(bb):
                    out = mod.apply(vars_, a.astype(dtype), bb.astype(dtype), True,
                                    mutable=[k for k in vars_ if k != "params"])
                    (rs, gs, fr, fg) = out[0] if isinstance(out, tuple) and len(out) == 2 else out
                    lg, _ = generator_loss([g.astype(jnp.float32) for g in gs])
                    return lg + feature_loss(
                        [[x.astype(jnp.float32) for x in f] for f in fr],
                        [[x.astype(jnp.float32) for x in f] for f in fg])
                return jax.grad(loss)(b)

        jitted = jax.jit(g_step)
        ca = jitted.lower(y, yh).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))

        import functools
        import time

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(a, b, n):
            def step(carry, _):
                bb, acc = carry
                g = g_step(a, bb)
                m = jnp.mean(g)
                return (bb * (1 + 1e-6 * m), acc + m), None

            (_, acc), _ = jax.lax.scan(step, (b, jnp.float32(0.0)), None, length=n)
            return acc

        ts = {}
        for n in (2, 12):
            float(chained(y, yh, n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(y, yh, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        dt = max(ts[12] - ts[2], 1e-9) / 10
        peak = 197e12 if dtype == jnp.bfloat16 else 98.5e12
        print(f"{name} G-step: {dt*1e3:6.1f} ms, {flops/1e12:.2f} TF "
              f"-> {flops/dt/1e12:6.1f} TF/s = {flops/dt/peak*100:5.1f}% of "
              f"{'bf16' if dtype == jnp.bfloat16 else 'f32'} peak; "
              f"{bytes_/1e9:.1f} GB -> {bytes_/dt/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
