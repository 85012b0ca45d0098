"""Per-stage timing of the HiFi-GAN generator on the current device.

Times each upsample stage (ConvT alone and its MRF bank) plus dtype
variants, using the CLAUDE.md tunnel-safe discipline: chain n executions
inside one jitted ``lax.scan`` (each iteration's input depends on the
previous output, so nothing can be elided), fetch only the final scalar,
and report (t(n=10) - t(n=2)) / 8 so dispatch/RTT cancels.

This is the diagnostic for the bf16-slower-than-f32 finding and the
guide for which stages deserve Pallas kernels.

Usage: python scripts/profile_generator_stages.py [T_frames] [batch] [dtypes]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(op, x0, n_lo=4, n_hi=68, repeats=3):
    """Per-execution seconds of ``op`` via chained scan timing.

    n_hi - n_lo executions must dwarf the ~140 ms tunnel RTT jitter, so
    the spread is large and each point is a min over ``repeats``."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x0, n):
        def step(carry, _):
            x, acc = carry
            m = jnp.mean(op(x))
            return (x0 * (1 + 1e-6 * m), acc + m), None

        (_, acc), _ = jax.lax.scan(step, (x0, jnp.float32(0.0)), None, length=n)
        return acc

    ts = {}
    for n in (n_lo, n_hi):
        float(chained(x0, n))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(x0, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return max(ts[n_hi] - ts[n_lo], 0.0) / (n_hi - n_lo)


def main():
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.models.hifigan import ResBlock1
    from dissc_tpu.models.layers import ConvTranspose1d, hifigan_init, leaky_relu

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtypes = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["f32", "bf16"])
    h = VocoderConfig()
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    print(f"device={jax.devices()[0].platform} B={B} T_codes={T}", flush=True)

    for dtype_name in dtypes:
        dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
        for poly in (True, False):
            print(f"--- {dtype_name} polyphase={poly} ---", flush=True)
            ch_in = h.upsample_initial_channel
            t = T
            total = 0.0
            for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
                ch = h.upsample_initial_channel // (2 ** (i + 1))
                convt = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                        norm="weight", kernel_init=hifigan_init(),
                                        dtype=dtype, polyphase=poly)
                cvars = convt.init(key, jnp.zeros((1, 8, ch_in)))
                x_in = jnp.asarray(rng.standard_normal((B, t, ch_in)).astype(np.float32) * 0.1)
                dt_c = chain_time(lambda x: convt.apply(cvars, leaky_relu(x)).astype(jnp.float32), x_in)

                dt_m = dt_pk = 0.0
                if poly:  # MRF has no polyphase variant; time once per dtype
                    from dissc_tpu.models.hifigan import _packed_mrf

                    mods = [ResBlock1(ch, rk, (1, 3, 5), dtype=dtype)
                            for rk in h.resblock_kernel_sizes]
                    mvars = [m.init(key, jnp.zeros((1, 8, ch))) for m in mods]

                    def mrf(x, mods=mods, mvars=mvars):
                        acc = None
                        for m, v in zip(mods, mvars):
                            y = m.apply(v, x)
                            acc = y if acc is None else acc + y
                        return (acc / len(mods)).astype(jnp.float32)

                    def mrf_packed(x, mods=mods, mvars=mvars):
                        banks = [m.apply(v, x, collect=True)
                                 for m, v in zip(mods, mvars)]
                        return _packed_mrf(x, banks, (1, 3, 5)).astype(jnp.float32)

                    x_out = jnp.asarray(rng.standard_normal((B, t * u, ch)).astype(np.float32) * 0.1)
                    dt_m = chain_time(mrf, x_out)
                    dt_pk = (chain_time(mrf_packed, x_out)
                             if (128 % ch == 0 and (t * u) % (128 // ch) == 0)
                             else float("nan"))
                total += dt_c + min(dt_m, dt_pk if dt_pk == dt_pk else dt_m)
                print(f"stage {i}: convT {ch_in:4d}->{ch:3d} x{u} k{k:2d} @T={t:6d}: "
                      f"{dt_c*1e3:8.2f} ms"
                      + (f" | MRF {ch:3d}ch @T={t*u:6d}: seq {dt_m*1e3:8.2f} ms"
                         f" packed {dt_pk*1e3:8.2f} ms" if poly else ""),
                      flush=True)
                ch_in = ch
                t *= u
            print(f"sum: {total*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
