"""Full-generator f32 vs bf16 A/B on the current device.

Round-1 measured the bf16 trunk 5x SLOWER than f32 (RTF 0.077 vs
0.0152) with the lhs_dilation ConvTranspose lowering.  With the
polyphase rewrite there is no input dilation left; this script
re-measures the full CodeGenerator forward in both dtypes with the
chained-scan discipline to settle whether bf16 should be the inference
default.

Usage: python scripts/bench_generator_dtype.py [T_codes] [batch]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(op, args, n_lo=4, n_hi=36, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(args, n):
        def step(carry, _):
            a, acc = carry
            m = jnp.mean(op(*a))
            bumped = (a[0], a[1] * (1 + 1e-6 * m), a[2])
            return (bumped, acc + m), None

        (_, acc), _ = jax.lax.scan(step, (args, jnp.float32(0.0)), None, length=n)
        return acc

    ts = {}
    for n in (n_lo, n_hi):
        float(chained(args, n))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(args, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return max(ts[n_hi] - ts[n_lo], 0.0) / (n_hi - n_lo)


def main():
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.models.hifigan import CodeGenerator

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    code = jnp.asarray(rng.integers(0, 100, (B, T)).astype(np.int32))
    f0 = jnp.asarray(rng.normal(0, 1, (B, T, 1)).astype(np.float32))
    spk = jnp.asarray(rng.integers(0, 100, (B, 1)).astype(np.int32))
    audio_s = B * T * 320 / 16000
    print(f"device={jax.devices()[0].platform} B={B} T={T} ({audio_s:.0f}s audio)")

    for name in ("float32", "bfloat16"):
        h = VocoderConfig(compute_dtype=name)
        voc = CodeGenerator(h)
        params = voc.init(key, code, f0, spk)["params"]
        op = lambda c, f, s: voc.apply({"params": params}, c, f, s).astype(jnp.float32)
        dt = chain_time(op, (code, f0, spk))
        print(f"{name:9s}: {dt*1e3:8.2f} ms/fwd  rtf {dt/audio_s:.6f}")


if __name__ == "__main__":
    main()
