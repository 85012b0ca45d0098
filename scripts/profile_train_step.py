"""Component-level timing of the GAN train step (full VCTK config).

Times, each as its own jitted program with chained-scan discipline:
generator forward, generator fwd+bwd (vjp round trip), fused mel
(fwd and fwd+bwd), MPD forward, MSD forward, discriminator D-step
grad, and the full train step — so the 240 ms/step budget can be
attributed and attacked.

Usage: python scripts/profile_train_step.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(op, args, n_lo=2, n_hi=12, repeats=3):
    """args: tuple of arrays; op(*args) -> scalar-reducible pytree."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(args, n):
        def step(carry, _):
            a, acc = carry
            out = op(*a)
            m = jnp.mean(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32))
            bumped = tuple(
                x * (1 + 1e-6 * m) if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in a)
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
    from dissc_tpu.models.discriminators import (MultiPeriodDiscriminator,
                                                 MultiScaleDiscriminator)
    from dissc_tpu.train.vocoder_trainer import _pick_mel_fn

    args_ = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args_[0]) if args_ else 64
    h = VocoderConfig(batch_size=B, disc_s2d="--s2d" in sys.argv)
    Tc = h.segment_size // h.code_hop_size  # 28 code frames
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    print(f"device={jax.devices()[0].platform} B={B} seg={h.segment_size}", flush=True)

    voc = CodeGenerator(h)
    code = jnp.asarray(rng.integers(0, 100, (B, Tc)).astype(np.int32))
    f0 = jnp.asarray(rng.normal(0, 1, (B, Tc, 1)).astype(np.float32))
    spk = jnp.asarray(rng.integers(0, 100, (B, 1)).astype(np.int32))
    params = voc.init(key, code, f0, spk)["params"]
    y = jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3).astype(np.float32))

    dt = chain_time(lambda f: voc.apply({"params": params}, code, f, spk), (f0,))
    print(f"generator fwd:        {dt*1e3:8.1f} ms", flush=True)

    def gen_fwd_bwd(f):
        yh, vjp = jax.vjp(lambda ff: voc.apply({"params": params}, code, ff, spk), f)
        (df,) = vjp(jnp.ones_like(yh))
        return jnp.mean(yh) + jnp.mean(df)

    dt = chain_time(gen_fwd_bwd, (f0,))
    print(f"generator fwd+bwd:    {dt*1e3:8.1f} ms", flush=True)

    mel_fn = _pick_mel_fn(h)
    dt = chain_time(lambda w: mel_fn(w), (y,))
    print(f"mel fwd (one input):  {dt*1e3:8.1f} ms", flush=True)
    dt = chain_time(lambda w: jax.grad(lambda ww: jnp.mean(jnp.abs(mel_fn(ww))))(w), (y,))
    print(f"mel fwd+bwd:          {dt*1e3:8.1f} ms", flush=True)

    mpd = MultiPeriodDiscriminator(s2d=h.disc_s2d)
    mpd_vars = mpd.init(key, y[:2], y[:2])
    msd = MultiScaleDiscriminator(s2d=h.disc_s2d)
    msd_vars = msd.init(key, y[:2], y[:2])

    def mpd_fwd(a, b):
        p_rs, p_gs, _, _ = mpd.apply(mpd_vars, a, b, False)
        return p_rs[0]

    def msd_fwd(a, b):
        s_rs, s_gs, _, _ = msd.apply(msd_vars, a, b, False)
        return s_rs[0]

    yh = jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3).astype(np.float32))
    dt = chain_time(mpd_fwd, (y, yh))
    print(f"MPD fwd:              {dt*1e3:8.1f} ms", flush=True)
    dt = chain_time(msd_fwd, (y, yh))
    print(f"MSD fwd:              {dt*1e3:8.1f} ms", flush=True)

    def disc_fwd_bwd(a, b):
        def loss(bb):
            return jnp.mean(mpd_fwd(a, bb)) + jnp.mean(msd_fwd(a, bb))
        return jax.grad(loss)(b)

    dt = chain_time(disc_fwd_bwd, (y, yh))
    print(f"MPD+MSD fwd+bwd(x):   {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__" and "--grads" not in sys.argv:
    main()


def main2():
    """Gradient-true discriminator timings (grad wrt PARAMS, LS-GAN loss)."""
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.models.discriminators import (MultiPeriodDiscriminator,
                                                 MultiScaleDiscriminator)
    from dissc_tpu.losses.gan import discriminator_loss, feature_loss, generator_loss

    args = [a for a in sys.argv[1:] if a != "--grads"]
    args = [a for a in args if not a.startswith("--")]
    B = int(args[0]) if args else 64
    h = VocoderConfig(batch_size=B, disc_s2d="--s2d" in sys.argv)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    y = jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3).astype(np.float32))
    yh = jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.3).astype(np.float32))

    mpd = MultiPeriodDiscriminator(s2d=h.disc_s2d)
    mpd_vars = mpd.init(key, y[:2], y[:2])
    msd = MultiScaleDiscriminator(s2d=h.disc_s2d)
    msd_vars = msd.init(key, y[:2], y[:2])

    for name, mod, vars_ in (("MPD", mpd, mpd_vars), ("MSD", msd, msd_vars)):
        def d_step(a, b, mod=mod, vars_=vars_):
            def loss(params):
                out = mod.apply({**vars_, "params": params}, a,
                                jax.lax.stop_gradient(b), True,
                                mutable=[k for k in vars_ if k != "params"])
                (rs, gs, _, _) = out[0] if isinstance(out, tuple) and len(out) == 2 else out
                l, _, _ = discriminator_loss(rs, gs)
                return l
            return jax.grad(loss)(vars_["params"])

        dt = chain_time(d_step, (y, yh))
        print(f"{name} D-step grad(params):  {dt*1e3:8.1f} ms", flush=True)

        def g_step(a, b, mod=mod, vars_=vars_):
            def loss(bb):
                out = mod.apply(vars_, a, bb, True,
                                mutable=[k for k in vars_ if k != "params"])
                (rs, gs, fr, fg) = out[0] if isinstance(out, tuple) and len(out) == 2 else out
                lg, _ = generator_loss(gs)
                return lg + feature_loss(fr, fg)
            return jax.grad(loss)(b)

        dt = chain_time(g_step, (y, yh))
        print(f"{name} G-step grad(y_hat):  {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__" and "--grads" in sys.argv:
    main2()
