"""Stage-level timing of the conversion pipeline on the current device.

Times (a) the prosody stage (dedup -> len CNN -> carryover -> re-time ->
pitch CNN), (b) the vocoder, and (c) the fused-vs-unfused mel kernels,
each with distinct inputs per iteration and per-call blocking — the
measurement discipline bench.py uses.  Run with DISSC_TPU_TRACE_DIR set
to also dump a jax.profiler trace.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_list, warmup_args):
    out = fn(*warmup_args)
    jax.block_until_ready(out)
    start = time.time()
    for args in args_list:
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - start) / len(args_list)


def main():
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.infer.prosody import _convert_batch
    from dissc_tpu.models.hifigan import CodeGenerator
    from dissc_tpu.models.prosody import LenPredictor
    from dissc_tpu.train.prosody_trainer import build_pitch_model
    from dissc_tpu.audio.mel import mel_spectrogram
    from dissc_tpu.kernels.mel_kernel import mel_spectrogram_pallas

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    B, T, OUT_T = 8, 512, 1024
    n_speakers = 107

    len_model = LenPredictor(n_tokens=100, n_speakers=n_speakers)
    len_vars = len_model.init(key, jnp.zeros((1, T), jnp.int32),
                              jnp.zeros((1, 1), jnp.int32), (4.0, 2.0))
    pitch_model = build_pitch_model("new", 100, n_speakers)
    pitch_vars = pitch_model.init(key, jnp.zeros((1, OUT_T), jnp.int32),
                                  jnp.zeros((1, 1), jnp.int32))
    id2mean = jnp.asarray(rng.uniform(100, 250, n_speakers).astype(np.float32))
    id2std = jnp.asarray(rng.uniform(10, 40, n_speakers).astype(np.float32))

    def prosody(seqs, lengths, spk):
        return _convert_batch(
            len_model, len_vars, (jnp.float32(4.0), jnp.float32(2.0)),
            pitch_model, pitch_vars, id2mean, id2std, seqs, lengths, spk,
            in_cap=T, out_cap=OUT_T, norm_pitch=False, n_tokens=100,
        )

    def seq_args(i):
        s = rng.integers(0, 100, (B, T)).astype(np.int32)
        s[:, 0] = i % 100
        return (jnp.asarray(s), jnp.full((B,), T, jnp.int32),
                jnp.asarray(rng.integers(0, n_speakers, (B, 1)).astype(np.int32)))

    args = [seq_args(i) for i in range(6)]
    t_pros = timeit(prosody, args[1:], args[0])
    print(f"prosody stage:   {t_pros*1e3:8.2f} ms / batch of {B}x{T} frames")

    h = VocoderConfig()
    voc = CodeGenerator(h)
    voc_params = voc.init(key, jnp.zeros((B, OUT_T), jnp.int32),
                          jnp.zeros((B, OUT_T, 1)), jnp.zeros((B, 1), jnp.int32))["params"]
    voc_fn = jax.jit(lambda c, f, s: voc.apply({"params": voc_params}, c, f, s))

    def voc_args(i):
        c = rng.integers(0, 100, (B, OUT_T)).astype(np.int32)
        c[:, 0] = i % 100
        return (jnp.asarray(c), jnp.asarray(rng.normal(0, 1, (B, OUT_T, 1)).astype(np.float32)),
                jnp.zeros((B, 1), jnp.int32))

    vargs = [voc_args(i) for i in range(6)]
    t_voc = timeit(voc_fn, vargs[1:], vargs[0])
    audio_s = B * OUT_T * 320 / 16000
    print(f"vocoder stage:   {t_voc*1e3:8.2f} ms / {audio_s:.0f} s audio "
          f"(rtf {t_voc/audio_s:.5f})")

    y = [(jnp.asarray((rng.standard_normal((B, OUT_T * 320)) * 0.3)
                      .astype(np.float32)),) for _ in range(4)]
    mel_x = jax.jit(lambda w: mel_spectrogram(w))
    mel_p = jax.jit(lambda w: mel_spectrogram_pallas(w))
    t_x = timeit(mel_x, y[1:], y[0])
    t_p = timeit(mel_p, y[1:], y[0])
    print(f"mel (XLA):       {t_x*1e3:8.2f} ms;  mel (pallas): {t_p*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
