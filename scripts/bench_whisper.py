"""Native Whisper medium.en encoder throughput on the current device.

The eval pipeline's ASR cost is dominated by the encoder (1500
positions x 24 layers per 30 s chunk); the decoder scan adds
max_len sequential steps.  Random-init weights — identical compute to
the released checkpoint.  Prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dissc_tpu.models.whisper import (
        CHUNK_SAMPLES, WhisperConfig, encode, greedy_decode, init_params,
        log_mel_spectrogram,
    )
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = WhisperConfig()  # medium.en dims
    params = jax.device_put(init_params(cfg, jax.random.key(0)))
    rng = np.random.default_rng(0)
    B = 4

    fwd = jax.jit(lambda p, m: encode(p, cfg, m))
    mels = [log_mel_spectrogram(jnp.asarray(
        (rng.standard_normal((B, CHUNK_SAMPLES)) * 0.1).astype(np.float32)))
        for _ in range(6)]
    out = fwd(params, mels[0])
    jax.block_until_ready(out)
    print(f"encoder compiled; out {out.shape}", file=sys.stderr)

    t0 = time.time()
    outs = [fwd(params, m) for m in mels[1:]]
    _ = np.asarray(outs[-1][0, :4, :4])  # force the FINAL result
    dt = time.time() - t0
    audio_s = 30.0 * B * (len(mels) - 1)
    enc_rtf = dt / audio_s

    # greedy decode: 64 generated tokens per 30 s chunk (typical
    # utterance-scale budget), KV-cached scan
    dec = jax.jit(lambda p, m: greedy_decode(
        p, cfg, m, jnp.asarray([50257, 50362], jnp.int32), 50256, max_len=64))
    toks = dec(params, mels[0])
    jax.block_until_ready(toks)
    print("decoder compiled", file=sys.stderr)
    t0 = time.time()
    outs = [dec(params, m) for m in mels[1:3]]
    _ = np.asarray(outs[-1])
    dec_dt = time.time() - t0
    dec_rtf = dec_dt / (30.0 * B * 2)

    print(json.dumps({
        "whisper_encoder_rtf": round(enc_rtf, 6),
        "encoder_audio_s_per_s": round(audio_s / dt, 1),
        "e2e_greedy64_rtf": round(dec_rtf, 6),
    }))


if __name__ == "__main__":
    main()
