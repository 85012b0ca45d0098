"""YAAPT F0 tracker throughput on the current device (VERDICT r4 item 8).

The reference's encode step always runs pYAAPT alongside HuBERT
(``data/encode.py:21-33``), so F0 extraction is part of the
data-preparation critical path even though the serving RTF headline
(pred-pitch conversion) excludes it.  This bench measures the native
tracker end to end — host FIR prefilter + jitted NCCF/SHC/Viterbi — per
second of audio, on speech-like harmonic input (YAAPT's runtime is
input-independent: fixed frame counts per length).

Prints one JSON line: {"yaapt_rtf": ..., "audio_s_per_s": ...}.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def speech_like(rng, n, sr=16000):
    t = np.arange(n) / sr
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 1.3 * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    x = sum((0.5 / k) * np.sin(k * phase) for k in range(1, 6))
    env = 0.4 + 0.6 * (np.sin(2 * np.pi * 2.1 * t) > -0.4)
    return (x * env + 0.01 * rng.standard_normal(n)).astype(np.float32)


def main():
    from dissc_tpu.audio.yaapt import yaapt_f0
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    sr, dur = 16000, 10.0
    n = int(sr * dur)
    wavs = [speech_like(rng, n) for _ in range(9)]

    f0 = yaapt_f0(wavs[0], sr)  # compile
    print(f"compiled; {len(f0)} frames, voiced {float((f0 > 0).mean()):.2f}",
          file=sys.stderr)

    t0 = time.time()
    for w in wavs[1:]:
        yaapt_f0(w, sr)
    dt = time.time() - t0
    audio_s = dur * (len(wavs) - 1)
    rtf = dt / audio_s
    print(json.dumps({"yaapt_rtf": round(rtf, 6),
                      "audio_s_per_s": round(audio_s / dt, 1),
                      "per_10s_utt_ms": round(dt / (len(wavs) - 1) * 1e3, 1)}))


if __name__ == "__main__":
    main()
