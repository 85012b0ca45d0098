"""Serving-batch scaling probe: e2e conversion RTF at B in {8, 16, 32}.

The driver headline (bench.py) measures the full pipeline at B=8 (the
reference's worker count, sr/inference.py:353).  This probe asks how
much RTF/chip improves when a serving deployment batches harder —
same models, same 10.24 s utterances, same quiet-tunnel discipline
(distinct inputs per iteration, pipelined dispatch, final-output
materialisation, best accepted trial block).

Usage: python scripts/bench_batch_scaling.py [--batches 8 16 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="+", type=int, default=[8, 16, 32])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.infer.prosody import _convert_batch
    from dissc_tpu.models.hifigan import CodeGenerator
    from dissc_tpu.models.hubert import HubertConfig, HubertEncoder, kmeans_quantize
    from dissc_tpu.models.prosody import LenPredictor
    from dissc_tpu.train.prosody_trainer import build_pitch_model

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    n_speakers = 107
    T, OUT_T = 512, 1024
    WAV_N = T * 320 + 80

    hub_cfg = HubertConfig()
    hubert = HubertEncoder(hub_cfg)
    hub_params = hubert.init(key, jnp.zeros((1, WAV_N)))["params"]
    codebook = jnp.asarray(
        rng.standard_normal((100, hub_cfg.hidden_size)).astype(np.float32))
    len_model = LenPredictor(n_tokens=100, n_speakers=n_speakers)
    len_vars = len_model.init(key, jnp.zeros((1, T), jnp.int32),
                              jnp.zeros((1, 1), jnp.int32),
                              (jnp.float32(4.0), jnp.float32(2.0)))
    pitch_model = build_pitch_model("new", 100, n_speakers)
    pitch_vars = pitch_model.init(key, jnp.zeros((1, OUT_T), jnp.int32),
                                  jnp.zeros((1, 1), jnp.int32))
    id2mean = jnp.asarray(rng.uniform(100, 250, n_speakers).astype(np.float32))
    id2std = jnp.asarray(rng.uniform(10, 40, n_speakers).astype(np.float32))
    h = VocoderConfig()
    voc = CodeGenerator(h)
    voc_params = voc.init(key, jnp.zeros((1, OUT_T), jnp.int32),
                          jnp.zeros((1, OUT_T, 1), jnp.float32),
                          jnp.zeros((1, 1), jnp.int32))["params"]
    voc_apply = jax.jit(lambda p, c, f, s: voc.apply({"params": p}, c, f, s))
    encode = jax.jit(
        lambda p, wav: kmeans_quantize(hubert.apply({"params": p}, wav), codebook))

    results = {}
    for B in args.batches:
        lengths = np.full((B,), T, np.int32)
        spk = rng.integers(0, n_speakers, (B, 1)).astype(np.int32)

        def convert(wavs, lengths, spk):
            seqs = encode(hub_params, wavs)[:, :T]
            out_seqs, out_lens, f0 = _convert_batch(
                len_model, len_vars, (jnp.float32(4.0), jnp.float32(2.0)),
                pitch_model, pitch_vars, id2mean, id2std,
                seqs, lengths, spk,
                in_cap=T, out_cap=OUT_T, norm_pitch=False, n_tokens=100)
            return voc_apply(voc_params, out_seqs, f0[..., None], spk), out_lens

        iter_args = []
        for it in range(args.iters + 1):
            w = (rng.standard_normal((B, WAV_N)) * 0.1).astype(np.float32)
            iter_args.append((jnp.asarray(w), jnp.asarray(lengths),
                              jnp.asarray(spk)))
        t0 = time.time()
        wav, _ = convert(*iter_args[0])
        jax.block_until_ready(wav)
        compile_s = time.time() - t0
        audio_s = np.asarray(wav).size / 16000.0

        best_pipe, best_lat = None, None
        for trial in range(args.trials):
            t0 = time.time()
            for it in range(1, args.iters + 1):
                w, ol = convert(*iter_args[it])
                jax.block_until_ready((w, ol))
            lat = (time.time() - t0) / (audio_s * args.iters)
            t0 = time.time()
            outs = [convert(*iter_args[it]) for it in range(1, args.iters + 1)]
            _ = np.asarray(outs[-1][0][0, :8])
            pipe = (time.time() - t0) / (audio_s * args.iters)
            ok = pipe <= lat * 1.2
            print(f"B={B} trial {trial}: latency {lat:.6f} pipelined {pipe:.6f}"
                  f"{'' if ok else ' [REJECTED]'}", file=sys.stderr)
            if ok:
                best_pipe = pipe if best_pipe is None else min(best_pipe, pipe)
                best_lat = lat if best_lat is None else min(best_lat, lat)
        results[B] = (best_pipe, best_lat, compile_s)
        print(f"B={B}: pipelined rtf {best_pipe}, latency-incl {best_lat}, "
              f"compile {compile_s:.1f}s, {audio_s:.1f} audio-s/iter",
              file=sys.stderr)

    print("\n| B | pipelined RTF | vs 0.05 | latency-incl RTF |")
    print("|---|---|---|---|")
    for B, (p, l, _) in results.items():
        if p is not None:
            print(f"| {B} | {p:.6f} | {0.05/p:.0f}x | {l:.6f} |")


if __name__ == "__main__":
    main()
