"""Benchmark: end-to-end conversion RTF per chip.

Measures the FULL DISSC conversion compute path on device — HuBERT-base
encode + k-means quantise -> dedup -> rhythm predict -> carryover ->
re-time -> pitch predict -> HiFi-GAN vocode (full 512-channel VCTK
config) — on a batch of ~10 s utterances, and reports real-time-factor
per chip (seconds of compute per second of generated audio).  Baseline
target: RTF < 0.05 on one TPU v5e chip (BASELINE.md north star);
vs_baseline = 0.05 / measured (>1 is better).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
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
    B, T = 8, 512  # 8 utterances x 10.24 s (512 frames @ 50 Hz)
    OUT_T = 1024
    WAV_N = T * 320 + 80  # conv frontend needs a few extra samples for 512 frames

    # full-size HuBERT-base + 100-cluster codebook (random weights: the
    # compute is identical to the released checkpoint's)
    hub_cfg = HubertConfig()
    hubert = HubertEncoder(hub_cfg)
    hub_params = hubert.init(key, jnp.zeros((1, WAV_N)))["params"]
    codebook = jnp.asarray(rng.standard_normal((100, hub_cfg.hidden_size))
                           .astype(np.float32))

    # prosody models
    len_model = LenPredictor(n_tokens=100, n_speakers=n_speakers)
    seq0 = jnp.zeros((1, T), jnp.int32)
    spk0 = jnp.zeros((1, 1), jnp.int32)
    len_vars = len_model.init(key, seq0, spk0, (jnp.float32(4.0), jnp.float32(2.0)))
    pitch_model = build_pitch_model("new", 100, n_speakers)
    pitch_vars = pitch_model.init(key, jnp.zeros((1, OUT_T), jnp.int32), spk0)
    id2mean = jnp.asarray(rng.uniform(100, 250, n_speakers).astype(np.float32))
    id2std = jnp.asarray(rng.uniform(10, 40, n_speakers).astype(np.float32))

    # vocoder (full-size VCTK config).  f32 trunk: the dtype the <1e-4
    # reference-waveform parity gate is proven on.  bf16 is 1.35-1.38x
    # faster with the polyphase/packed lowering (PERFORMANCE.md,
    # scripts/bench_generator_dtype.py) and stays opt-in via
    # compute_dtype for deployments that accept bf16 rounding.
    h = VocoderConfig()
    voc = CodeGenerator(h)
    code0 = jnp.zeros((B, OUT_T), jnp.int32)
    f00 = jnp.zeros((B, OUT_T, 1), jnp.float32)
    spk_b = jnp.zeros((B, 1), jnp.int32)
    voc_params = voc.init(key, code0, f00, spk_b)["params"]
    voc_apply = jax.jit(lambda p, c, f, s: voc.apply({"params": p}, c, f, s))

    lengths = np.full((B,), T, np.int32)
    spk = rng.integers(0, n_speakers, (B, 1)).astype(np.int32)

    encode = jax.jit(
        lambda p, wav: kmeans_quantize(hubert.apply({"params": p}, wav), codebook)
    )

    def convert(wavs, lengths, spk):
        seqs = encode(hub_params, wavs)[:, :T]
        out_seqs, out_lens, f0 = _convert_batch(
            len_model, len_vars, (jnp.float32(4.0), jnp.float32(2.0)),
            pitch_model, pitch_vars, id2mean, id2std,
            seqs, lengths, spk,
            in_cap=T, out_cap=OUT_T, norm_pitch=False, n_tokens=100,
        )
        wav = voc_apply(voc_params, out_seqs, f0[..., None], spk)
        return wav, out_lens

    # distinct speech-scale waveform inputs per iteration so no
    # dispatch-level caching can short-circuit the measurement
    n_iters = 10
    iter_args = []
    for it in range(n_iters + 1):
        w = (rng.standard_normal((B, WAV_N)) * 0.1).astype(np.float32)
        iter_args.append((jnp.asarray(w), jnp.asarray(lengths), jnp.asarray(spk)))

    wav, out_lens = convert(*iter_args[0])  # compile
    jax.block_until_ready(wav)

    # Audio-seconds denominator: the vocoder always synthesizes exactly
    # B x OUT_T frames (the engine's bucket), so count what was actually
    # generated — not the predictor's unclamped out_lens, which can
    # exceed OUT_T with random weights and flatter the RTF.
    wav_np = np.asarray(wav)
    audio_seconds_per_iter = wav_np.size / 16000.0

    import sys

    def measure_latency():
        # latency-inclusive: block every call (per-batch round trip
        # through the ~140 ms-RTT tunnel)
        start = time.time()
        for it in range(1, n_iters + 1):
            w, ol = convert(*iter_args[it])
            jax.block_until_ready((w, ol))
        return (time.time() - start) / (audio_seconds_per_iter * n_iters)

    def measure_pipelined():
        # steady-state throughput: overlap dispatches (how a serving
        # pipeline runs).  Completion is forced by fetching a slice of
        # the LAST output — the device stream is ordered, so the last
        # result existing implies every earlier one finished
        # (block_until_ready alone can return early on this backend).
        start = time.time()
        outs = [convert(*iter_args[it]) for it in range(1, n_iters + 1)]
        _ = np.asarray(outs[-1][0][0, :8])
        return time.time() - start

    # The tunnel's per-call latency varies wildly with load (round-2
    # lesson: a single noisy trial block recorded a 4x phantom
    # regression).  Run several independent trial blocks and take the
    # best pipelined block — tunnel interference only ever ADDS time, so
    # the minimum is the closest observation of true device throughput.
    # Sanity invariant per block: overlapped dispatch cannot beat ~the
    # blocking loop by less than it loses to it — pipelined > 1.2x
    # latency-inclusive signals a broken/interfered measurement, not
    # device speed, and the block is retried.
    n_trials, max_attempts = 3, 8
    trials, lat_trials = [], []
    attempt = 0
    while len(trials) < n_trials and attempt < max_attempts:
        attempt += 1
        rtf_latency = measure_latency()
        elapsed_pipe = measure_pipelined()
        rtf_pipe = elapsed_pipe / (audio_seconds_per_iter * n_iters)
        ok = rtf_pipe <= rtf_latency * 1.2
        print(f"trial {attempt}: latency-inclusive {rtf_latency:.6f}, "
              f"pipelined {rtf_pipe:.6f}{'' if ok else '  [REJECTED: pipelined >'
              ' 1.2x latency-inclusive — tunnel interference]'}",
              file=sys.stderr)
        if ok:
            trials.append((rtf_pipe, elapsed_pipe))
            lat_trials.append(rtf_latency)
    if not trials:
        # every block violated the invariant: report the best observed
        # anyway (still an upper bound on true RTF) but flag it loudly
        print("WARNING: no trial satisfied the pipelined<=1.2x-latency "
              "invariant; the tunnel was saturated for the whole run",
              file=sys.stderr)
        trials.append((rtf_pipe, elapsed_pipe))
        lat_trials.append(rtf_latency)
    vals = sorted(v for v, _ in trials)
    rtf, elapsed_pipe = min(trials)
    rtf_latency = min(lat_trials)
    print(f"pipelined rtf best {vals[0]:.6f} / median {vals[len(vals)//2]:.6f}"
          f" / worst {vals[-1]:.6f} over {len(vals)} accepted blocks; "
          f"best latency-inclusive {rtf_latency:.6f}", file=sys.stderr)

    # MFU: XLA cost model over the dominant kernel (the vocoder forward)
    try:
        ca = voc_apply.lower(voc_params, code0, f00, spk_b).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            # time share attributed to the vocoder ~= pipelined elapsed/iter
            tf_s = flops / (elapsed_pipe / n_iters)
            print(f"vocoder fwd flops: {flops/1e12:.3f} TF; >= {tf_s/1e12:.1f} "
                  f"TF/s achieved (>= {tf_s/197e12*100:.1f}% MFU of bf16 peak, "
                  f"whole-pipeline time in the denominator)", file=sys.stderr)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    # Secondary metric: bf16-trunk vocoder serving RTF.  Same params, the
    # generator computes in bfloat16 (VERDICT r3 item 4: record the bf16
    # serving number in the driver-captured bench output; the f32 number
    # above stays the headline — it is the dtype the <1e-4 reference
    # waveform parity gate is proven on).
    bf16_rtf = None
    try:
        h_bf = VocoderConfig(compute_dtype="bfloat16")
        voc_bf = CodeGenerator(h_bf)
        voc_bf_apply = jax.jit(
            lambda p, c, f, s: voc_bf.apply({"params": p}, c, f, s))
        # bf16 HuBERT encode too (same params; round-5 compute_dtype) —
        # the full serving pipeline at reduced precision.  The k-means
        # argmin stays f32 so units remain discrete-stable.
        import dataclasses as _dc

        hub_bf = HubertEncoder(_dc.replace(hub_cfg, compute_dtype="bfloat16"))
        encode_bf = jax.jit(
            lambda p, wav: kmeans_quantize(hub_bf.apply({"params": p}, wav),
                                           codebook)
        )

        def convert_bf16(wavs, lengths, spk):
            seqs = encode_bf(hub_params, wavs)[:, :T]
            out_seqs, out_lens, f0 = _convert_batch(
                len_model, len_vars, (jnp.float32(4.0), jnp.float32(2.0)),
                pitch_model, pitch_vars, id2mean, id2std,
                seqs, lengths, spk,
                in_cap=T, out_cap=OUT_T, norm_pitch=False, n_tokens=100,
            )
            wav = voc_bf_apply(voc_params, out_seqs, f0[..., None], spk)
            return wav, out_lens

        jax.block_until_ready(convert_bf16(*iter_args[0])[0])  # compile
        bf_trials = []
        for _ in range(4):
            t0 = time.time()
            for it in range(1, n_iters + 1):
                w, ol = convert_bf16(*iter_args[it])
                jax.block_until_ready((w, ol))
            lat = (time.time() - t0) / (audio_seconds_per_iter * n_iters)
            t0 = time.time()
            outs = [convert_bf16(*iter_args[it]) for it in range(1, n_iters + 1)]
            _ = np.asarray(outs[-1][0][0, :8])
            pipe = (time.time() - t0) / (audio_seconds_per_iter * n_iters)
            ok = pipe <= lat * 1.2
            print(f"bf16 trial: latency-inclusive {lat:.6f}, pipelined "
                  f"{pipe:.6f}{'' if ok else '  [REJECTED]'}", file=sys.stderr)
            if ok:
                bf_trials.append(pipe)
                if len(bf_trials) >= 2:
                    break
        if bf_trials:
            bf16_rtf = min(bf_trials)
            print(f"secondary: bf16-trunk e2e rtf {bf16_rtf:.6f} "
                  f"({0.05 / bf16_rtf:.1f}x target, {rtf / bf16_rtf:.2f}x the "
                  "f32 headline)", file=sys.stderr)
    except Exception as e:
        print(f"bf16 secondary bench unavailable: {e}", file=sys.stderr)

    # Training throughput (VERDICT r4 item 3): the b64 GAN train step in
    # f32 and bf16 — the reference's only training perf statement is
    # 400k steps in "a couple of days" on 2 GPUs (README.md:192, ~2.3
    # steps/s); putting it in the driver-parsed record makes a training
    # regression visible round-over-round.  Chained-steps discipline:
    # distinct batches, force-materialise the FINAL state.
    train_ms = {}
    try:
        from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

        def bench_train(tag, **overrides):
            hb = VocoderConfig(batch_size=64, **overrides)
            seg_frames = hb.segment_size // hb.code_hop_size
            state, gen_tx, disc_tx = init_gan_state(hb, key, seg_frames)
            step, _ = make_gan_train_step(hb, gen_tx, disc_tx)
            tb = []
            for i in range(8):
                tb.append({
                    "code": jnp.asarray(rng.integers(0, 100, (64, seg_frames))
                                        .astype(np.int32)),
                    "f0": jnp.asarray(rng.normal(0, 1, (64, seg_frames, 1))
                                      .astype(np.float32)),
                    "spkr": jnp.asarray(rng.integers(0, 100, (64, 1))
                                        .astype(np.int32)),
                    "audio": jnp.asarray(
                        (rng.standard_normal((64, hb.segment_size)) * 0.3)
                        .astype(np.float32)),
                })
            state, _ = step(state, tb[0])  # compile
            leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
            _ = float(jnp.sum(leaf))
            best = None
            for _trial in range(2):
                t0 = time.time()
                for i in range(1, 7):
                    state, _m = step(state, tb[i])
                leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
                _ = float(jnp.sum(leaf))
                dt = (time.time() - t0) / 6
                best = dt if best is None else min(best, dt)
            print(f"train step [{tag}]: {best*1e3:.1f} ms/step @ b64 "
                  f"({1/best:.2f} steps/s)", file=sys.stderr)
            return best * 1e3

        train_ms["f32"] = bench_train("f32")
        train_ms["bf16"] = bench_train(
            "bf16", compute_dtype="bfloat16", disc_compute_dtype="bfloat16")
    except Exception as e:
        print(f"train-step bench unavailable: {e}", file=sys.stderr)

    record = {
        "metric": "e2e_conversion_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "s_compute_per_s_audio",
        "vs_baseline": round(0.05 / rtf, 3),
    }
    if bf16_rtf is not None:
        record["bf16_rtf"] = round(bf16_rtf, 6)
        record["bf16_vs_baseline"] = round(0.05 / bf16_rtf, 3)
    if train_ms:
        record["train_step_ms_f32"] = round(train_ms["f32"], 1)
        record["steps_per_s_f32"] = round(1000.0 / train_ms["f32"], 3)
        if "bf16" in train_ms:
            record["train_step_ms_bf16"] = round(train_ms["bf16"], 1)
            record["steps_per_s_bf16"] = round(1000.0 / train_ms["bf16"], 3)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
