"""Real-speech vocoder training artifact (VERDICT r3 item 5).

The toy-corpus convergence runs prove the optimizer/step/resume
machinery on synthetic harmonics; this script produces the equivalent
evidence on REAL speech — the reference's bundled wild-inference wavs
(``/root/reference/data/unseen/wav_orig/s1_{1,2}.wav``, the only real
audio in the zero-egress image).  Mirrors how the reference validates
training with TB audio samples (``/root/reference/sr/train.py:216-273``):

  1. builds a real-speech corpus: the two wavs are split into four
     utterances (3 train / 1 held-out val).  Unit sequences come from a
     first-party unit extractor — our mini-batch k-means
     (``models/kmeans.py``) fit on 80-dim log-mel frames at the 50 Hz
     code rate (the released HuBERT/k-means checkpoints are gated, so
     the quantizer is trained here; the vocoder contract only needs a
     deterministic content->unit map).  F0 comes from the native YAAPT
     tracker pooled 200 Hz -> 50 Hz.
  2. trains the full GAN vocoder on the corpus with a stop + auto-resume
     midway (same discipline as scripts/train_convergence.py) and
     records the held-out mel-error curve;
  3. synthesizes the held-out utterance through the inference engine and
     writes audible ``*_gen.wav`` / ``*_gt.wav`` artifacts.

Run on TPU:  python scripts/train_real_speech.py
Outputs:     artifacts/convergence_r4_realspeech.json
             artifacts/real_speech_r4/*.wav
"""
import argparse
import json
import os
import pickle
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_WAVS = [
    "/root/reference/data/unseen/wav_orig/s1_1.wav",
    "/root/reference/data/unseen/wav_orig/s1_2.wav",
]
HOP = 320  # 50 Hz unit rate at 16 kHz (reference code_hop_size)


def pool_f0_to_code_rate(f0_5ms: np.ndarray, n_frames: int) -> np.ndarray:
    """200 Hz YAAPT track -> 50 Hz: mean of the voiced samples in each
    4-sample window, 0 where the window is fully unvoiced."""
    need = n_frames * 4
    f0 = np.zeros(need, np.float32)
    f0[: min(need, len(f0_5ms))] = f0_5ms[:need]
    f0 = f0.reshape(n_frames, 4)
    voiced = f0 > 0
    cnt = voiced.sum(-1)
    s = (f0 * voiced).sum(-1)
    return np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0).astype(np.float32)


def build_corpus(root: str) -> str:
    from dissc_tpu.audio.mel import mel_spectrogram
    from dissc_tpu.audio.yaapt import yaapt_f0
    from dissc_tpu.core.wav import read_wav, write_wav
    from dissc_tpu.data.stats import calculate_pitch_stats
    from dissc_tpu.models.hubert import kmeans_quantize
    from dissc_tpu.models.kmeans import train_kmeans

    base = os.path.join(root, "corpus")
    os.makedirs(os.path.join(base, "wav"), exist_ok=True)

    # each bundled wav split in half -> 4 real utterances
    utts = []
    for path in REF_WAVS:
        wav, sr = read_wav(path, dtype="float32")
        assert sr == 16000, (path, sr)
        half = (len(wav) // 2 // HOP) * HOP
        stem = os.path.splitext(os.path.basename(path))[0]
        for part, seg in (("a", wav[:half]), ("b", wav[half:])):
            seg = seg[: (len(seg) // HOP) * HOP]
            utts.append((f"{stem}{part}", seg))

    # first-party unit extractor: k-means-100 over log-mel frames at the
    # code rate (50 Hz), then per-utterance assignment
    feats = []
    for _, seg in utts:
        m = mel_spectrogram(np.asarray(seg)[None], 1024, 80, 16000, HOP,
                            1024, 0, 8000)  # [1, 80, F]
        feats.append(np.asarray(m[0]).T[: len(seg) // HOP])  # [n_frames, 80]
    codebook, inertia = train_kmeans(feats, k=100, n_epochs=20, seed=0)
    print(f"[real] k-means inertia {inertia:.3f} over "
          f"{sum(f.shape[0] for f in feats)} frames", flush=True)

    records = []
    for (name, seg), f in zip(utts, feats):
        n_frames = f.shape[0]
        units = np.asarray(kmeans_quantize(f[None], codebook))[0].astype(int).tolist()
        f0 = pool_f0_to_code_rate(yaapt_f0(seg, 16000), n_frames).tolist()
        write_wav(os.path.join(base, "wav", name + ".wav"), seg, 16000)
        records.append({"units": units, "f0": f0, "audio": name + ".wav"})

    train, val = records[:3], records[3:]
    # each manifest draw takes a fresh random crop, so repeating the 3
    # train records gives the loader several distinct-crop batches per
    # epoch (otherwise 3 items < batch_size would leave no full batch)
    train = train * 16
    for split, recs in (("train", train), ("val", val)):
        with open(os.path.join(base, f"{split}.txt"), "w") as fh:
            for r in recs:
                fh.write(json.dumps(r) + "\n")
    calculate_pitch_stats(os.path.join(base, "train.txt"),
                          os.path.join(base, "f0_stats.pkl"))
    with open(os.path.join(base, "id_to_spkr.pkl"), "wb") as fh:
        pickle.dump(["s1"], fh)
    return base


def read_metric(logdir: str, key: str):
    out = []
    path = os.path.join(logdir, "metrics.jsonl")
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                out.append((rec["step"], rec[key]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/real_speech_r4")
    ap.add_argument("--steps1", type=int, default=1500)
    ap.add_argument("--steps2", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--val-interval", type=int, default=150)
    ap.add_argument("--ckpt-interval", type=int, default=500)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.infer.vocoder import run_inference
    from dissc_tpu.train.vocoder_trainer import train_vocoder
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.root, exist_ok=True)
    base = os.path.join(args.root, "corpus")
    if not os.path.exists(os.path.join(base, "train.txt")):
        base = build_corpus(args.root)
        print(f"[real] corpus built at {base}", flush=True)

    ckpt = os.path.join(args.root, "vocoder")
    h = VocoderConfig(
        batch_size=args.batch,
        segment_size=8960,
        upsample_initial_channel=args.channels,
        input_training_file=os.path.join(base, "train.txt"),
        input_validation_file=os.path.join(base, "val.txt"),
        train_base_path=os.path.join(base, "wav"),
        val_base_path=os.path.join(base, "wav"),
        compute_dtype=args.dtype,
    )
    common = dict(checkpoint_interval=args.ckpt_interval,
                  validation_interval=args.val_interval,
                  stdout_interval=max(args.val_interval // 2, 1),
                  summary_interval=args.val_interval,
                  training_epochs=10 ** 9, max_val_batches=2)
    # stop + auto-resume midway, as in the toy convergence proof
    train_vocoder(h, ckpt, training_steps=args.steps1, **common)
    state = train_vocoder(h, ckpt, training_steps=args.steps2, **common)

    # run_inference loads config.json from the checkpoint dir
    import dataclasses

    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(h), f)

    curve = read_metric(os.path.join(ckpt, "logs"), "validation/mel_spec_error")
    train_mel = read_metric(os.path.join(ckpt, "logs"), "training/loss_mel")

    # audible artifacts: held-out utterance through the inference engine
    art_dir = os.path.join(REPO, "artifacts", "real_speech_r4")
    os.makedirs(art_dir, exist_ok=True)
    rtf = run_inference(checkpoint_file=ckpt,
                        input_code_file=os.path.join(base, "val.txt"),
                        output_dir=art_dir, data_path=os.path.join(base, "wav"))
    wavs = sorted(os.listdir(art_dir))
    print(f"[real] wrote {wavs} (rtf {rtf:.5f})", flush=True)

    out = {
        "corpus": {"wavs": [os.path.basename(p) for p in REF_WAVS],
                   "utterances": 4, "train": 3, "val": 1,
                   "unit_extractor": "native kmeans-100 over 50 Hz log-mel",
                   "f0": "native YAAPT pooled to 50 Hz"},
        "steps": int(state.step), "resume_at": args.steps1,
        "dtype": args.dtype,
        "val_mel": curve, "train_mel": train_mel,
        "inference_rtf": rtf, "artifacts": wavs,
    }
    path = os.path.join(REPO, "artifacts", "convergence_r4_realspeech.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[real] wrote {path}", flush=True)
    print("== held-out mel curve ==")
    for s, v in curve:
        print(f"  step {s:6d}: {v:.4f}")


if __name__ == "__main__":
    main()
