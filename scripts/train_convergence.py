"""Training-convergence proof: multi-thousand-step runs on a learnable toy corpus.

The reference's de-facto validation was real training runs
(``/root/reference/sr/train.py:126-278``; README.md:162-192 quotes
training times).  This script provides the equivalent evidence for the
TPU stack: it builds a toy corpus whose unit->waveform mapping is
DETERMINISTIC (each unit id maps to a fixed fundamental frequency, each
speaker to a fixed harmonic timbre), then

  1. trains the full GAN vocoder stack (spectral-norm power iteration
     under jit, donation, prefetch, lr decay) for ``--steps2`` steps
     WITH a stop + auto-resume at ``--steps1`` (proving mid-run resume),
     recording the validation mel-error curve from ``logs/metrics.jsonl``;
  2. trains the rhythm and pitch predictors on the same corpus and
     records their per-epoch validation curves + best-model selection.

Run on TPU:     python scripts/train_convergence.py --root /tmp/conv
Quick CPU form: python scripts/train_convergence.py --root /tmp/conv \
                    --channels 64 --batch 4 --segment 1280 \
                    --steps1 30 --steps2 60 --val-interval 10 --ckpt-interval 15

The corpus is learnable by construction: a vocoder that models
(unit, speaker) -> harmonic stack can drive mel error toward zero, so a
*descending* validation curve demonstrates the optimizer/step/resume
machinery is correct end-to-end.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SPEAKERS = ["s0", "s1", "s2", "s3"]
# per-speaker harmonic amplitude decay ("timbre")
SPK_TIMBRE = {"s0": 0.2, "s1": 0.45, "s2": 0.7, "s3": 0.9}


def unit_freq(u: int) -> float:
    """Deterministic unit -> fundamental mapping (100..298 Hz)."""
    return 100.0 + 2.0 * u


def synth_utterance(units, timbre: float, rng, sr: int = 16000, hop: int = 320):
    """Units -> waveform: 3-harmonic stack at unit_freq, phase-continuous.

    Deliberately NOT a clean deterministic tone: per-utterance random
    initial phases, a slow random amplitude envelope, ~0.5% f0 jitter
    and a -45 dB noise floor.  A perfectly clean corpus is adversarially
    degenerate — the discriminator detects any generator imperfection
    instantly (D loss ~0.005 by step 100 in the first attempt), saturates
    the feature-match/adv terms and stalls the mel descent.  With
    natural variability the GAN reaches the usual equilibrium and the
    mel error can actually descend; unit -> spectrum stays deterministic
    (mel is phase/noise-insensitive at these levels), so the corpus is
    still learnable by construction.
    """
    n = len(units) * hop
    wav = np.zeros(n, np.float64)
    phases = rng.uniform(0, 2 * np.pi, 3)
    amps = np.array([1.0, timbre, timbre ** 2])
    amps = amps / amps.sum()
    # slow amplitude envelope: 0.8..1.0, ~2 cycles per utterance
    env_phase = rng.uniform(0, 2 * np.pi)
    env_freq = rng.uniform(1.0, 3.0) / n
    t_all = np.arange(n)
    envelope = 0.9 + 0.1 * np.sin(env_phase + 2 * np.pi * env_freq * t_all)
    for i, u in enumerate(units):
        f = unit_freq(int(u)) * (1.0 + rng.normal(0, 0.005))
        t = np.arange(hop)
        for h in range(3):
            w = 2 * np.pi * f * (h + 1) / sr
            wav[i * hop:(i + 1) * hop] += amps[h] * np.sin(phases[h] + w * t)
            phases[h] = (phases[h] + w * hop) % (2 * np.pi)
    wav = wav * envelope + rng.normal(0, 0.005, n)
    return (0.6 * wav).astype(np.float32)


def build_corpus(root: str, n_utt: int = 12, n_frames: int = 280,
                 seed: int = 0) -> str:
    """Build wavs + JSONL manifests + stats; returns the data dir."""
    from dissc_tpu.core.wav import write_wav
    from dissc_tpu.data.stats import calculate_pitch_stats

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "corpus")
    os.makedirs(os.path.join(base, "wav"), exist_ok=True)
    records = []
    for spk in SPEAKERS:
        for j in range(n_utt):
            name = f"{spk}_{j + 1:03}"
            # unit sequence as runs whose length is a FUNCTION of the unit
            # id (3 + u%6, +-1 frame of noise): the LenPredictor then has a
            # strong learnable duration signal, not just the corpus mean
            units = []
            while len(units) < n_frames:
                u = int(rng.integers(0, 100))
                dur = 3 + u % 6 + int(rng.integers(-1, 2))
                units += [u] * max(2, dur)
            units = units[:n_frames]
            wav = synth_utterance(units, SPK_TIMBRE[spk], rng)
            write_wav(os.path.join(base, "wav", name + ".wav"), wav, 16000)
            f0 = [unit_freq(u) for u in units]
            records.append({"units": units, "f0": f0, "audio": name + ".wav"})
    rng.shuffle(records)
    n_val = max(4, len(records) // 10)
    for split, recs in (("train", records[n_val:]), ("val", records[:n_val])):
        with open(os.path.join(base, f"{split}.txt"), "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    calculate_pitch_stats(os.path.join(base, "train.txt"),
                          os.path.join(base, "f0_stats.pkl"))
    import pickle

    with open(os.path.join(base, "id_to_spkr.pkl"), "wb") as f:
        pickle.dump(sorted(SPEAKERS), f)
    return base


def read_metric(logdir: str, key: str):
    """[(step, value)] for a metric from a MetricLogger metrics.jsonl."""
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


def run_vocoder(base: str, root: str, args) -> dict:
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.vocoder_trainer import train_vocoder

    ckpt = os.path.join(root, "vocoder")
    h = VocoderConfig(
        batch_size=args.batch,
        segment_size=args.segment,
        upsample_initial_channel=args.channels,
        input_training_file=os.path.join(base, "train.txt"),
        input_validation_file=os.path.join(base, "val.txt"),
        train_base_path=os.path.join(base, "wav"),
        val_base_path=os.path.join(base, "wav"),
        compute_dtype=args.dtype,
        disc_compute_dtype=args.disc_dtype,
    )
    common = dict(
        checkpoint_interval=args.ckpt_interval,
        validation_interval=args.val_interval,
        stdout_interval=max(args.val_interval // 2, 1),
        summary_interval=args.val_interval,
        training_epochs=10 ** 9,
        max_val_batches=2,
    )
    # phase 1: train to steps1, then stop (simulated interruption)
    train_vocoder(h, ckpt, training_steps=args.steps1, **common)
    # phase 2: fresh call auto-resumes from the latest g_/do_ checkpoint
    # (reference sr/train.py:55-70) and continues to steps2
    state = train_vocoder(h, ckpt, training_steps=args.steps2, **common)

    curve = read_metric(os.path.join(ckpt, "logs"), "validation/mel_spec_error")
    train_mel = read_metric(os.path.join(ckpt, "logs"), "training/loss_mel")
    return {"ckpt": ckpt, "steps": int(state.step), "val_mel": curve,
            "train_mel": train_mel}


def run_prosody(base: str, root: str, epochs: int) -> dict:
    from dissc_tpu.core.config import ProsodyConfig
    from dissc_tpu.train.prosody_trainer import train_f0_predictor, train_len_predictor

    cfg = ProsodyConfig(n_epochs=epochs, batch_size=16)
    len_dir = train_len_predictor(base, os.path.join(root, "prosody"), cfg)
    pitch_dir = train_f0_predictor(base, os.path.join(base, "f0_stats.pkl"),
                                   os.path.join(root, "prosody"), cfg)
    out = {}
    for name, d, key in (("len", len_dir, "MSE"), ("pitch", pitch_dir, "MAE")):
        out[name] = {
            "dir": d,
            "val": read_metric(os.path.join(d, "val"), key),
            "best_saved": os.path.exists(os.path.join(d, "best_model.pth")),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/convergence")
    ap.add_argument("--steps1", type=int, default=1200)
    ap.add_argument("--steps2", type=int, default=2400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8960)
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--val-interval", type=int, default=200)
    ap.add_argument("--ckpt-interval", type=int, default=400)
    ap.add_argument("--prosody-epochs", type=int, default=30)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--disc-dtype", default="float32")
    ap.add_argument("--skip-prosody", action="store_true")
    ap.add_argument("--skip-vocoder", action="store_true")
    args = ap.parse_args()

    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(args.root, exist_ok=True)
    base = os.path.join(args.root, "corpus")
    if not os.path.exists(os.path.join(base, "train.txt")):
        base = build_corpus(args.root)
        print(f"corpus built at {base}")

    results = {}
    if not args.skip_vocoder:
        results["vocoder"] = run_vocoder(base, args.root, args)
        print("\n== vocoder validation mel-spec error ==")
        for step, v in results["vocoder"]["val_mel"]:
            print(f"  step {step:6d}: {v:.4f}")
    if not args.skip_prosody:
        results["prosody"] = run_prosody(base, args.root, args.prosody_epochs)
        for name, r in results["prosody"].items():
            print(f"\n== {name} validation curve ==")
            for ep, v in r["val"]:
                print(f"  epoch {ep:3d}: {v:.4f}")
            print(f"  best_model saved: {r['best_saved']}")

    with open(os.path.join(args.root, "convergence.json"), "w") as f:
        json.dump({k: {kk: vv for kk, vv in v.items() if kk != "ckpt"}
                   if isinstance(v, dict) else v
                   for k, v in results.items()}, f, indent=1, default=str)
    print(f"\nwrote {os.path.join(args.root, 'convergence.json')}")


if __name__ == "__main__":
    main()
