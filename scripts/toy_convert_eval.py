"""Build a toy Syn_VCTK-shaped corpus, train tiny checkpoints, and run the
full convert_eval pipeline end-to-end (incl. --sort_gt) in a scratch dir.

Drives the flagship orchestration CLI exactly as a user would
(reference scripts/convert_eval.py flow); used both for manual
verification and by tests/test_convert_eval_pipeline.py.
"""
import dataclasses
import json
import os
import pickle
import sys

import numpy as np


SRC_SPK = ["p231", "p232", "p233", "p239", "p245", "p270"]
TRGT_IDS = {"p231": 6, "p239": 13, "p245": 18, "p270": 43}


def build_corpus(root: str, n_seq: int = 3, seed: int = 0) -> None:
    """data/Syn_VCTK tree: wavs + transcripts + JSONL splits + stats."""
    from dissc_tpu.core.wav import write_wav
    from dissc_tpu.data.stats import calculate_pitch_stats

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "data", "Syn_VCTK")
    os.makedirs(os.path.join(base, "hubert100"), exist_ok=True)
    os.makedirs(os.path.join(base, "wav"), exist_ok=True)
    records = []
    for spk in SRC_SPK:
        os.makedirs(os.path.join(base, "txt", spk), exist_ok=True)
        for seq in range(1, n_seq + 1):
            name = f"{spk}_{seq:03}"
            n_frames = int(rng.integers(10, 16))
            t = np.arange(n_frames * 320) / 16000.0
            base_f0 = 120.0 + 10 * (hash(spk) % 7)
            wav = (0.3 * np.sin(2 * np.pi * base_f0 * t)
                   + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
            write_wav(os.path.join(base, "wav", name + ".wav"), wav, 16000)
            with open(os.path.join(base, "txt", spk, name + ".txt"), "w") as f:
                f.write("hello world\n")
            units, f0 = [], []
            n_runs = max(3, n_frames // 3)
            left = n_frames
            for r in range(n_runs):
                run = max(1, left // (n_runs - r))
                left -= run
                u = int(rng.integers(0, 100))
                units += [u] * run
                f0 += [0.0 if rng.random() < 0.3
                       else base_f0 + float(rng.normal(0, 10))] * run
            records.append({"units": units[:n_frames], "f0": f0[:n_frames],
                            "audio": name + ".wav"})
    for split in ("train", "val"):
        with open(os.path.join(base, "hubert100", f"{split}.txt"), "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    stats_path = os.path.join(base, "hubert100", "f0_stats.pkl")
    calculate_pitch_stats(os.path.join(base, "hubert100", "train.txt"), stats_path)
    # fabricated 44-entry speaker table placing the 4 conversion targets at
    # the ids the benchmark's spk_dict expects (6/13/18/43)
    id_to_spkr = [f"x{i:02}" for i in range(44)]
    for name, idx in TRGT_IDS.items():
        id_to_spkr[idx] = name
    free = [i for i in range(44) if id_to_spkr[i].startswith("x")]
    for spk in SRC_SPK:
        if spk not in TRGT_IDS:
            id_to_spkr[free.pop(0)] = spk
    with open(os.path.join(base, "hubert100", "id_to_spkr.pkl"), "wb") as f:
        pickle.dump(id_to_spkr, f)
    # every speaker in the table needs f0 stats (the real benchmark's
    # f0_stats.pkl covers all 107 VCTK speakers)
    with open(stats_path, "rb") as f:
        stats = pickle.load(f)
    for name in id_to_spkr:
        stats.setdefault(name, {"mean": 150.0, "std": 20.0})
    with open(stats_path, "wb") as f:
        pickle.dump(stats, f)


def train_checkpoints(root: str) -> None:
    from dissc_tpu.core.config import ProsodyConfig, VocoderConfig
    from dissc_tpu.train.prosody_trainer import (train_f0_predictor,
                                                 train_len_predictor)
    from dissc_tpu.train.vocoder_trainer import train_vocoder

    hub = os.path.join(root, "data", "Syn_VCTK", "hubert100")
    out = os.path.join(root, "checkpoints", "syn_vctk")
    train_len_predictor(hub, out, ProsodyConfig(n_epochs=2, batch_size=4))
    train_f0_predictor(hub, os.path.join(hub, "f0_stats.pkl"), out,
                       ProsodyConfig(n_epochs=2, batch_size=4, model_type="new"))

    voc_dir = os.path.join(root, "checkpoints", "vctk_vocoder")
    h = VocoderConfig(
        upsample_initial_channel=32, embedding_dim=8, model_in_dim=17,
        segment_size=1280, batch_size=2,
        input_training_file=os.path.join(hub, "train.txt"),
        input_validation_file=os.path.join(hub, "val.txt"),
        train_base_path=os.path.join(root, "data", "Syn_VCTK", "wav"),
        val_base_path=os.path.join(root, "data", "Syn_VCTK", "wav"),
        test_base_path=os.path.join(root, "data", "Syn_VCTK", "wav"),
    )
    train_vocoder(h, voc_dir, training_steps=2, training_epochs=10,
                  stdout_interval=1, checkpoint_interval=2,
                  summary_interval=100, validation_interval=100)
    with open(os.path.join(voc_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(h), f)


def run_pipeline(root: str, sort_gt: bool = True) -> dict:
    from dissc_tpu.cli.convert_eval import main as convert_eval_main

    cwd = os.getcwd()
    os.chdir(root)
    try:
        argv = ["--data", "syn_vctk", "--dissc_type", "dissc_b"]
        if sort_gt:
            argv.append("--sort_gt")
        convert_eval_main(argv)
        with open("results/syn_vctk/dissc_b_results.pkl", "rb") as f:
            return pickle.load(f)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/toy_convert_eval"
    os.makedirs(root, exist_ok=True)
    build_corpus(root)
    train_checkpoints(root)
    errs = run_pipeline(root)
    print("\nresults keys:", {k: (len(v) if isinstance(v, list) else v)
                              for k, v in errs.items()})
