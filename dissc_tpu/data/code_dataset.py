"""Vocoder training/eval dataset.

Host-side numpy re-design of reference ``sr/dataset.py:107-325``
(CodeDataset): per item it
  * loads a 16 kHz wav (int16 -> /32768 -> peak-normalize -> *0.95),
  * aligns code/audio lengths on the 320-sample code hop,
  * tile-repeats short clips up to ``segment_size``,
  * samples one LCM-aligned random interval across (audio, code, f0),
  * optionally whitens f0 by speaker stats,
and serves fixed-shape batches ready to shard over the mesh's data
axis.  The mel-loss target is *not* computed here — the TPU training
step computes it on device (``audio.mel``), keeping the host loop pure
I/O.

Speaker parsing matches ``parse_speaker`` (``sr/dataset.py:132-147``);
``id_to_spkr`` ordering matches the sorted-unique convention
(``sr/dataset.py:192-197``).
"""
from __future__ import annotations

import os
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from dissc_tpu.core.wav import normalize_audio_int16, read_wav
from dissc_tpu.data.jsonl import iter_unit_records


def parse_speaker(path, method) -> str:
    if isinstance(path, str):
        path = Path(path)
    if method == "parent_name":
        return path.parent.name
    if method == "parent_parent_name":
        return path.parent.parent.name
    if method == "_":
        return path.name.split("_")[0]
    if method == "single":
        return "A"
    if callable(method):
        return method(path)
    raise NotImplementedError(method)


def parse_manifest(manifest: str, base_path: str):
    """Manifest -> (audio_files, codes, pitch).  JSONL lines carry
    units/f0; bare lines are wav paths (reference ``sr/dataset.py:107-122``)."""
    audio_files, codes, pitch = [], [], []
    with open(manifest) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line[0] == "{":
                import json

                sample = json.loads(line)
                codes.append(np.asarray(sample["units"], np.int64))
                audio_files.append(Path(base_path + "/" + sample["audio"].split("/")[-1]))
                if "f0" in sample:
                    pitch.append(np.asarray(sample["f0"], np.float32))
            else:
                audio_files.append(Path(line))
    return audio_files, codes, pitch


def get_dataset_filelist(h):
    train = parse_manifest(h.input_training_file, h.train_base_path)
    val = parse_manifest(h.input_validation_file, h.val_base_path)
    return train, val


class CodeDataset:
    def __init__(
        self,
        files: Tuple[List, List, List],
        segment_size: int,
        code_hop_size: int,
        sampling_rate: int,
        multispkr: Optional[str] = "_",
        f0: bool = True,
        f0_stats: Optional[Dict] = None,
        f0_normalize: bool = False,
        f0_median: bool = False,
        pad: Optional[int] = None,
        id_to_spkr: Optional[List[str]] = None,
        eval_mode: bool = False,
        unseen_speakers: bool = False,
        seed: int = 1234,
    ):
        self.audio_files, self.codes, self.pitch = files
        self.segment_size = segment_size
        self.code_hop_size = code_hop_size
        self.sampling_rate = sampling_rate
        self.multispkr = multispkr
        self.f0 = f0
        self.f0_stats = f0_stats
        self.f0_normalize = f0_normalize
        self.f0_median = f0_median
        self.pad = pad
        self.eval_mode = eval_mode
        self.unseen_speakers = unseen_speakers
        self._rng = random.Random(seed)

        if self.multispkr:
            if id_to_spkr:
                self.id_to_spkr = list(id_to_spkr)
            else:
                spkrs = sorted({parse_speaker(f, self.multispkr) for f in self.audio_files})
                self.id_to_spkr = spkrs
            self.spkr_to_id = {k: v for v, k in enumerate(self.id_to_spkr)}

    def __len__(self) -> int:
        return len(self.audio_files)

    def _load_audio(self, filename) -> np.ndarray:
        audio, sr = read_wav(str(filename), dtype="int16")
        if sr != self.sampling_rate:
            from dissc_tpu.audio.resample import resample_poly_np

            audio = resample_poly_np(audio.astype(np.float64), sr, self.sampling_rate)
        if self.pad:
            padding = self.pad - (audio.shape[-1] % self.pad)
            audio = np.pad(audio, (0, padding), "constant")
        return normalize_audio_int16(audio)

    def _sample_interval(self, seqs: Sequence[np.ndarray], seq_len: Optional[int] = None):
        """Pick one aligned random crop across signals at different hop
        rates (reference ``sr/dataset.py:199-219``)."""
        N = max(v.shape[-1] for v in seqs)
        if seq_len is None:
            seq_len = self.segment_size if self.segment_size > 0 else N
        hops = [N // v.shape[-1] for v in seqs]
        lcm = np.lcm.reduce(hops)
        interval_end = N // lcm - seq_len // lcm
        start_step = self._rng.randint(0, interval_end)
        new_seqs = []
        for i, v in enumerate(seqs):
            start = start_step * (lcm // hops[i])
            end = (start_step + seq_len // lcm) * (lcm // hops[i])
            new_seqs.append(v[..., start:end])
        return new_seqs

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        filename = self.audio_files[index]
        audio = self._load_audio(filename)

        code_length = min(audio.shape[0] // self.code_hop_size, self.codes[index].shape[0])
        code = self.codes[index]
        if not self.eval_mode:
            code = code[:code_length]
            audio = audio[: code_length * self.code_hop_size]
            pitch = self.pitch[index][:code_length] if self.pitch else np.zeros(0, np.float32)
            assert audio.shape[0] // self.code_hop_size == code.shape[0], "Code audio mismatch"
        else:
            pitch = self.pitch[index] if self.pitch else np.zeros(0, np.float32)

        # tile-repeat short clips to the training segment
        while audio.shape[0] < self.segment_size:
            audio = np.hstack([audio, audio])
            code = np.hstack([code, code])
            pitch = np.hstack([pitch, pitch])

        if self.eval_mode:
            feats_audio = audio.astype(np.float32)
        else:
            audio_c, code, pitch = self._sample_interval(
                [audio[None, :], code, pitch]
            )
            feats_audio = audio_c[0].astype(np.float32)

        feats: Dict[str, np.ndarray] = {"code": code.astype(np.int32)}
        if self.f0:
            if pitch.shape[0] != 0:
                f0 = pitch.reshape(-1, 1).astype(np.float32)
            else:
                try:
                    from dissc_tpu.audio.yaapt import yaapt_f0

                    f0 = yaapt_f0(feats_audio, self.sampling_rate).reshape(-1, 1).astype(np.float32)
                except Exception:
                    f0 = np.zeros((feats_audio.shape[0] // 80, 1), np.float32)
            feats["f0"] = f0

        if self.multispkr:
            spkr_name = parse_speaker(filename, self.multispkr)
            if self.unseen_speakers:
                feats["spkr"] = np.array([0], np.int32)
            else:
                feats["spkr"] = np.array([self.spkr_to_id[spkr_name]], np.int32)

        if self.f0_normalize and self.f0:
            spkr_name = parse_speaker(filename, self.multispkr)
            if self.f0_stats is None or spkr_name not in self.f0_stats:
                mean = self.f0_stats["f0_mean"] if self.f0_stats else 0.0
                std = self.f0_stats["f0_std"] if self.f0_stats else 1.0
            else:
                mean = self.f0_stats[spkr_name]["mean"]
                std = self.f0_stats[spkr_name]["std"]
            f0 = feats["f0"]
            ii = f0 != 0
            if self.f0_median:
                med = np.median(f0[ii]) if ii.any() else 0.0
                f0[~ii] = med
                f0[~ii] = (f0[~ii] - mean) / std
            f0[ii] = (f0[ii] - mean) / std
            feats["f0"] = f0

        feats["audio"] = feats_audio
        feats["filename"] = str(filename)
        return feats

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0) -> Iterator[Dict]:
        """Fixed-shape stacked batches (training mode only)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[i] for i in order[start : start + batch_size]]
            yield {
                "code": np.stack([it["code"] for it in items]),
                "f0": np.stack([it["f0"] for it in items]),
                "spkr": np.stack([it["spkr"] for it in items]),
                "audio": np.stack([it["audio"] for it in items]),
            }
