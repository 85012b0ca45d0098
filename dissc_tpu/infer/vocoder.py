"""Vocoder inference (unit resynthesis + voice conversion).

TPU re-design of reference ``sr/inference.py``: the reference fans out
8 worker *processes* each binding one GPU (``:288-292,353``); here the
jitted generator runs bucket-batched utterances on the chip (and shards
over the mesh's data axis when more chips are present) — process-level
parallelism replaced by batching, the idiomatic TPU shape.

Behavioural parity:
  * loads ``config.json`` + latest ``g_*`` from the checkpoint dir,
  * folds weight norm for inference (``remove_weight_norm`` equivalent,
    done functionally on the param tree),
  * resynthesis -> ``<stem>_gen.wav``; VC by overriding the speaker id
    -> ``<stem>_<k>_gen.wav``; ground-truth copy -> ``<stem>_gt.wav``,
  * optional f0 re-normalisation toward the target speaker's stats
    (``sr/inference.py:220-235``),
  * per-utterance RTF accounting (``:67-76``).

Utterances are padded to length buckets by edge-replicating the
conditioning and the waveform is cut to the true length; with the
generator's receptive field this affects only the final ~60 ms
boundary, and ``exact_lengths=True`` disables bucketing for bit-exact
tails (one compile per length).
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.core.wav import peak_normalize, write_wav
from dissc_tpu.data.code_dataset import CodeDataset, parse_manifest
from dissc_tpu.models.hifigan import CodeGenerator
from dissc_tpu.train.checkpoints import load_checkpoint, scan_checkpoint

DEFAULT_FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


class VocoderEngine:
    """Jitted batched HiFi-GAN synthesis."""

    def __init__(self, h: VocoderConfig, gen_params,
                 frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
                 stream_long: bool = True, stream_chunk: int = 512,
                 exact_lengths: bool = False, fold_weights: bool = True,
                 mesh=None):
        if fold_weights and not h.get("folded_weights"):
            # remove_weight_norm equivalent: fold every (v, g) pair into a
            # direct kernel once, so apply() skips the per-call
            # normalisation (reference ``sr/inference.py:160``)
            import dataclasses

            from dissc_tpu.models.layers import fold_weight_norm

            gen_params = fold_weight_norm(gen_params)
            h = dataclasses.replace(h, folded_weights=True)
        self.h = h
        self.model = CodeGenerator(h)
        self.params = gen_params
        self.frame_buckets = frame_buckets
        self.stream_long = stream_long
        self.stream_chunk = stream_chunk
        # exact_lengths: synthesize each utterance at its true frame count
        # (one compiled program per distinct length, batched over items
        # sharing a length) — the reference's always-exact behaviour
        # (sr/inference.py:189-205).  Off by default: bucket padding only
        # perturbs the final ~receptive-field of audio (~60 ms) and
        # compiles O(len(buckets)) programs instead of O(distinct lengths).
        self.exact_lengths = exact_lengths
        # mesh: a jax.sharding.Mesh with a ``data`` axis — synthesis then
        # shards the batch dim across chips (params replicated; the
        # generator is per-sample, so the forward needs no collectives).
        # This is the multi-chip serving shape replacing the reference's
        # one-GPU-per-process inference pool (sr/inference.py:288-292).
        self.mesh = mesh
        if mesh is not None:
            from dissc_tpu.parallel.mesh import replicate

            self.params = jax.device_put(self.params, replicate(mesh))
        self._streamer = None
        self._jitted = jax.jit(
            lambda params, code, f0, spkr: self.model.apply(
                {"params": params}, code, f0, spkr
            )
        )

    def _streamer_for_long(self):
        # long-form path: utterances beyond the last bucket stream in
        # fixed chunks (2 compiled programs, constant memory, bit-exact)
        # instead of compiling a fresh ad-hoc bucket per 256 frames
        if self._streamer is None:
            from dissc_tpu.infer.streaming import StreamingVocoder

            self._streamer = StreamingVocoder(
                self.h, self.params, chunk_frames=self.stream_chunk)
        return self._streamer

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, **kw) -> "VocoderEngine":
        if os.path.isdir(checkpoint_path):
            config_file = os.path.join(checkpoint_path, "config.json")
            cp_g = scan_checkpoint(checkpoint_path, "g_")
        else:
            config_file = os.path.join(os.path.dirname(checkpoint_path), "config.json")
            cp_g = checkpoint_path
        h = VocoderConfig.from_json(config_file)
        state = load_checkpoint(cp_g)
        return cls(h, state["generator"], **kw)

    def synthesize_batch(self, code: np.ndarray, f0: Optional[np.ndarray],
                         spkr: Optional[np.ndarray]) -> Tuple[np.ndarray, float]:
        """[B, T] codes (+f0/spkr) -> ([B, T*hop] float waveform, rtf)."""
        start = time.time()
        B = int(np.shape(code)[0])
        code = jnp.asarray(code)
        f0 = None if f0 is None else jnp.asarray(f0)
        spkr = None if spkr is None else jnp.asarray(spkr)
        if self.mesh is not None:
            from dissc_tpu.parallel.mesh import shard_batch

            n = self.mesh.shape["data"]
            pad = (-B) % n
            if pad:
                # round the batch up to the data-axis size by repeating the
                # last row; padded rows are cut again below
                rep = lambda a: jnp.concatenate(
                    [a, jnp.repeat(a[-1:], pad, axis=0)])
                code = rep(code)
                f0 = None if f0 is None else rep(f0)
                spkr = None if spkr is None else rep(spkr)
            code, f0, spkr = shard_batch(self.mesh, (code, f0, spkr))
        y = self._jitted(self.params, code, f0, spkr)
        y = np.asarray(jax.block_until_ready(y))[:B]
        dur = y.size / self.h.sampling_rate
        rtf = (time.time() - start) / dur
        return y, rtf

    def synthesize_utterances(
        self, items: List[Dict[str, np.ndarray]], batch_size: int = 8
    ) -> Tuple[List[np.ndarray], float]:
        """Bucket-pad and batch-synthesise variable-length utterances.

        ``items``: dicts with ``code`` [T], optional ``f0`` [Tf, 1] and
        ``spkr`` [1].  Returns waveforms cut to each true length and the
        mean RTF.
        """
        # Normalise each item's f0 to an exact integer multiple r of the
        # code length (pad with zeros / trim — the same tolerance on every
        # path).  r > 1 means finer-rate conditioning (e.g. YAAPT's
        # 80-sample hop = 4x the code rate): the generator then runs at
        # the f0 rate and emits r*hop samples per code frame (reference
        # ``sr/models.py:206-211``), so batches are grouped by (bucket, r)
        # and outputs trimmed with the effective rate.
        rates = [1] * len(items)
        norm_items: List[Dict[str, np.ndarray]] = []
        for i, it in enumerate(items):
            it = dict(it)
            if self.h.f0 and it.get("f0") is not None:
                ff = np.asarray(it["f0"], np.float32).reshape(-1)
                T = len(it["code"])
                r = max(1, int(round(len(ff) / max(T, 1))))
                if len(ff) != T * r:
                    buf = np.zeros(T * r, np.float32)
                    n = min(len(ff), T * r)
                    buf[:n] = ff[:n]
                    ff = buf
                it["f0"] = ff.reshape(-1, 1)
                rates[i] = r
            norm_items.append(it)
        items = norm_items

        out: List[Optional[np.ndarray]] = [None] * len(items)
        groups: Dict[Tuple[int, int], List[int]] = {}
        rtfs = []
        long_idx = []
        for i, it in enumerate(items):
            if self.stream_long and len(it["code"]) > self.frame_buckets[-1]:
                long_idx.append(i)
            else:
                cap = (len(it["code"]) if self.exact_lengths
                       else _bucket(len(it["code"]), self.frame_buckets))
                groups.setdefault((cap, rates[i]), []).append(i)
        for i in long_idx:
            it = items[i]
            start = time.time()
            wav = self._streamer_for_long().synthesize(
                it["code"],
                it.get("f0") if self.h.f0 else None,
                it.get("spkr") if self.h.multispkr else None,
            )
            out[i] = wav[: len(it["code"]) * rates[i] * self.h.code_hop_size]
            rtfs.append((time.time() - start) / (out[i].size / self.h.sampling_rate))
        for (cap, r), idxs in groups.items():
            for s in range(0, len(idxs), batch_size):
                chunk = idxs[s : s + batch_size]
                B = len(chunk)
                code = np.zeros((B, cap), np.int32)
                f0 = np.zeros((B, cap * r, 1), np.float32)
                spkr = np.zeros((B, 1), np.int32)
                for j, i in enumerate(chunk):
                    c = items[i]["code"]
                    code[j, : len(c)] = c
                    code[j, len(c) :] = c[-1]  # edge-replicate padding
                    if "f0" in items[i] and items[i]["f0"] is not None:
                        ff = items[i]["f0"].reshape(-1)
                        f0[j, : len(ff), 0] = ff
                    if "spkr" in items[i] and items[i]["spkr"] is not None:
                        spkr[j, 0] = items[i]["spkr"][0]
                y, rtf = self.synthesize_batch(
                    code, f0 if self.h.f0 else None, spkr if self.h.multispkr else None
                )
                rtfs.append(rtf)
                for j, i in enumerate(chunk):
                    n = len(items[i]["code"]) * r * self.h.code_hop_size
                    out[i] = y[j, :n]
        return out, float(np.mean(rtfs)) if rtfs else 0.0


def parse_code_file(code_file: str):
    """Raw-code manifest: ``name|u0 u1 u2 ...`` per line (the reference's
    ``--code_file`` mode, ``sr/inference.py:122-129``)."""
    items, names = [], []
    with open(code_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            name, codes = line.split("|")
            items.append({"code": np.asarray([int(v) for v in codes.split(" ")],
                                             np.int32)})
            names.append(name)
    return items, names


def run_inference(
    checkpoint_file: str,
    input_code_file: str,
    output_dir: str,
    data_path: Optional[str] = None,
    vc: bool = False,
    target_speakers: Optional[List[str]] = None,
    f0_stats_path: Optional[str] = None,
    unseen_speaker: bool = False,
    id_to_spkr_path: Optional[str] = None,
    pad: Optional[int] = None,
    n: int = -1,
    batch_size: int = 8,
    code_file: Optional[str] = None,
    unseen_f0_path: Optional[str] = None,
    sample_df_path: Optional[str] = None,
    parts: bool = False,
    mesh=None,
) -> float:
    """File-level driver mirroring the reference CLI flow.  Returns mean RTF."""
    engine = VocoderEngine.from_checkpoint(checkpoint_file, mesh=mesh)
    h = engine.h

    if code_file is not None:
        # raw-code mode: units only, no gt audio / f0 / speakers
        items, names = parse_code_file(code_file)
        os.makedirs(output_dir, exist_ok=True)
        wavs, rtf = engine.synthesize_utterances(items[: n if n != -1 else None],
                                                 batch_size)
        for name, wav in zip(names, wavs):
            write_wav(os.path.join(output_dir, f"{Path(name).stem}_gen.wav"),
                      peak_normalize(wav), h.sampling_rate)
        return rtf

    base_path = data_path if data_path is not None else h.test_base_path
    file_list = parse_manifest(input_code_file, base_path)
    if unseen_speaker:
        id_to_spkr = load_checkpoint(id_to_spkr_path)
    else:
        id_to_spkr = None
        default_ids = os.path.join(os.path.dirname(h.input_training_file), "id_to_spkr.pkl")
        if os.path.exists(default_ids):
            id_to_spkr = load_checkpoint(default_ids)

    from dissc_tpu.data.stats import load_f0_stats

    stats_for_norm = None
    if h.f0_normalize and h.f0_stats:
        stats_for_norm = load_f0_stats(h.f0_stats)
    if unseen_f0_path:
        # override the normalisation stats for unseen-speaker inputs
        # (reference ``sr/inference.py:148-149``)
        stats_for_norm = load_f0_stats(unseen_f0_path)
    dataset = CodeDataset(
        file_list, -1, h.code_hop_size, h.sampling_rate,
        multispkr=h.multispkr, f0=h.f0,
        f0_stats=stats_for_norm,
        f0_normalize=h.f0_normalize, f0_median=h.f0_median, pad=pad,
        id_to_spkr=id_to_spkr, eval_mode=True, unseen_speakers=unseen_speaker,
    )
    f0_stats = load_f0_stats(f0_stats_path) if f0_stats_path else None

    sample_df = None
    if sample_df_path:
        import pandas as pd

        sample_df = pd.read_csv(sample_df_path, index_col=0)

    os.makedirs(output_dir, exist_ok=True)
    n_items = len(dataset) if n == -1 else min(n, len(dataset))
    items, names, gts = [], [], []
    for i in range(n_items):
        feats = dataset[i]
        items.append(feats)
        if parts:
            # join the last 3 path parts (reference ``sr/inference.py:180-182``)
            p = Path(feats["filename"]).parts
            names.append("_".join(p[-3:])[:-4])
        else:
            names.append(Path(feats["filename"]).stem)
        gts.append(feats["audio"])

    rtfs = []
    # resynthesis with the source speaker (skipped for unseen speakers and
    # in sample_df mode, like the reference sr/inference.py:203)
    if not unseen_speaker and sample_df is None:
        wavs, rtf = engine.synthesize_utterances(items, batch_size)
        rtfs.append(rtf)
        for name, wav in zip(names, wavs):
            write_wav(os.path.join(output_dir, f"{name}_gen.wav"),
                      peak_normalize(wav), h.sampling_rate)

    # voice conversion: override the speaker id per target
    if vc and h.multispkr:
        targets = target_speakers or list(dataset.id_to_spkr)[:5]
        for t in targets:
            k = dataset.spkr_to_id[t] if isinstance(t, str) else int(t)
            vc_items, vc_names = [], []
            for it, name in zip(items, names):
                if sample_df is not None:
                    cur = name.split("_mic2")[0]
                    wanted = sample_df[sample_df.syn_sample == cur].syn_trgt.unique()
                    if (t if isinstance(t, str) else dataset.id_to_spkr[k]) not in wanted:
                        continue
                new_it = dict(it)
                new_it["spkr"] = np.array([k], np.int32)
                if f0_stats is not None and h.f0 and not h.f0_normalize:
                    new_it["f0"] = _renorm_f0(it["f0"], k, t, f0_stats)
                vc_items.append(new_it)
                vc_names.append(name)
            if not vc_items:
                continue
            wavs, rtf = engine.synthesize_utterances(vc_items, batch_size)
            rtfs.append(rtf)
            for name, wav in zip(vc_names, wavs):
                write_wav(os.path.join(output_dir, f"{name}_{k}_gen.wav"),
                          peak_normalize(wav), h.sampling_rate)

    if sample_df is None:
        for name, gt in zip(names, gts):
            write_wav(os.path.join(output_dir, f"{name}_gt.wav"),
                      peak_normalize(gt), h.sampling_rate)
    return float(np.mean(rtfs)) if rtfs else 0.0


def _renorm_f0(f0: np.ndarray, spkr_id: int, spkr_name, f0_stats: Dict) -> np.ndarray:
    """Shift the source contour's voiced stats to the target speaker's
    (reference ``sr/inference.py:220-235``)."""
    f0 = f0.copy()
    ii = f0 != 0
    if not ii.any():
        return f0
    mean_, std_ = f0[ii].mean(), f0[ii].std()
    stats = None
    for key in (spkr_id, spkr_name):
        if key in f0_stats:
            stats = f0_stats[key]
            break
    if stats is None:
        new_mean, new_std = f0_stats.get("f0_mean", mean_), f0_stats.get("f0_std", std_)
    else:
        new_mean = stats.get("f0_mean", stats.get("mean"))
        new_std = stats.get("f0_std", stats.get("std"))
    f0[ii] = (f0[ii] - mean_) / max(std_, 1e-8) * new_std + new_mean
    return f0
