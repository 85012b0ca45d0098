"""Prosody conversion ("infer") engine.

TPU re-design of reference ``infer.py``: where the reference loops
sample-by-sample with GPU<->CPU hops (dedup on CPU at ``infer.py:27-28``,
a Python carryover loop at ``:158-172``, dynamic ``repeat_interleave``),
here the *entire* conversion — dedup -> rhythm predict -> carryover
rounding -> re-timing -> pitch predict — is one jitted, batched XLA
program over capacity-padded buffers (``core.seqops``), bucketed by
sequence length so each bucket compiles once.

Outputs are written to the same JSONL contract
(``{"units", "f0", "audio"}``) so downstream vocoder/eval stages (ours
or the reference's) consume them unchanged.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dissc_tpu.core.seqops import (
    dedup_padded,
    dedup_seq,
    len_carryover_correction,
    morph_seq_len,
    repeat_interleave_padded,
)
from dissc_tpu.data.jsonl import append_unit_record, iter_unit_records
from dissc_tpu.data.stats import load_f0_stats, load_id_to_spkr, prep_stats_arrays
from dissc_tpu.models.prosody import LenPredictor, calc_freq
from dissc_tpu.train.checkpoints import load_checkpoint
from dissc_tpu.train.prosody_trainer import build_pitch_model

DEFAULT_BUCKETS = (128, 256, 512, 850, 1280)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@functools.partial(
    jax.jit,
    static_argnames=("len_model", "pitch_model", "in_cap", "out_cap", "norm_pitch", "n_tokens"),
)
def _convert_batch(
    len_model,
    len_variables,
    len_norm_stats,
    pitch_model,
    pitch_variables,
    id2mean,
    id2std,
    seqs,
    lengths,
    spk_ids,
    *,
    in_cap: int,
    out_cap: int,
    norm_pitch: bool,
    n_tokens: int,
):
    """[B, in_cap] padded unit seqs -> (out_units, out_lens, f0).

    The full conversion pipeline as one XLA program; the per-sample
    rhythm stage is vmapped, the pitch CNN runs on the whole batch.
    Flax modules are static (hashable); params/stats are traced args.
    """

    def one(seq, length, spk):
        if len_model is not None:
            vals, _, n_runs = dedup_padded(seq, length, in_cap, n_tokens)
            run_mask = jnp.arange(in_cap) < n_runs
            lens_pred = len_model.apply(
                len_variables, vals[None], spk[None],
                (len_norm_stats[0], len_norm_stats[1]), length_mask=run_mask[None],
            )[0]
            lens_int = len_carryover_correction(lens_pred, run_mask)
            out_seq, out_len = repeat_interleave_padded(vals, lens_int, out_cap, n_tokens)
        else:
            padded = jnp.full((out_cap,), n_tokens, seq.dtype)
            masked = jnp.where(jnp.arange(in_cap) < length, seq, n_tokens)
            out_seq = jax.lax.dynamic_update_slice(padded, masked, (0,))
            out_len = length
        return out_seq, out_len

    out_seqs, out_lens = jax.vmap(one)(seqs, lengths, spk_ids)

    if pitch_model is not None:
        out_mask = jnp.arange(out_cap)[None, :] < out_lens[:, None]
        masked_seqs = jnp.where(out_mask, out_seqs, n_tokens)
        cls_p, reg_p = pitch_model.apply(
            pitch_variables, masked_seqs, spk_ids, length_mask=out_mask
        )
        f0 = calc_freq(cls_p, reg_p, spk_ids, id2mean, id2std, norm=norm_pitch)
        f0 = jnp.where(out_mask, f0, 0.0)
    else:
        f0 = jnp.zeros_like(out_seqs, jnp.float32)
    return out_seqs, out_lens, f0


class ProsodyConverter:
    """Loads prosody checkpoints and converts unit records.

    Mirrors the model-loading of reference ``infer.py:66-84`` (len model
    + ``len_norm_stats``; pitch model by type) but runs conversion as
    jitted bucketed batches.
    """

    def __init__(self, n_tokens: int = 100, expand_factor: float = 2.0,
                 buckets: Sequence[int] = DEFAULT_BUCKETS, mesh=None):
        self.n_tokens = n_tokens
        self.expand_factor = expand_factor
        self.buckets = buckets
        # mesh: shard conversion batches over the ``data`` axis (params
        # replicated; the whole program is per-sample, collective-free)
        self.mesh = mesh
        self.truncation_count = 0  # conversions clipped by expand_factor
        self.len_model = None
        self.len_variables = None
        self.len_norm_stats = (jnp.float32(0.0), jnp.float32(1.0))
        self.pitch_model = None
        self.pitch_variables = None
        self.id2pitch_mean: Optional[np.ndarray] = None
        self.id2pitch_std: Optional[np.ndarray] = None

    @classmethod
    def load(
        cls,
        n_speakers: int,
        len_model_dir: Optional[str] = None,
        f0_model_dir: Optional[str] = None,
        f0_model_type: str = "new",
        id2pitch_mean: Optional[np.ndarray] = None,
        id2pitch_std: Optional[np.ndarray] = None,
        n_tokens: int = 100,
        mesh=None,
    ) -> "ProsodyConverter":
        self = cls(n_tokens=n_tokens, mesh=mesh)
        if len_model_dir:
            self.len_model = LenPredictor(n_tokens=n_tokens, n_speakers=n_speakers)
            self.len_variables = load_checkpoint(os.path.join(len_model_dir, "best_model.pth"))
            mean, std = load_checkpoint(os.path.join(len_model_dir, "len_norm_stats.pth"))
            self.len_norm_stats = (jnp.float32(mean), jnp.float32(std))
        if f0_model_dir:
            self.pitch_model = build_pitch_model(f0_model_type, n_tokens, n_speakers)
            self.pitch_variables = load_checkpoint(os.path.join(f0_model_dir, "best_model.pth"))
        self.id2pitch_mean = id2pitch_mean
        self.id2pitch_std = id2pitch_std
        return self

    def convert_records(
        self,
        records: List[Dict],
        spk_id_dict: Dict[str, int],
        target_speaker: Optional[str] = None,
        norm_pitch: bool = False,
        batch_size: int = 32,
    ) -> List[Dict]:
        """Convert unit records to (optionally) a target speaker's prosody.

        ``target_speaker=None`` reconstructs with each record's own
        speaker; otherwise the speaker id is overridden (the VC path,
        reference ``infer.py:121-122``).  Returns new records in order.
        """
        out: List[Dict] = [None] * len(records)
        groups: Dict[int, List[int]] = {}
        for i, rec in enumerate(records):
            n_units = sum(1 for u in rec["units"] if u != self.n_tokens)
            groups.setdefault(_bucket(n_units, self.buckets), []).append(i)

        id2mean = jnp.asarray(self.id2pitch_mean) if self.id2pitch_mean is not None else jnp.zeros(1)
        id2std = jnp.asarray(self.id2pitch_std) if self.id2pitch_std is not None else jnp.ones(1)

        for in_cap, idxs in groups.items():
            out_cap = int(in_cap * self.expand_factor)
            for start in range(0, len(idxs), batch_size):
                chunk = idxs[start : start + batch_size]
                B = len(chunk)
                seqs = np.full((B, in_cap), self.n_tokens, np.int32)
                lengths = np.zeros((B,), np.int32)
                spk = np.zeros((B, 1), np.int32)
                for j, i in enumerate(chunk):
                    units = [u for u in records[i]["units"] if u != self.n_tokens][:in_cap]
                    seqs[j, : len(units)] = units
                    lengths[j] = len(units)
                    name = records[i]["audio"].split("_")[0]
                    spk[j, 0] = spk_id_dict[
                        target_speaker if target_speaker is not None else name
                    ]
                args = (jnp.asarray(seqs), jnp.asarray(lengths), jnp.asarray(spk))
                if self.mesh is not None:
                    from dissc_tpu.parallel.mesh import shard_batch

                    n = self.mesh.shape["data"]
                    pad = (-B) % n
                    if pad:
                        # round up to the data-axis size (padded rows repeat
                        # the last item and are dropped below)
                        args = tuple(jnp.concatenate(
                            [a, jnp.repeat(a[-1:], pad, axis=0)]) for a in args)
                    args = shard_batch(self.mesh, args)
                out_seqs, out_lens, f0 = _convert_batch(
                    self.len_model, self.len_variables, self.len_norm_stats,
                    self.pitch_model, self.pitch_variables, id2mean, id2std,
                    *args,
                    in_cap=in_cap, out_cap=out_cap, norm_pitch=norm_pitch,
                    n_tokens=self.n_tokens,
                )
                out_seqs, out_lens, f0 = (np.asarray(a)[:B]
                                          for a in (out_seqs, out_lens, f0))
                for j, i in enumerate(chunk):
                    # out_cap = expand_factor * in_cap; predicted totals beyond
                    # it are clamped (rhythm conversion stays ~length-preserving,
                    # so the 2x margin is never hit in practice) — counted and
                    # warned, never silent
                    if int(out_lens[j]) > out_cap:
                        self.truncation_count += 1
                        import warnings

                        warnings.warn(
                            f"prosody conversion truncated "
                            f"{records[i].get('audio', i)}: predicted "
                            f"{int(out_lens[j])} frames > cap {out_cap} "
                            f"(expand_factor={self.expand_factor}); raise "
                            f"expand_factor to keep the full output",
                            stacklevel=2,
                        )
                    L = min(int(out_lens[j]), out_cap)
                    units = out_seqs[j, :L].tolist()
                    if self.pitch_model is not None:
                        f0_list = f0[j, :L].astype(float).tolist()
                    else:
                        f0_list = self._heuristic_pitch(records[i], units, norm_pitch,
                                                        spk_id_dict)
                    out[i] = {"units": units, "f0": f0_list, "audio": records[i]["audio"]}
        return out

    def _heuristic_pitch(self, record, out_units, norm_pitch, spk_id_dict) -> List[float]:
        """No-pitch-model path: nearest-interpolate the source contour
        onto the new run lengths (reference ``utils.py:47-52`` via
        ``infer.py:40-41``)."""
        in_units = np.asarray([u for u in record["units"] if u != self.n_tokens])
        pitch = np.asarray(record["f0"], np.float64)[: len(in_units)]
        if norm_pitch:
            if self.id2pitch_mean is None or self.id2pitch_std is None:
                raise ValueError(
                    "norm_pitch=True on the no-pitch-model path needs per-"
                    "speaker f0 statistics; load with f0_stats (reference "
                    "--f0_stats, infer.py:188) or pass norm_pitch=False")
            name = record["audio"].split("_")[0]
            sid = spk_id_dict[name]
            ii = pitch != 0
            pitch[ii] = (pitch[ii] - self.id2pitch_mean[sid]) / self.id2pitch_std[sid]
        _, t_lens = dedup_seq(out_units)
        return morph_seq_len(in_units, pitch, np.asarray(t_lens)).tolist()


def infer_file(
    input_path: str,
    out_path: str,
    len_model_dir: Optional[str],
    f0_model_dir: Optional[str],
    f0_model_type: str = "new",
    f0_stats_path: str = "",
    id_to_spkr_path: Optional[str] = None,
    n: Optional[int] = None,
    vc: bool = False,
    target_speakers: Optional[List[str]] = None,
    norm_pitch: bool = False,
    n_tokens: int = 100,
    wild: bool = False,
    sample_df: Optional[str] = None,
    mesh=None,
) -> None:
    """File-level driver matching the reference CLI behaviour
    (``infer.py:47-155``): writes a reconstruction JSONL and/or
    per-target-speaker ``<t>_<input>.txt`` files.  ``sample_df`` is the
    speaker-verification pair CSV restricting (sample -> target)
    conversions and disabling reconstruction (``infer.py:112-122``)."""
    id_to_spkr_path = id_to_spkr_path or os.path.join(os.path.dirname(input_path),
                                                      "id_to_spkr.pkl")
    spk_id_dict = load_id_to_spkr(id_to_spkr_path)
    f0_param_dict = load_f0_stats(f0_stats_path)
    id2mean, id2std = prep_stats_arrays(spk_id_dict, f0_param_dict)

    conv = ProsodyConverter.load(
        n_speakers=len(spk_id_dict),
        len_model_dir=len_model_dir,
        f0_model_dir=f0_model_dir,
        f0_model_type=f0_model_type,
        id2pitch_mean=id2mean,
        id2pitch_std=id2std,
        n_tokens=n_tokens,
        mesh=mesh,
    )

    records = list(iter_unit_records(input_path))
    if n is not None:
        records = records[:n]

    os.makedirs(out_path, exist_ok=True)
    base = os.path.basename(input_path)

    df = None
    if sample_df:
        import pandas as pd

        df = pd.read_csv(sample_df, index_col=0)

    def targets_of(rec):
        stem = os.path.splitext(rec["audio"])[0].split("_mic2")[0]
        return set(df[df.syn_sample == stem].syn_trgt.unique())

    def fresh(path):
        if os.path.exists(path):
            os.remove(path)

    if not wild and df is None:
        recon_path = os.path.join(out_path, base)
        fresh(recon_path)
        for rec in conv.convert_records(records, spk_id_dict, None, norm_pitch):
            append_unit_record(recon_path, rec)

    if vc or wild:
        if df is not None:
            targets = sorted({t for rec in records for t in targets_of(rec)})
        else:
            targets = target_speakers or list(spk_id_dict.keys())[:1]
        for t in targets:
            recs_t = records if df is None else [r for r in records if t in targets_of(r)]
            if not recs_t:
                continue
            t_path = os.path.join(out_path, f"{t}_{base}")
            fresh(t_path)
            for rec in conv.convert_records(recs_t, spk_id_dict, t, norm_pitch):
                append_unit_record(t_path, rec)
