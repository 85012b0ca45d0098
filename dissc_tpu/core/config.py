"""Configuration.

One typed config tree for the whole framework, plus a JSON ingestion
path that stays file-compatible with the reference's vocoder configs
(``sr/configs/{VCTK,ESD}/hubert100_lut.json``; loaded via ``AttrDict``
in reference ``sr/utils.py:77-80``).
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, List, Optional, Sequence


class AttrDict(dict):
    """Dict with attribute access and ``.get`` defaulting (reference-compatible)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def load_config(path: str) -> AttrDict:
    with open(path) as f:
        return AttrDict(json.load(f))


def build_env(config_path: str, config_name: str, out_dir: str) -> None:
    """Copy the config-of-record into the checkpoint dir (reference ``sr/utils.py:70-75``)."""
    target = os.path.join(out_dir, config_name)
    if config_path != target:
        os.makedirs(out_dir, exist_ok=True)
        shutil.copyfile(config_path, target)


@dataclasses.dataclass
class VocoderConfig:
    """HiFi-GAN vocoder hyper-parameters.

    Field names match the reference JSON schema so configs round-trip;
    see ``sr/configs/VCTK/hubert100_lut.json``.
    """

    resblock: str = "1"
    num_gpus: int = 0
    batch_size: int = 64
    learning_rate: float = 8e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    seed: int = 1234

    upsample_rates: Sequence[int] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_embeddings: int = 100
    embedding_dim: int = 128
    model_in_dim: Optional[int] = 257

    segment_size: int = 8960
    code_hop_size: int = 320
    f0: bool = True
    multispkr: Optional[str] = "_"
    num_mels: int = 80
    num_freq: int = 1025
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024

    sampling_rate: int = 16000
    fmin: int = 0
    fmax: Optional[int] = 8000
    fmax_for_loss: Optional[int] = None

    f0_stats: Optional[str] = None
    f0_normalize: bool = False
    f0_feats: bool = False
    f0_median: bool = False
    f0_interp: bool = False

    input_training_file: str = ""
    input_validation_file: str = ""
    train_base_path: str = ""
    val_base_path: str = ""
    test_base_path: str = ""
    num_workers: int = 4

    # VQ options (reference sr/models.py:137-156); None disables each path.
    lambda_commit: Optional[float] = None
    f0_encoder_params: Optional[dict] = None
    f0_vq_params: Optional[dict] = None
    lambda_commit_code: Optional[float] = None
    code_encoder_params: Optional[dict] = None
    code_vq_params: Optional[dict] = None
    f0_quantizer_path: Optional[str] = None
    f0_quantizer: Optional[dict] = None

    # TPU-specific knobs (no reference counterpart).
    dp_axis: str = "data"
    # Discriminator ensemble sizes.  The reference hardcodes MPD periods
    # (2,3,5,7,11) and 3 MSD scales (sr/models.py:263-333); these stay
    # the defaults.  Smaller ensembles serve resource-bounded validation
    # (e.g. the CPU-simulated multi-chip dry run) and ablations.
    mpd_periods: Sequence[int] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # space-to-channel packed MRF for narrow stages: reshape [B,T,C] to
    # [B,T/P,128] (P=128/C) and run kron-structured 128-lane convs —
    # full lane utilisation and ~P x fewer executed MACs on the long-T
    # tail.  Applies when C <= this and C | 128.  0 disables.
    mrf_pack_max_ch: int = 64
    # Space-to-depth lowering for the discriminators' strided convs
    # (models.layers._strided_conv_s2d): identical math and params,
    # stride-1 MXU execution whose AD backward avoids lhs_dilation.
    # Measured NULL result composed into the full b64 train step
    # (267.6 vs 235.7 ms f32; 326.3 vs 206.7 ms with bf16 discs —
    # PERFORMANCE.md round-3 A/B): the reshape/pad scaffolding defeats
    # XLA fusion around the convs. Kept opt-in for single-conv programs.
    disc_s2d: bool = False
    # Fused MSD G-step (models/msd_fused.py): one custom_vjp around the
    # whole multi-scale stack with a hand-written backward — polyphase
    # input-gradients (no lhs_dilation zero buffers), leaky-relu masks
    # recovered from the feature maps, no weight-gradient paths.  The
    # D step keeps the standard flax apply.  Targeted the round-3
    # roofline finding (MSD G-step HBM-bound, 28.1 GB vs ~10 GB floor).
    # Measured NULL result composed (round-5 quiet-host A/B, all three
    # dtype configs back-to-back: f32 246.9 vs 234.3 ms; disc-bf16 213.7
    # vs 208.9; full-bf16 202.7 vs 198.1 — artifacts/msd_fused_ab_r5.log):
    # like s2d and the polyphase backward before it, the custom_vjp
    # boundary forfeits more XLA fusion than the per-conv savings return.
    # Kept opt-in, equivalence-tested (tests/test_msd_fused.py).
    msd_fused_gstep: bool = False
    # Discriminator compute dtype for training ('float32' | 'bfloat16').
    # bf16 runs the MPD/MSD conv stacks (the dominant GAN-step cost) at
    # 2x MXU peak; params, weight/spectral-norm reparameterisations and
    # all loss reductions stay f32 (losses/gan.py accumulates in f32).
    disc_compute_dtype: str = "float32"
    # True when the generator's weight-norm (v, g) pairs have been folded
    # into direct kernels (models.layers.fold_weight_norm) — the
    # inference-time ``remove_weight_norm`` equivalent.  Modules then
    # declare plain ``kernel`` params so the folded tree applies directly.
    folded_weights: bool = False

    @classmethod
    def from_json(cls, path: str) -> "VocoderConfig":
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "VocoderConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in fields}
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)


@dataclasses.dataclass
class ProsodyConfig:
    """Shared config for the rhythm/pitch predictor trainers.

    Defaults mirror the reference CLIs (``train_len_predictor.py:118-127``,
    ``train_f0_predictor.py:111-121``).
    """

    n_tokens: int = 100
    batch_size: int = 32
    learning_rate: float = 3e-4
    n_epochs: int = 30
    seed: int = 42
    model_type: str = "base"  # pitch model: "base" | "new"
    emb_size: int = 32
    hidden: int = 128
    len_masking_rate: float = 0.2
    pitch_masking_rate: float = 0.4
    max_len: int = 850  # PE capacity (model/pitch_predictor.py:7)
    dp_axis: str = "data"
