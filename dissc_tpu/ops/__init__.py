"""Compute-op namespace: the jittable building blocks.

Stable re-export surface over the implementation modules.
"""
from dissc_tpu.audio.mel import mel_filterbank, mel_spectrogram, stft_magnitude
from dissc_tpu.audio.yaapt import interp_unvoiced, yaapt_f0, yaapt_f0_batch
from dissc_tpu.core.seqops import (
    dedup_padded,
    dedup_seq,
    interp,
    len_carryover_correction,
    morph_seq_len,
    nearest_upsample,
    repeat_interleave_padded,
)
from dissc_tpu.models.hubert import kmeans_quantize
from dissc_tpu.models.layers import fold_weight_norm
