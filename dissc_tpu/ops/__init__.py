"""Public compute-op API: every jittable building block in one namespace.

The implementation lives next to its subsystem (``audio/``, ``core/``,
``kernels/``, ``models/``); this package is the STABLE import surface a
downstream user composes with — the op-level equivalent of the model
zoo.  ``tests/test_ops_namespace.py`` pins the inventory so the surface
cannot silently shrink.

Groups:
  signal     — STFT / log-mel (XLA matmul-DFT and fused Pallas forms),
               polyphase resampling, Whisper's mel frontend
  pitch      — the native YAAPT F0 tracker (single + batched)
  sequences  — dedup / re-timing / interpolation ops over unit sequences
               (host and capacity-padded jittable forms)
  quantize   — k-means nearest-centroid assignment (MXU matmul form)
  params     — weight-norm folding for inference-time param trees
"""
# signal
from dissc_tpu.audio.mel import mel_filterbank, mel_spectrogram, stft_magnitude
from dissc_tpu.audio.resample import resample_poly_np, trim_silence
from dissc_tpu.kernels.mel_kernel import (
    mel_spectrogram_pallas,
    mel_spectrogram_pallas_grad,
)
from dissc_tpu.models.whisper import log_mel_spectrogram as whisper_log_mel

# pitch
from dissc_tpu.audio.yaapt import interp_unvoiced, yaapt_f0, yaapt_f0_batch

# sequences
from dissc_tpu.core.seqops import (
    dedup_padded,
    dedup_seq,
    interp,
    len_carryover_correction,
    morph_seq_len,
    nearest_upsample,
    repeat_interleave_padded,
)

# quantize
from dissc_tpu.models.hubert import kmeans_quantize

# params
from dissc_tpu.models.layers import fold_weight_norm

__all__ = [
    "mel_filterbank", "mel_spectrogram", "stft_magnitude",
    "resample_poly_np", "trim_silence", "mel_spectrogram_pallas",
    "mel_spectrogram_pallas_grad", "whisper_log_mel",
    "interp_unvoiced", "yaapt_f0", "yaapt_f0_batch",
    "dedup_padded", "dedup_seq", "interp", "len_carryover_correction",
    "morph_seq_len", "nearest_upsample", "repeat_interleave_padded",
    "kmeans_quantize", "fold_weight_norm",
]
