"""dissc_tpu — a TPU-native speaking-style-conversion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
gallilmaimon/DISSC ("Speaking Style Conversion With Discrete
Self-Supervised Units", EMNLP 2023 Findings): textless any-to-many
voice + prosody conversion via discrete HuBERT units.

Pipeline (reference parity, see SURVEY.md):
  1. ``dissc_tpu.audio`` + ``dissc_tpu.models.hubert`` — 16 kHz speech ->
     discrete units (50 Hz) + YAAPT F0 (200 Hz).
  2. ``dissc_tpu.models.prosody`` — target-speaker rhythm (unit
     durations) and pitch-contour prediction.
  3. ``dissc_tpu.models.hifigan`` — HiFi-GAN-style unit-to-waveform
     vocoder (320x upsampling).

Design is TPU-first: static-shape capacity-padded sequence ops
(``dissc_tpu.core.seqops``), Flax modules in NWC layout feeding the MXU,
``jax.sharding``-based data parallelism (``dissc_tpu.parallel``), and
Pallas kernels for the vocoder hot path (``dissc_tpu.kernels``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: keep `import dissc_tpu` free of jax/flax import cost
    if name == "ConversionPipeline":
        from dissc_tpu.pipeline import ConversionPipeline

        return ConversionPipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
