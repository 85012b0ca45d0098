"""amfm_decompy stub (pYAAPT + basic_tools) backed by dissc_tpu.audio.yaapt."""
