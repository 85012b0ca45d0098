"""amfm_decompy.pYAAPT.yaapt — backed by the native tracker.

Both reference call sites (eval.py:31-33, sr/dataset.py:27-43) pre-pad
the waveform by frame_length/2 on each side before calling ``yaapt``;
the native ``yaapt_f0`` applies that same padding internally, so the
stub strips the caller's pad first to keep the framing identical (the
same compensation ``dissc_tpu.eval.metrics.get_yaapt`` performs).
"""
import numpy as np

from dissc_tpu.compat.refstubs._cpu import force_cpu


class PitchObj:
    def __init__(self, samp_values: np.ndarray):
        from dissc_tpu.audio.yaapt import interp_unvoiced

        self.samp_values = np.asarray(samp_values)
        self.samp_interp = interp_unvoiced(self.samp_values)
        self.nframes = self.samp_values.size


def yaapt(signal, frame_length=35.0, frame_space=10.0, f0_min=60.0,
          f0_max=400.0, **kwargs):
    force_cpu()
    from dissc_tpu.audio.yaapt import yaapt_f0

    to_pad = int(frame_length / 1000 * signal.fs) // 2
    data = signal.data
    if data.size > 2 * to_pad and np.all(data[:to_pad] == 0) and np.all(data[-to_pad:] == 0):
        data = data[to_pad:-to_pad]
    f0 = yaapt_f0(
        data.astype(np.float32), int(signal.fs), interp=False,
        frame_length_ms=frame_length, frame_space_ms=frame_space,
        tda_frame_length_ms=float(kwargs.get("tda_frame_length", 25.0)),
    )
    return PitchObj(f0)
