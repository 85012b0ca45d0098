"""Metric logging.

One unified TensorBoard writer (tensorboardX) replacing the reference's
split stack (tf.summary for prosody at ``utils.py:22-37``, torch
SummaryWriter for the vocoder at ``sr/train.py:121``).  Falls back to a
JSONL metrics file if tensorboardX is unavailable.
"""
from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def scalars(self, values: Dict[str, float], step: int, prefix: str = "") -> None:
        for k, v in values.items():
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}{k}", float(v), step)
        self._jsonl.write(json.dumps({"step": step, "ts": time.time(),
                                      **{f"{prefix}{k}": float(v) for k, v in values.items()}}) + "\n")
        self._jsonl.flush()

    def audio(self, tag: str, wav, step: int, sample_rate: int = 16000) -> None:
        try:
            if self._tb is not None:
                self._tb.add_audio(tag, wav.reshape(1, -1), step,
                                   sample_rate=sample_rate)
        except Exception:
            # tensorboardX's audio summary needs soundfile (absent in this
            # image); fall back to a plain WAV next to the logs
            from dissc_tpu.core.wav import write_wav

            safe = tag.replace("/", "_")
            write_wav(os.path.join(self.logdir, f"{safe}_{step}.wav"), wav,
                      sample_rate)

    def figure(self, tag: str, fig, step: int) -> None:
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


def plot_spectrogram(spectrogram):
    """Matplotlib figure of a mel spectrogram for TB validation samples
    (reference ``sr/utils.py:20-29``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close(fig)
    return fig


def init_loggers(path: str):
    """Fresh train/val writers; wipes prior logs and best model
    (reference ``utils.py:22-29`` semantics)."""
    for sub in ("train", "val"):
        if os.path.exists(os.path.join(path, sub)):
            shutil.rmtree(os.path.join(path, sub))
    best = os.path.join(path, "best_model.pth")
    if os.path.exists(best):
        os.remove(best)
    return MetricLogger(os.path.join(path, "train")), MetricLogger(os.path.join(path, "val"))


def log_metrics(logger: MetricLogger, value_dict: Dict[str, float], epoch: int,
                name: str = "train") -> None:
    logger.scalars(value_dict, epoch)
    print(", ".join(f"{name}_{k}: {float(v):.5f}" for k, v in value_dict.items()))
