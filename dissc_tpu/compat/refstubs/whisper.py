"""whisper stub — identity transcriber for gated-weights environments.

``load_model`` (reference eval.py:156) returns a transcriber that reads
the ground-truth transcript stored next to the audio file — the same
injection the native eval CLI uses when no Whisper checkpoint is
mounted, so A/B runs compare metric plumbing on both sides rather than
a speech recogniser neither side has.
"""
import os


class _IdentityASR:
    def eval(self):
        return self

    def to(self, device):
        return self

    def transcribe(self, path, **kwargs):
        txt = os.path.splitext(str(path))[0] + ".txt"
        text = open(txt).readline().strip() if os.path.exists(txt) else ""
        return {"text": text}


def load_model(name, device=None, **kwargs):
    return _IdentityASR()
