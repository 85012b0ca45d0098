"""First-party stand-ins for the reference pipeline's gated third-party deps.

The upstream evaluation/inference stack imports librosa, soundfile,
torchaudio, amfm_decompy (pYAAPT), textgrid, editdistance and whisper
(reference ``eval.py:7-19``, ``sr/dataset.py:14-22``,
``sr/inference.py:20``).  None of those are installed in this image —
but every piece of *functionality* they provide exists natively in
``dissc_tpu`` (mel filterbank, WAV I/O, YAAPT F0, TextGrid parser, edit
distance).  This package exposes that functionality under the exact
module names / call signatures the reference code uses, so the
reference's **own** scripts can be executed unmodified for pipeline
A/B parity runs (``scripts/ref_ab_pipeline.py``).

Usage: prepend :data:`STUB_PATH` to ``sys.path`` (or ``PYTHONPATH``) of
the process that runs reference code.  Real installed packages are NOT
shadowed for anything else — only processes that opt in see these.

The whisper stub returns an identity transcriber that reads the
ground-truth transcript next to the audio file (the same injection the
native ``dissc_tpu.cli.eval`` path uses when no ASR checkpoint is
mounted), so WER/CER comparisons exercise the metric plumbing, not a
speech recogniser.
"""
import os

STUB_PATH = os.path.dirname(os.path.abspath(__file__))


def stub_env(env: dict | None = None) -> dict:
    """Environment for a subprocess that runs reference code: stubs first
    on PYTHONPATH, JAX forced onto CPU (the stubs' DSP is jax-backed and
    must not grab the tunneled TPU).

    .. warning:: The returned env sets ``TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD=1``,
       which disables torch>=2.6 safe loading for EVERY ``torch.load`` in
       the child — not just our self-exported checkpoints.  Only use it
       for processes already trusted to execute reference code end to
       end; do not reuse it as a general-purpose subprocess env builder.
    """
    env = dict(env if env is not None else os.environ)
    parts = [STUB_PATH] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    # the reference targets torch < 2.6 (`torch.load` without
    # weights_only); this image ships torch 2.6+ whose safe-by-default
    # loader rejects the numpy globals in exported checkpoints.  The
    # documented escape hatch restores the semantics the reference's own
    # code assumes — scoped to these opted-in subprocesses only.
    env["TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD"] = "1"
    return env
