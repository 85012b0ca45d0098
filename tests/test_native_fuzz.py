"""Corruption-robustness fuzz for the native C++ decoders.

The reference leans on soundfile/torchaudio for decode robustness; our
first-party loaders (``native/wavloader.cc``, ``native/flacdec.cc``,
``dissc_tpu/core/wav.py``) must never crash the training process on a
damaged file — a corrupt WAV/FLAC must surface as a Python exception
(or a reported failure row for the batch crop loader), not a segfault,
abort, hang, or silent garbage buffer overrun.

The fuzz loop runs in a subprocess so a native crash fails THIS test
with a clear message instead of killing the pytest process.  Mutations
are deterministic (seeded): truncations at every region of the file,
single-byte flips across the header and payload, length-field
corruption, and random garbage with valid magic bytes.
"""
import os
import subprocess
import sys

import pytest

_FUZZ_SCRIPT = r"""
import os, sys, traceback
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

tmp = sys.argv[1]
from flac_ref_encoder import encode_flac
from dissc_tpu.core.wav import read_audio, read_wav, write_wav
from dissc_tpu.data import flac_native, native_loader

rng = np.random.default_rng(0)
samples = (rng.standard_normal(4096) * 6000).astype(np.int16)

wav_path = os.path.join(tmp, "good.wav")
write_wav(wav_path, samples, 16000)
wav_blob = open(wav_path, "rb").read()
flac_blob = encode_flac(samples.astype(np.int32), 16000)

def try_decoders(path):
    # every decode surface; any Python exception is acceptable, a native
    # crash is not (it kills this subprocess -> nonzero exit)
    for fn in (lambda: read_audio(path),
               lambda: read_wav(path),
               lambda: flac_native.flac_info(path),
               lambda: flac_native.read_flac(path),
               lambda: native_loader.wav_info(path),
               lambda: native_loader.load_normalized(path),
               lambda: native_loader.load_crops([path], [0], 1024)):
        try:
            fn()
        except MemoryError:
            # a corrupt length field may imply a huge-but-bounded
            # allocation; rejecting it cleanly is acceptable
            pass
        except Exception:
            pass

def run_case(tag, blob):
    path = os.path.join(tmp, f"fuzz_{tag}.bin")
    with open(path, "wb") as f:
        f.write(blob)
    try_decoders(path)
    os.unlink(path)

n_cases = 0
for name, blob in (("wav", wav_blob), ("flac", flac_blob)):
    b = np.frombuffer(blob, np.uint8).copy()
    # truncations: dense over the header, coarse over the payload
    cuts = list(range(0, min(128, len(b)))) + list(
        np.linspace(128, len(b) - 1, 64, dtype=int))
    for cut in cuts:
        run_case(f"{name}_cut{cut}", b[:cut].tobytes()); n_cases += 1
    # single-byte flips (header-dense + seeded payload positions)
    flips = list(range(0, min(96, len(b)))) + list(
        rng.integers(96, len(b), 64))
    for pos in flips:
        m = b.copy(); m[pos] ^= 0xFF
        run_case(f"{name}_flip{pos}", m.tobytes()); n_cases += 1
    # length/size fields forced to extremes
    for pos in range(4, min(64, len(b) - 4)):
        m = b.copy(); m[pos:pos+4] = 0xFF
        run_case(f"{name}_len{pos}", m.tobytes()); n_cases += 1
    # random garbage behind valid magics
    for i in range(16):
        g = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
        run_case(f"{name}_garb{i}", blob[:4] + g); n_cases += 1
    # valid header + shuffled payload
    m = b.copy()
    rng.shuffle(m[len(b)//2:])
    run_case(f"{name}_shuf", m.tobytes()); n_cases += 1

# and the good files must still decode correctly afterwards
w, sr = read_audio(wav_path)
assert sr == 16000 and np.array_equal(w, samples)
fp = os.path.join(tmp, "good.flac")
open(fp, "wb").write(flac_blob)
d, sr = flac_native.read_flac(fp, dtype="int16")
assert sr == 16000 and np.array_equal(d, samples)
print(f"OK {n_cases} cases")
"""


@pytest.mark.fast
def test_native_decoders_survive_corruption(tmp_path):
    script = tmp_path / "fuzz_driver.py"
    script.write_text(_FUZZ_SCRIPT)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__)) + os.pathsep
                         + repo_root + os.pathsep + env.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, (
        f"native decoder fuzz crashed (exit {proc.returncode}) — a corrupt "
        f"file must raise, not kill the process.\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}")
    assert "OK" in proc.stdout
