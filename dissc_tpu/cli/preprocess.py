"""Audio preprocessing CLI (reference ``data/preprocess.py``).

Resample to 16 kHz, optional silence trim (top_db=20), optional zero-pad
to a multiple of 1280, fanned out over a process pool.
"""
import argparse
from functools import partial
from multiprocessing import Pool
from pathlib import Path

import numpy as np

from dissc_tpu.audio.resample import resample_poly_np, trim_silence
from dissc_tpu.core.wav import read_wav, write_wav


def pad_data(p: Path, out_dir: Path, trim: bool = False, pad: bool = False) -> None:
    data, sr = read_wav(str(p), dtype="float32")
    if sr != 16000:
        data = resample_poly_np(data, sr, 16000)
        sr = 16000
    if trim:
        data, _ = trim_silence(data, top_db=20)
    if pad and data.shape[0] % 1280 != 0:
        data = np.pad(data, (0, 1280 - data.shape[0] % 1280), mode="constant")
    outpath = out_dir / p.name
    outpath.parent.mkdir(exist_ok=True, parents=True)
    write_wav(str(outpath), data, sr)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--srcdir", type=Path, required=True)
    parser.add_argument("--outdir", type=Path, required=True)
    parser.add_argument("--trim", action="store_true")
    parser.add_argument("--pad", action="store_true")
    parser.add_argument("--postfix", type=str, default="wav")
    parser.add_argument("--workers", type=int, default=40)
    args = parser.parse_args(argv)

    files = list(Path(args.srcdir).glob(f"**/*{args.postfix}"))
    fn = partial(pad_data, out_dir=Path(args.outdir), trim=args.trim, pad=args.pad)
    if args.workers <= 1:
        for f in files:
            fn(f)
    else:
        with Pool(args.workers) as p:
            list(p.imap(fn, files))
    print(f"processed {len(files)} files -> {args.outdir}")


if __name__ == "__main__":
    main()
