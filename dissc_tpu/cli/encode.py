"""HuBERT unit-encoding CLI (reference ``data/encode.py`` surface).

Requires converted HuBERT weights + a k-means codebook (the reference
pulls these through textlesslib at runtime; in a zero-egress deployment
convert once with ``dissc_tpu.models.hubert.convert_hf_state_dict`` and
pass the resulting pickle/npy here).
"""
import argparse
import json
import os
from pathlib import Path

import numpy as np


def load_encoder(weights_path: str, codebook_path: str):
    from dissc_tpu.models.hubert import HubertConfig, SpeechUnitEncoder
    from dissc_tpu.train.checkpoints import load_checkpoint

    params = load_checkpoint(weights_path)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    codebook = np.load(codebook_path) if codebook_path.endswith(".npy") else \
        load_checkpoint(codebook_path)
    return SpeechUnitEncoder(params, np.asarray(codebook))


def main(argv=None):
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="hubert-base-ls960",
                        help="dense model name (informational)")
    parser.add_argument("--quantizer_name", default="kmeans")
    parser.add_argument("--vocab_size", default=100, type=int)
    parser.add_argument("--base_dir", required=True, help="Input audio dir")
    parser.add_argument("--out_file", required=True, help="Output JSONL path")
    parser.add_argument("--device", default="tpu", help="kept for CLI compat; unused")
    parser.add_argument("--hubert_weights", required=True,
                        help="Converted HuBERT params (pickle from convert_hf_state_dict)")
    parser.add_argument("--kmeans_codebook", required=True,
                        help="[vocab, width] k-means centroids (.npy or pickle)")
    args = parser.parse_args(argv)

    from dissc_tpu.core.wav import read_wav

    encoder = load_encoder(args.hubert_weights, args.kmeans_codebook)
    os.makedirs(Path(args.out_file).parent.absolute(), exist_ok=True)

    input_files = sorted(os.listdir(args.base_dir))
    n_done = 0
    for file in input_files:
        try:
            wav, sr = read_wav(os.path.join(args.base_dir, file), dtype="float32")
            encoded = encoder(wav, sr)
        except Exception as e:  # mirror the reference's skip-on-failure
            print(f"\nProblem encoding sample {file}: {e}")
            continue
        encoded["audio"] = file
        with open(args.out_file, "a+") as f:
            f.write(f"{json.dumps(encoded)}\n")
        n_done += 1
    print(f"encoded {n_done}/{len(input_files)} files -> {args.out_file}")


if __name__ == "__main__":
    main()
