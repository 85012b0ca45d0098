"""Close the eval loop on the real-speech training run (VERDICT r4 item 6).

Takes the GAN vocoder trained by ``scripts/train_real_speech.py`` on the
bundled real-speech corpus, synthesizes every utterance through the
inference engine, lays the outputs into the reference's results-tree
shape, and runs the FULL 8-metric suite (``eval/metrics.py`` — the
native rebuild of reference ``eval.py:60-139``) over them:
WER/CER (identity ASR: no Whisper weights exist in this zero-egress
image, so the text path is plumbing-level as in the round-4 reference
A/B), pitch EMD, waveform length error, and the MFA-fallback word/char
duration + FFE metrics over uniform grids.

Run:      python scripts/eval_real_speech.py [--root /tmp/real_speech_r4]
Output:   artifacts/real_speech_r5_metrics.json
"""
import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/real_speech_r4")
    ap.add_argument("--method", default="dissc_native")
    args = ap.parse_args()

    from dissc_tpu.eval.metrics import calc_errors, log_results
    from dissc_tpu.infer.vocoder import run_inference
    from dissc_tpu.utils.cache import enable_compilation_cache
    from ref_ab_pipeline import write_uniform_gt_textgrids

    enable_compilation_cache()
    base = os.path.join(args.root, "corpus")
    ckpt = os.path.join(args.root, "vocoder")
    assert os.path.exists(os.path.join(ckpt, "config.json")), (
        f"no trained checkpoint at {ckpt} — run scripts/train_real_speech.py first")

    # one manifest with every utterance (3 train + 1 val — train items
    # are resynthesis of seen data; the val item is the held-out proof)
    all_txt = os.path.join(args.root, "all.txt")
    seen = set()
    with open(all_txt, "w") as out:
        for split in ("train", "val"):
            with open(os.path.join(base, f"{split}.txt")) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["audio"] in seen:
                        continue  # train manifest repeats records
                    seen.add(rec["audio"])
                    out.write(line)

    stage = os.path.join(args.root, "eval_stage")
    shutil.rmtree(stage, ignore_errors=True)
    rtf = run_inference(checkpoint_file=ckpt, input_code_file=all_txt,
                        output_dir=stage, data_path=os.path.join(base, "wav"))
    print(f"[eval_real] synthesized {len(seen)} utterances (rtf {rtf:.5f})",
          flush=True)

    # reference results-tree shape (scripts/convert_eval.py:55-139):
    # orig/{trg}_{seq}.wav + transcripts; {method}/{trg}/src_{seq}.wav.
    # Stems must NOT contain the target speaker (that marks
    # reconstruction, which calc_errors skips).
    res_dir = os.path.join(args.root, "results")
    shutil.rmtree(res_dir, ignore_errors=True)
    orig = os.path.join(res_dir, "orig")
    gen = os.path.join(res_dir, args.method, "s1")
    os.makedirs(orig)
    os.makedirs(gen)
    val_names = set()
    with open(os.path.join(base, "val.txt")) as f:
        for line in f:
            val_names.add(os.path.splitext(json.loads(line)["audio"])[0])

    names = sorted(n[: -len("_gen.wav")] for n in os.listdir(stage)
                   if n.endswith("_gen.wav"))
    split_of = {}
    for i, name in enumerate(names, 1):
        seq = f"{i:03d}"
        # no real transcripts exist for the bundled wavs; a deterministic
        # pseudo-transcript exercises the WER/CER path end to end.
        # Digit-free: the reference normalisation maps digits to words on
        # the HYPOTHESIS only (eval.py:36-47), so digits in the text
        # would make even an identity transcriber score nonzero WER.
        digit_words = {d: w for d, w in zip("0123456789",
                       ["zero", "one", "two", "three", "four", "five",
                        "six", "seven", "eight", "nine"])}
        clean = "".join(digit_words.get(c, c) for c in name.replace("_", " "))
        text = f"bundled real speech utterance {clean}"
        shutil.copy(os.path.join(stage, f"{name}_gt.wav"),
                    os.path.join(orig, f"s1_{seq}.wav"))
        with open(os.path.join(orig, f"s1_{seq}.txt"), "w") as f:
            f.write(text + "\n")
        shutil.copy(os.path.join(stage, f"{name}_gen.wav"),
                    os.path.join(gen, f"src_{seq}.wav"))
        with open(os.path.join(gen, f"src_{seq}.txt"), "w") as f:
            f.write(text + "\n")
        split_of[seq] = "val" if name in val_names else "train"

    n_grids = write_uniform_gt_textgrids(res_dir)
    print(f"[eval_real] wrote {n_grids} uniform gt TextGrids", flush=True)

    transcripts = {os.path.normpath(os.path.splitext(f)[0]):
                   open(f).readline().strip()
                   for f in glob.glob(f"{gen}/*.txt")}

    def identity_transcribe(path):
        # calc_errors passes glob paths with doubled separators
        return transcripts[os.path.normpath(os.path.splitext(path)[0])]

    err = calc_errors(res_dir, args.method, ["s1"], identity_transcribe)
    summary = log_results(err, res_dir, args.method)

    # second pass with the native DTW fallback aligner (opt-in path):
    # boundary-transferred grids replace the uniform fallback
    from dissc_tpu.eval.align import write_dtw_textgrids

    n_dtw = write_dtw_textgrids(res_dir, args.method, ["s1"])
    print(f"[eval_real] wrote {n_dtw} DTW TextGrids", flush=True)
    err_dtw = calc_errors(res_dir, args.method, ["s1"], identity_transcribe)
    summary_dtw = log_results(err_dtw, res_dir, args.method)

    out = {
        "checkpoint_steps": 3000,
        "corpus": "reference bundled wavs split into 4 utterances "
                  "(3 train / 1 held-out val)",
        "utterances": {f"s1_{k}": v for k, v in split_of.items()},
        "inference_rtf": rtf,
        "asr": "identity transcriber (no local Whisper weights; "
               "WER/CER exercise the metric plumbing only)",
        "alignment": "uniform fallback grids (reference eval.py:106-125 "
                     "behaviour when MFA is absent)",
        "metrics": {k: (None if isinstance(v, float) and np.isnan(v) else v)
                    for k, v in summary.items()},
        "metrics_dtw_aligned": {
            k: (None if isinstance(v, float) and np.isnan(v) else v)
            for k, v in summary_dtw.items()},
        "n_eval_files": len(err["len"]),
    }
    art = os.path.join(REPO, "artifacts", "real_speech_r5_metrics.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[eval_real] wrote {art}", flush=True)


if __name__ == "__main__":
    main()
