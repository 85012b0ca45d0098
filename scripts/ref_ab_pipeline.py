"""Pipeline-level A/B against the ACTUAL reference implementation.

Trains tiny toy-corpus checkpoints with the native trainers, exports
them to the reference's torch layouts (compat.torch_export), then runs
the reference's own scripts — ``infer.py`` (prosody conversion),
``sr/inference.py`` (vocoder synthesis) and ``eval.py`` (metric suite)
— as subprocesses on the same inputs, with their gated third-party deps
provided by ``dissc_tpu.compat.refstubs``.  Compares stage by stage:

  A. prosody conversion — converted unit sequences + f0 contours from
     reference ``infer.py`` vs ``dissc_tpu.cli.infer`` (same checkpoint,
     same seed): unit sequences must match exactly on ≥ UNITS_MATCH_MIN
     of files, f0 within F0_TOL.
  B. vocoder — reference ``sr/inference.py`` vs ``dissc_tpu.cli.
     sr_inference`` on the SAME converted JSONL: per-file waveform
     length equal and log-mel L1 ≤ MEL_DB_TOL dB.
  C. metric suite — reference ``eval.py`` vs ``dissc_tpu.eval.metrics``
     on the SAME results tree (identity transcriber injected both
     sides): every scalar within METRIC_RTOL.

Writes the side-by-side table to ``artifacts/ref_ab_r4.json``.  Run on
CPU (`python scripts/ref_ab_pipeline.py [scratch_root]`); ~15 min on one
core, dominated by the YAAPT compiles inside both eval suites.

Reference entry points exercised: infer.py:47-122,174-207,
sr/inference.py:172-256,259-359, eval.py:26-145.
"""
import json
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("DISSC_REFERENCE_DIR", "/root/reference")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

UNITS_MATCH_MIN = 0.95   # fraction of files with exactly-equal unit seqs
F0_TOL = 1.0             # Hz, max |Δf0| on files with matching lengths
MEL_DB_TOL = 0.5         # dB, log-mel L1 between ref/native waveforms
METRIC_RTOL = 5e-3       # relative, eval-suite scalars

TRGT = ["p231", "p239", "p245", "p270"]


def _force_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def _ref_env():
    from dissc_tpu.compat.refstubs import stub_env

    env = stub_env()
    env["PYTHONPATH"] = os.pathsep.join(
        [env["PYTHONPATH"], REFERENCE, REPO])
    env.setdefault("CUDA_VISIBLE_DEVICES", "")
    return env


def _run(argv, cwd, log_name, env=None):
    print(f"[ref_ab] run {log_name}: {' '.join(map(str, argv))}", flush=True)
    r = subprocess.run(list(map(str, argv)), cwd=cwd, env=env or _ref_env(),
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"{log_name} failed rc={r.returncode}")
    return r


def export_reference_checkpoints(root: str) -> str:
    """Our trained pickles -> the reference's torch checkpoint layouts."""
    import torch

    from dissc_tpu.compat.torch_export import (export_code_generator,
                                               export_len_predictor,
                                               export_pitch_predictor,
                                               save_torch_checkpoint)
    from dissc_tpu.core.config import VocoderConfig
    from dissc_tpu.train.checkpoints import load_checkpoint, scan_checkpoint

    ref_ckpt = os.path.join(root, "ref_ckpt")
    # prosody: best_model.pth + len_norm_stats.pth (infer.py:71-72,84)
    for kind, exporter in (("len", export_len_predictor),
                           ("pitch", export_pitch_predictor)):
        src = os.path.join(root, "checkpoints", "syn_vctk", kind)
        dst = os.path.join(ref_ckpt, kind)
        os.makedirs(dst, exist_ok=True)
        variables = load_checkpoint(os.path.join(src, "best_model.pth"))
        save_torch_checkpoint(os.path.join(dst, "best_model.pth"),
                              exporter(variables))
        if kind == "len":
            mean, std = load_checkpoint(os.path.join(src, "len_norm_stats.pth"))
            torch.save((torch.tensor(np.asarray(mean)),
                        torch.tensor(np.asarray(std))),
                       os.path.join(dst, "len_norm_stats.pth"))
    # vocoder: g_<8d> + config.json (sr/inference.py:105-120)
    voc_src = os.path.join(root, "checkpoints", "vctk_vocoder")
    voc_dst = os.path.join(ref_ckpt, "vocoder")
    os.makedirs(voc_dst, exist_ok=True)
    h = VocoderConfig.from_json(os.path.join(voc_src, "config.json"))
    cp_g = scan_checkpoint(voc_src, "g_")
    gen_params = load_checkpoint(cp_g)["generator"]
    sd = export_code_generator(gen_params, h)
    save_torch_checkpoint(os.path.join(voc_dst, os.path.basename(cp_g)),
                          {"generator": sd})
    shutil.copy(os.path.join(voc_src, "config.json"),
                os.path.join(voc_dst, "config.json"))
    return ref_ckpt


def stage_a_prosody(root: str, ref_ckpt: str) -> dict:
    """Reference infer.py vs our converted JSONLs (already produced by
    the native convert_eval pipeline in ``run_pipeline``)."""
    hub = os.path.join(root, "data", "Syn_VCTK", "hubert100")
    ref_out = os.path.join(root, "ref_out", "pred_hubert")
    os.makedirs(ref_out, exist_ok=True)
    # infer.py wraps its dataset in Subset(ds, range(n)) — n must not
    # exceed the file count (infer.py:62)
    n_files = sum(1 for l in open(os.path.join(hub, "val_sf.txt")) if l.strip())
    _run([sys.executable, os.path.join(REFERENCE, "infer.py"),
          "--input_path", os.path.join(hub, "val_sf.txt"),
          "--out_path", ref_out,
          "--len_model", os.path.join(ref_ckpt, "len") + "/",
          "--f0_model", os.path.join(ref_ckpt, "pitch") + "/",
          "--f0_path", os.path.join(hub, "f0_stats.pkl"),
          "--f0_model_type", "new", "--device", "cpu",
          "--pred_len", "--pred_pitch", "--vc",
          "--target_speakers", *TRGT, "-n", n_files],
         cwd=REFERENCE, log_name="reference infer.py")

    ours_dir = os.path.join(root, "data", "Syn_VCTK", "pred_hubert_dissc_b")
    total = matched = 0
    f0_max = 0.0
    per_file = {}
    for trg in TRGT:
        fname = f"{trg}_val_sf.txt"
        ours = [json.loads(l) for l in open(os.path.join(ours_dir, fname))]
        refs = [json.loads(l) for l in open(os.path.join(ref_out, fname))]
        assert len(ours) == len(refs), (fname, len(ours), len(refs))
        for o, r in zip(ours, refs):
            total += 1
            same_units = o["units"] == r["units"]
            matched += same_units
            d = float("nan")
            if same_units and len(o["f0"]) == len(r["f0"]):
                d = float(np.max(np.abs(np.asarray(o["f0"])
                                        - np.asarray(r["f0"])))) if o["f0"] else 0.0
                f0_max = max(f0_max, d)
            per_file[f"{trg}/{r['audio']}"] = {
                "units_equal": bool(same_units), "f0_max_abs_diff": d}
    frac = matched / max(total, 1)
    return {"files": total, "units_exact_match_frac": frac,
            "f0_max_abs_diff_hz": f0_max,
            "pass": frac >= UNITS_MATCH_MIN and f0_max <= F0_TOL,
            "thresholds": {"units_match_min": UNITS_MATCH_MIN,
                           "f0_tol_hz": F0_TOL}}


def stage_b_vocoder(root: str, ref_ckpt: str) -> dict:
    """Reference sr/inference.py vs our wavs, both fed OUR converted
    JSONL (isolates the vocoder; prosody differences measured in A)."""
    _force_cpu()
    import jax.numpy as jnp

    from dissc_tpu.audio.mel import mel_spectrogram
    from dissc_tpu.core.wav import read_wav

    wav_base = os.path.join(root, "data", "Syn_VCTK", "wav")
    code_dir = os.path.join(root, "data", "Syn_VCTK", "pred_hubert_dissc_b")
    results = {}
    worst = 0.0
    n = 0
    len_ok = True
    for trg in TRGT:
        out_dir = os.path.join(root, "ref_out", "wavs", trg)
        os.makedirs(out_dir, exist_ok=True)
        _run([sys.executable,
              os.path.join(REPO, "scripts", "ref_ab", "run_ref_sr_inference.py"),
              os.path.join(REFERENCE, "sr"),
              "--input_code_file", os.path.join(code_dir, f"{trg}_val_sf.txt"),
              "--data_path", wav_base,
              "--output_dir", out_dir,
              "--checkpoint_file", os.path.join(ref_ckpt, "vocoder") + "/",
              "--vc", "--target-speakers", trg, "-n", "1000", "--debug"],
             cwd=REFERENCE, log_name=f"reference sr/inference.py [{trg}]")
        ours_dir = os.path.join(root, "outputs", "syn_vctk", "dissc_b", trg)
        for f in sorted(os.listdir(out_dir)):
            if not f.endswith("_gen.wav") or f.endswith("_gt.wav"):
                continue
            ours_f = os.path.join(ours_dir, f)
            if not os.path.exists(ours_f):
                continue
            ref_wav, _ = read_wav(os.path.join(out_dir, f), dtype="float32")
            our_wav, _ = read_wav(ours_f, dtype="float32")
            n += 1
            if ref_wav.shape != our_wav.shape:
                len_ok = False
                results[f"{trg}/{f}"] = {"len_ref": int(ref_wav.size),
                                         "len_ours": int(our_wav.size)}
                continue
            mel_r = mel_spectrogram(jnp.asarray(ref_wav)[None], 1024, 80,
                                    16000, 256, 1024, 0, 8000)
            mel_o = mel_spectrogram(jnp.asarray(our_wav)[None], 1024, 80,
                                    16000, 256, 1024, 0, 8000)
            d = float(jnp.mean(jnp.abs(mel_r - mel_o))) * 20 / np.log(10)
            worst = max(worst, d)
            results[f"{trg}/{f}"] = {"logmel_l1_db": d}
    return {"files": n, "all_lengths_equal": len_ok,
            "worst_logmel_l1_db": worst,
            "pass": len_ok and n > 0 and worst <= MEL_DB_TOL,
            "thresholds": {"mel_db_tol": MEL_DB_TOL}, "per_file": results}


def write_uniform_gt_textgrids(res_dir: str) -> int:
    """Materialise uniform ground-truth TextGrids for every gt wav.

    The reference ``eval.py:105`` reads ``{gt}/txtgrid/*.TextGrid``
    unconditionally (MFA output in its setup); our suite skips files
    without grids.  For the A/B both suites must read IDENTICAL grids,
    so build the deterministic uniform grids (words = transcript tokens,
    phones = their characters, spread evenly over the audio) that MFA's
    absence would otherwise imply.  Returns the number written.
    """
    from dissc_tpu.core.wav import read_wav

    orig = os.path.join(res_dir, "orig")
    tg_dir = os.path.join(orig, "txtgrid")
    os.makedirs(tg_dir, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(orig)):
        if not f.endswith(".wav"):
            continue
        stem = f[:-4]
        txt = os.path.join(orig, stem + ".txt")
        text = open(txt).readline().strip() if os.path.exists(txt) else ""
        wav, sr = read_wav(os.path.join(orig, f), dtype="float32")
        dur = len(wav) / sr
        words = text.split() or ["x"]
        phones = [c for w in words for c in w] or ["x"]
        lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
                 "xmin = 0", f"xmax = {dur:.6f}", "tiers? <exists>",
                 "size = 2", "item []:"]
        for ti, (name, marks) in enumerate((("words", words),
                                            ("phones", phones)), 1):
            lines += [f"    item [{ti}]:", '        class = "IntervalTier"',
                      f'        name = "{name}"', "        xmin = 0",
                      f"        xmax = {dur:.6f}",
                      f"        intervals: size = {len(marks)}"]
            for i, mark in enumerate(marks):
                x0, x1 = dur * i / len(marks), dur * (i + 1) / len(marks)
                lines += [f"        intervals [{i + 1}]:",
                          f"            xmin = {x0:.6f}",
                          f"            xmax = {x1:.6f}",
                          f'            text = "{mark}"']
        with open(os.path.join(tg_dir, stem + ".TextGrid"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
        n += 1
    return n


def stage_c_eval(root: str) -> dict:
    """Reference eval.py vs our metric suite on the SAME results tree."""
    res_dir = os.path.join(root, "results", "syn_vctk")
    n_grids = write_uniform_gt_textgrids(res_dir)
    print(f"[ref_ab] wrote {n_grids} uniform gt TextGrids", flush=True)
    # regenerate OUR metrics now that gt grids exist (the run_pipeline
    # pass evaluated without them, so alignment metrics were skipped)
    _run([sys.executable, "-m", "dissc_tpu.cli.eval", "--base_path", res_dir,
          "--method", "dissc_b", "--device", "cpu",
          "--target_speakers", *TRGT],
         cwd=REPO, log_name="native eval (with gt grids)")
    ours_pkl = os.path.join(res_dir, "dissc_b_results.pkl")
    with open(ours_pkl, "rb") as f:
        ours = pickle.load(f)
    saved = ours_pkl + ".ours"
    shutil.move(ours_pkl, saved)
    try:
        _run([sys.executable, os.path.join(REFERENCE, "eval.py"),
              "--base_path", res_dir, "--method", "dissc_b",
              "--device", "cpu", "--target_speakers", *TRGT],
             cwd=REFERENCE, log_name="reference eval.py")
        with open(ours_pkl, "rb") as f:
            ref = pickle.load(f)
    finally:
        if os.path.exists(ours_pkl):
            os.replace(ours_pkl, ours_pkl + ".ref")
        shutil.move(saved, ours_pkl)

    def scalars(d):
        out = {"WER": d["wer_s"] / max(d["wer_d"], 1),
               "CER": d["cer_s"] / max(d["cer_d"], 1),
               "EMD": float(np.mean(d["emd"])),
               "LenError_s": float(np.mean(d["len"])) / 16000.0,
               "WordLenErr": float(np.mean(d["w_len"])) if d["w_len"] else 0.0,
               "CharLenErr": float(np.mean(d["p_len"])) if d["p_len"] else 0.0,
               "WordFFE": float(np.mean(d["w_ffe"])) if d["w_ffe"] else 0.0,
               "CharFFE": float(np.mean(d["p_ffe"])) if d["p_ffe"] else 0.0}
        return out

    s_ref, s_ours = scalars(ref), scalars(ours)
    table = {}
    ok = True
    for k in s_ref:
        r, o = s_ref[k], s_ours[k]
        close = bool(np.isclose(r, o, rtol=METRIC_RTOL, atol=1e-6))
        ok &= close
        table[k] = {"reference": r, "ours": o, "close": close}
    return {"pass": ok, "metrics": table,
            "thresholds": {"rtol": METRIC_RTOL}}


def main(root: str) -> dict:
    _force_cpu()
    import toy_convert_eval as toy

    os.makedirs(root, exist_ok=True)
    # idempotent stage gating: a rerun after a downstream failure reuses
    # the (deterministic) native corpus/checkpoints/pipeline outputs
    if not os.path.exists(os.path.join(root, "checkpoints", "vctk_vocoder",
                                       "config.json")):
        print("[ref_ab] building toy corpus + training checkpoints", flush=True)
        toy.build_corpus(root)
        toy.train_checkpoints(root)
    else:
        print("[ref_ab] reusing existing toy corpus + checkpoints", flush=True)
    if not os.path.exists(os.path.join(root, "results", "syn_vctk",
                                       "dissc_b_results.pkl")):
        print("[ref_ab] running the native convert_eval pipeline", flush=True)
        toy.run_pipeline(root, sort_gt=True)
    else:
        print("[ref_ab] reusing existing native pipeline outputs", flush=True)
    ref_ckpt = export_reference_checkpoints(root)

    report = {"scratch_root": root}
    report["A_prosody_convert"] = stage_a_prosody(root, ref_ckpt)
    report["B_vocoder"] = stage_b_vocoder(root, ref_ckpt)
    report["C_metric_suite"] = stage_c_eval(root)
    report["pass"] = all(report[k]["pass"] for k in
                         ("A_prosody_convert", "B_vocoder", "C_metric_suite"))

    out = os.path.join(REPO, "artifacts",
                       os.environ.get("REF_AB_OUT", "ref_ab_r4.json"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # numpy scalars (np.bool_/np.float64 from the comparisons) are not
    # JSON-native; .item() converts them.  Sanitize AFTER dropping the
    # bulky per-file map, not before.
    report_slim = dict(report)
    report_slim["B_vocoder"] = {k: v for k, v in report["B_vocoder"].items()
                                if k != "per_file"}
    slim = json.loads(json.dumps(
        report_slim,
        default=lambda o: o.item() if hasattr(o, "item") else str(o)))
    with open(out, "w") as f:
        json.dump(slim, f, indent=1)
    print(json.dumps(slim, indent=1))
    print(f"[ref_ab] {'PASS' if report['pass'] else 'FAIL'} -> {out}")
    return report


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_ab")
