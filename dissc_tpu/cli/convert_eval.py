"""All-in-one convert + evaluate pipeline (reference ``scripts/convert_eval.py``).

Where the reference chains five subprocesses through the filesystem
(``:55-57``), this driver calls the framework's engines in-process —
one Python process, models loaded once, state passed directly; only the
external MFA aligner remains a subprocess (skipped gracefully when the
``mfa`` binary is absent — the metric layer then uses the reference's
uniform fallback grids).
"""
import argparse
import os
import shutil
import subprocess
from pathlib import Path


def _init_params(args):
    """Per-dataset constants (reference ``scripts/convert_eval.py:10-52``)."""
    if args.data == "vctk":
        c = dict(src_spk=["p231", "p239", "p245", "p270"],
                 trgt_spk=["p231", "p239", "p245", "p270"],
                 spk_dict={"p231": "6", "p239": "13", "p245": "18", "p270": "43"},
                 wanted_seq=list(range(1, 25)), data_path="data/VCTK/",
                 gt_suf="_mic2.flac", pred_suf="_mic2", tf_name="val", gt_pre="")
    elif args.data == "syn_vctk":
        c = dict(src_spk=["p231", "p232", "p233", "p239", "p245", "p270"],
                 trgt_spk=["p231", "p239", "p245", "p270"],
                 spk_dict={"p231": "6", "p239": "13", "p245": "18", "p270": "43"},
                 wanted_seq=list(range(1, 25)), data_path="data/Syn_VCTK/",
                 gt_suf=".wav", pred_suf="", tf_name="val", gt_pre="")
    elif args.data == "esd":
        c = dict(src_spk=["0014Sad", "0015Surprise", "0017Happy", "0019Sad"],
                 trgt_spk=["0014Sad", "0015Surprise", "0017Happy", "0019Sad"],
                 spk_dict={"0014Sad": "3", "0015Surprise": "4", "0017Happy": "6",
                           "0019Sad": "8"},
                 wanted_seq=list(range(1, 35)), data_path="data/ESD/",
                 gt_suf=".wav", pred_suf="", tf_name="test", gt_pre="paired_test/")
    else:
        raise SystemExit(f"unsupported dataset: {args.data} !")
    c["gen_path"] = f"outputs/{args.data}/{args.dissc_type}/"
    c["out_path"] = f"results/{args.data}/{args.dissc_type}/"
    return c


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="vctk", help="[vctk, esd, syn_vctk]")
    parser.add_argument("--dissc_type", default="dissc_b",
                        help="[dissc_p, dissc_l, dissc_b]")
    parser.add_argument("--sort_gt", action="store_true")
    parser.add_argument("--whisper_model", default=None)
    parser.add_argument("--dtw_align", action="store_true",
                        help="DTW-transfer TextGrids from the reference "
                             "recordings instead of uniform fallback grids")
    args = parser.parse_args(argv)
    c = _init_params(args)

    import json

    from dissc_tpu.cli.infer import main as infer_main
    from dissc_tpu.cli.sr_inference import main as sr_inference_main
    from dissc_tpu.eval.metrics import calc_errors, log_results

    # 1. filter split to wanted source speakers
    path = f"{c['data_path']}/hubert100/"
    sf = path + f"{c['tf_name']}_sf.txt"
    with open(path + f"{c['tf_name']}.txt") as f_in, open(sf, "w+") as f_out:
        for line in f_in:
            if json.loads(line)["audio"].split("/")[-1].split("_")[0] in c["src_spk"]:
                f_out.write(line)

    # 2. prosody conversion (in-process)
    infer_args = [
        "--input_path", sf,
        "--out_path", f"{c['data_path']}/pred_hubert_{args.dissc_type}/",
        "--len_model", f"checkpoints/{args.data}/len/",
        "--f0_model", f"checkpoints/{args.data}/pitch/",
        "--f0_path", f"{c['data_path']}/hubert100/f0_stats.pkl",
        "--vc", "--target_speakers", *c["trgt_spk"], "-n", "1000",
        "--f0_model_type", "base" if args.data in ("vctk", "esd") else "new",
    ]
    if args.dissc_type in ("dissc_l", "dissc_b"):
        infer_args.append("--pred_len")
    if args.dissc_type in ("dissc_p", "dissc_b"):
        infer_args.append("--pred_pitch")
    infer_main(infer_args)

    # 3. vocoder resynthesis per target speaker
    os.makedirs(c["gen_path"], exist_ok=True)
    for t_spk in c["trgt_spk"]:
        sr_inference_main([
            "--input_code_file",
            f"{c['data_path']}/pred_hubert_{args.dissc_type}/{t_spk}_{c['tf_name']}_sf.txt",
            "--data_path", f"{c['data_path']}/wav/{c['gt_pre']}",
            "--output_dir", f"{c['gen_path']}/{t_spk}",
            "--checkpoint_file", f"checkpoints/{args.data.split('_')[-1]}_vocoder",
            "--vc", "--target-speakers", t_spk, "-n", "1000",
        ])

    # 4. restructure outputs (reference :96-122)
    os.makedirs(c["out_path"], exist_ok=True)
    for t_spk in c["trgt_spk"]:
        os.makedirs(f"{c['out_path']}/{t_spk}", exist_ok=True)
        for spk in c["src_spk"]:
            for seq in c["wanted_seq"]:
                try:
                    shutil.copy(
                        f"{c['gen_path']}/{t_spk}/{spk}_{seq:03}{c['pred_suf']}_"
                        f"{c['spk_dict'][t_spk]}_gen.wav",
                        f"{c['out_path']}/{t_spk}/{spk}_{seq:03}.wav",
                    )
                    shutil.copy(f"{c['data_path']}/txt/{spk}/{spk}_{seq:03}.txt",
                                f"{c['out_path']}/{t_spk}/{spk}_{seq:03}.txt")
                except FileNotFoundError:
                    print(f"No sample: {spk}_{seq:03}, this is ok if it only happens "
                          "for few of the samples")

    # 4b. restructure the ground truth into results/<data>/orig/ (reference
    # :112-136): copy/transcode gt recordings + transcripts once per dataset;
    # calc_errors reads this directory for the paired comparisons.
    gt_path = f"results/{args.data}/orig/"
    if args.sort_gt:
        from dissc_tpu.core.wav import read_audio, write_wav

        os.makedirs(gt_path, exist_ok=True)
        for spk in c["src_spk"]:
            for seq in c["wanted_seq"]:
                src = f"{c['data_path']}/wav/{c['gt_pre']}/{spk}_{seq:03}{c['gt_suf']}"
                if os.path.exists(src):
                    # first channel, re-containered as 16 kHz wav like the
                    # reference's torchaudio.load + scipy write (:129-131)
                    data, _ = read_audio(src, dtype="float32")
                    if data.ndim > 1:
                        data = data[..., 0]
                    write_wav(f"{gt_path}/{spk}_{seq:03}.wav", data, 16000)
                    shutil.copy(f"{c['data_path']}/txt/{spk}/{spk}_{seq:03}.txt",
                                f"{gt_path}/{spk}_{seq:03}.txt")
                else:
                    print(f"No sample: {spk}_{seq:03}")

    # 5. MFA alignment (external; skipped when unavailable)
    if shutil.which("mfa"):
        for t_spk in c["trgt_spk"]:
            os.makedirs(f"{c['out_path']}/{t_spk}/txtgrid", exist_ok=True)
            subprocess.run(
                ["mfa", "align", "-s", "4", "--clean", f"{c['out_path']}/{t_spk}/",
                 "english_us_arpa", "english_us_arpa", f"{c['out_path']}/{t_spk}/txtgrid/"],
                check=False,
            )
        if args.sort_gt:
            os.makedirs(f"{gt_path}/txtgrid/", exist_ok=True)
            subprocess.run(
                ["mfa", "align", "-s", "4", "--clean", gt_path,
                 "english_us_arpa", "english_us_arpa", f"{gt_path}/txtgrid/"],
                check=False,
            )
    else:
        print("mfa binary not found — FFE/duration metrics will use uniform "
              "fallback grids" + (" (dtw_align overrides below)"
                                  if args.dtw_align else ""))

    if args.dtw_align:
        from dissc_tpu.eval.align import write_dtw_textgrids

        n = write_dtw_textgrids(f"results/{args.data}", args.dissc_type,
                                c["trgt_spk"])
        print(f"dtw_align: wrote {n} synthetic TextGrids")

    # 6. metrics
    transcribe = None
    if args.whisper_model:
        from dissc_tpu.eval.asr import load_whisper

        transcribe = load_whisper(args.whisper_model)
    errs = calc_errors(f"results/{args.data}", args.dissc_type, c["trgt_spk"], transcribe)
    log_results(errs, f"results/{args.data}", args.dissc_type)


if __name__ == "__main__":
    main()
