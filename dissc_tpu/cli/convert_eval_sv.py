"""Speaker-verification convert+eval pipeline (reference
``scripts/convert_eval_sv.py``): prosody-convert per the SV pair CSV,
vocode per target speaker, restructure, score EER.
"""
import argparse
import os
import pickle
import shutil
from pathlib import Path


def _init_params(args):
    if args.data == "vctk":
        spk = ['p244', 'p236', 'p300', 'p265', 'p288', 'p304', 'p302', 'p334', 'p232',
               'p253', 'p286', 'p284', 'p227', 'p228', 'p317', 'p258', 'p261', 'p329',
               'p339', 'p347', 'p272', 'p271', 'p293', 'p308', 'p249', 'p237', 'p361',
               'p252', 'p273', 'p305', 'p274', 'p364', 'p263', 'p298', 'p276', 'p241',
               'p260', 'p341', 'p299', 'p330', 'p256', 'p264', 'p259', 'p374', 'p239',
               'p351', 'p311', 's5', 'p282', 'p257', 'p313', 'p307', 'p310', 'p323',
               'p360', 'p363', 'p312', 'p306', 'p343', 'p247', 'p314', 'p292', 'p266',
               'p255', 'p230', 'p287', 'p234', 'p238', 'p250', 'p275', 'p233', 'p262',
               'p326', 'p279', 'p345', 'p333', 'p246', 'p254', 'p243', 'p295', 'p240',
               'p248', 'p229', 'p245', 'p376', 'p318', 'p316', 'p268', 'p231', 'p226',
               'p285', 'p294', 'p283', 'p362', 'p251', 'p269', 'p270', 'p297', 'p278',
               'p336', 'p281', 'p225', 'p267', 'p303', 'p340', 'p301', 'p277', 'p335']
        c = dict(spk=spk, data_path="data/VCTK/", gt_suf="_mic2.flac",
                 pred_suf="_mic2", tf_name="val", gt_pre="")
    elif args.data == "esd":
        spk = ['0019Sad', '0012Happy', '0013Neutral', '0016Angry', '0011Angry',
               '0018Neutral', '0017Happy', '0020Surprise', '0015Surprise', '0014Sad']
        c = dict(spk=spk, data_path="data/ESD/", gt_suf=".wav", pred_suf="",
                 tf_name="test", gt_pre="paired_test/")
    else:
        raise SystemExit(f"unsupported dataset: {args.data} !")
    c["gen_path"] = f"outputs/{args.data}/sv/{args.dissc_type}/"
    c["out_path"] = f"results/{args.data}/sv/{args.dissc_type}/"
    return c


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="vctk", help="[vctk, esd]")
    parser.add_argument("--dissc_type", default="dissc_b",
                        help="[dissc_p, dissc_l, dissc_b]")
    parser.add_argument("--embedder", default=None,
                        help="converted ECAPA checkpoint pickle for EER scoring")
    parser.add_argument("--speechbrain_ckpt", default=None,
                        help="raw speechbrain embedding_model.ckpt for EER scoring")
    args = parser.parse_args(argv)
    c = _init_params(args)

    import pandas as pd

    from dissc_tpu.cli.infer import main as infer_main
    from dissc_tpu.cli.sr_inference import main as sr_inference_main

    df = pd.read_csv(c["data_path"] + "speaker_verification.csv")
    with open(c["data_path"] + "/hubert100/id_to_spkr.pkl", "rb") as f:
        id2spkr = pickle.load(f)
    spkr2id = {n: i for i, n in enumerate(id2spkr)}

    infer_args = [
        "--input_path", f"{c['data_path']}/hubert100/{c['tf_name']}.txt",
        "--out_path", f"{c['data_path']}/pred_hubert_sv_{args.dissc_type}/",
        "--len_model", f"checkpoints/{args.data}/len/",
        "--f0_model", f"checkpoints/{args.data}/pitch/",
        "--f0_path", f"{c['data_path']}/hubert100/f0_stats.pkl",
        "--vc", "--sample_df", f"{c['data_path']}/speaker_verification.csv",
        "-n", "100000",
        "--f0_model_type", "base" if args.data in ("vctk", "esd") else "new",
    ]
    if args.dissc_type in ("dissc_l", "dissc_b"):
        infer_args.append("--pred_len")
    if args.dissc_type in ("dissc_p", "dissc_b"):
        infer_args.append("--pred_pitch")
    infer_main(infer_args)

    os.makedirs(c["gen_path"], exist_ok=True)
    for t_spk in c["spk"]:
        code_file = (f"{c['data_path']}/pred_hubert_sv_{args.dissc_type}/"
                     f"{t_spk}_{c['tf_name']}.txt")
        if not os.path.exists(code_file):
            continue
        sr_inference_main([
            "--input_code_file", code_file,
            "--data_path", f"{c['data_path']}/wav/{c['gt_pre']}",
            "--output_dir", f"{c['gen_path']}/{t_spk}",
            "--checkpoint_file", f"checkpoints/{args.data.split('_')[-1]}_vocoder",
            "--vc", "--target-speakers", t_spk,
            # synthesize only the CSV's (sample, target) pairs, not the
            # full split per speaker (reference scripts/convert_eval_sv.py:78)
            "--sample_df", f"{c['data_path']}/speaker_verification.csv",
            "-n", "1000",
        ])

    os.makedirs(c["out_path"], exist_ok=True)
    shutil.copy(f"{c['data_path']}/speaker_verification.csv",
                f"{Path(c['out_path']).parent.parent}")
    for _, row in df.iterrows():
        os.makedirs(c["out_path"] + row.syn_trgt, exist_ok=True)
        try:
            shutil.copy(
                f"{c['gen_path']}/{row.syn_trgt}/{row.syn_sample}{c['pred_suf']}_"
                f"{spkr2id[row.syn_trgt]}_gen.wav",
                f"{c['out_path']}/{row.syn_trgt}/{row.syn_sample}.wav",
            )
        except FileNotFoundError:
            print(row.syn_sample)

    # final scoring step (reference scripts/convert_eval_sv.py:95-96 runs
    # eval_sv.py); skips with a message when no embedder weights are given
    if args.embedder or args.speechbrain_ckpt:
        from dissc_tpu.cli.eval_sv import main as eval_sv_main

        sv_args = [
            "--base_path", f"results/{args.data}",
            "--method", args.dissc_type,
            "--gt_path", f"{c['data_path']}/wav/{c['gt_pre']}",
            "--file_suffix", c["gt_suf"],
        ]
        if args.embedder:
            sv_args += ["--embedder", args.embedder]
        if args.speechbrain_ckpt:
            sv_args += ["--speechbrain_ckpt", args.speechbrain_ckpt]
        eval_sv_main(sv_args)
    else:
        print("Conversions done. Pass --embedder/--speechbrain_ckpt to score "
              "EER (speechbrain ECAPA weights are not bundled in this "
              "zero-egress image), or call dissc_tpu.eval.sv.run_sv_eval with "
              "any injected score_fn.")


if __name__ == "__main__":
    main()
