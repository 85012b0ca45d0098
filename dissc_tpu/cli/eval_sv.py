"""Speaker-verification EER CLI (reference ``eval_sv.py:28-58`` surface).

Scores (gt, converted) pairs from ``speaker_verification.csv`` with an
ECAPA-TDNN cosine scorer and computes EER.  The embedder loads either a
converted speechbrain checkpoint (``--embedder``, a pickle of
``(params, batch_stats)`` from
``dissc_tpu.models.ecapa.convert_speechbrain_state_dict``) or a raw
speechbrain ``embedding_model.ckpt`` (``--speechbrain_ckpt``, converted
on the fly with torch).
"""
import argparse


def _load_embedder(args):
    from dissc_tpu.models.ecapa import EcapaEmbedder, convert_speechbrain_state_dict
    from dissc_tpu.train.checkpoints import load_checkpoint

    if args.embedder:
        params, batch_stats = load_checkpoint(args.embedder)
        return EcapaEmbedder(params, batch_stats)
    if args.speechbrain_ckpt:
        import torch

        sd = torch.load(args.speechbrain_ckpt, map_location="cpu", weights_only=True)
        params, batch_stats = convert_speechbrain_state_dict(sd)
        return EcapaEmbedder(params, batch_stats)
    raise SystemExit(
        "Provide --embedder (converted pickle) or --speechbrain_ckpt "
        "(embedding_model.ckpt). Pretrained ECAPA weights are not bundled in "
        "this zero-egress image; alternatively call "
        "dissc_tpu.eval.sv.run_sv_eval with any injected score_fn."
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="../results/vctk/")
    parser.add_argument("--gt_path", default="data/vctk/wav16_trimmed_padded/")
    parser.add_argument("--file_suffix", default="_mic2.flac")
    parser.add_argument("--method", default="sr")
    parser.add_argument("--device", default="tpu", help="kept for CLI compat; unused")
    parser.add_argument("--embedder", default=None,
                        help="converted ECAPA checkpoint pickle (params, batch_stats)")
    parser.add_argument("--speechbrain_ckpt", default=None,
                        help="raw speechbrain embedding_model.ckpt to convert on the fly")
    args = parser.parse_args(argv)

    from dissc_tpu.eval.sv import cosine_scorer, run_sv_eval

    embedder = _load_embedder(args)
    run_sv_eval(
        sample_csv=f"{args.base_path}/speaker_verification.csv",
        gt_path=args.gt_path,
        syn_path=f"{args.base_path}/sv/{args.method}/",
        score_fn=cosine_scorer(embedder),
        file_suffix=args.file_suffix,
    )


if __name__ == "__main__":
    main()
