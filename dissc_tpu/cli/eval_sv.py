"""Speaker-verification EER CLI (reference ``eval_sv.py:28-58`` surface)."""
import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="../results/vctk/")
    parser.add_argument("--gt_path", default="data/vctk/wav16_trimmed_padded/")
    parser.add_argument("--file_suffix", default="_mic2.flac")
    parser.add_argument("--method", default="sr")
    parser.add_argument("--device", default="cpu")
    parser.add_argument("--embedder", default=None,
                        help="Local ECAPA/speaker-embedding checkpoint; required "
                             "for scoring (speechbrain weights are not bundled)")
    args = parser.parse_args(argv)

    from dissc_tpu.eval.sv import cosine_scorer, run_sv_eval

    if args.embedder is None:
        raise SystemExit(
            "No speaker embedder available offline. Pass --embedder with a local "
            "checkpoint, or use dissc_tpu.eval.sv.run_sv_eval with an injected "
            "score_fn."
        )
    raise SystemExit("Custom embedder loading lands with the ECAPA port (see ROADMAP).")


if __name__ == "__main__":
    main()
