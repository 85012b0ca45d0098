"""Conversion-metrics CLI (reference ``eval.py:148-161`` surface)."""
import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="../results/vctk/")
    parser.add_argument("--method", default="sr")
    parser.add_argument("--device", default="cpu")
    parser.add_argument("--target_speakers", nargs="+",
                        default=["p231", "p239", "p245", "p270"])
    parser.add_argument("--whisper_model", default=None,
                        help="Local Whisper checkpoint dir; omit to skip WER/CER")
    parser.add_argument("--dtw_align", action="store_true",
                        help="Synthesize TextGrids by DTW boundary transfer "
                             "from the reference recordings (native fallback "
                             "when mfa is absent; default keeps the "
                             "reference's uniform-grid behaviour)")
    args = parser.parse_args(argv)

    if args.device == "cpu":
        # The metric suite must be CPU-deterministic: YAAPT's NCCF runs
        # through jax matmuls, and on TPU the default (bf16) precision
        # shifts f0 contours enough to move EMD/FFE by 30%+.  The env
        # var alone is not honoured when a sitecustomize pre-registers
        # an accelerator backend — force the config too.
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dissc_tpu.eval.metrics import calc_errors, log_results

    transcribe = None
    if args.whisper_model:
        from dissc_tpu.eval.asr import load_whisper

        transcribe = load_whisper(args.whisper_model, args.device)

    if args.dtw_align:
        from dissc_tpu.eval.align import write_dtw_textgrids

        n = write_dtw_textgrids(args.base_path, args.method, args.target_speakers)
        print(f"dtw_align: wrote {n} synthetic TextGrids")

    errs = calc_errors(args.base_path, args.method, args.target_speakers, transcribe)
    log_results(errs, args.base_path, args.method)


if __name__ == "__main__":
    main()
