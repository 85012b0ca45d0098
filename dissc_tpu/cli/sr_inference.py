"""Vocoder inference CLI (reference ``sr/inference.py:263-281`` flag surface).

The reference's 8-process GPU pool is replaced by on-chip batching
(``infer.vocoder.VocoderEngine``).
"""
import argparse
from pathlib import Path

from dissc_tpu.core.seed import seed_everything
from dissc_tpu.infer.vocoder import run_inference


def main(argv=None):
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--code_file", default=None)
    parser.add_argument("--input_code_file", default="data/wild/pred_hubert/p239_encoded.txt")
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--output_dir", default="debug")
    parser.add_argument("--checkpoint_file", default="checkpoints/vctk_hubert/")
    parser.add_argument("--f0-stats", dest="f0_stats", type=Path, default=None)
    parser.add_argument("--vc", action="store_true")
    parser.add_argument("--target-speakers", dest="target_speakers", default=None, nargs="+")
    parser.add_argument("--pad", default=None, type=int)
    parser.add_argument("--debug", action="store_true", help="kept for CLI compat")
    parser.add_argument("--eval_mode", action="store_false")
    parser.add_argument("--parts", action="store_true")
    parser.add_argument("--unseen-f0", dest="unseen_f0", type=Path, default=None)
    parser.add_argument("--unseen_speaker", action="store_true")
    parser.add_argument("--id_to_spkr", default=None, type=Path)
    parser.add_argument("--sample_df", default=None, type=Path)
    parser.add_argument("-n", type=int, default=-1)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument(
        "--data_devices", type=int, default=0,
        help="shard synthesis batches over this many chips (a data-axis "
        "mesh; 0 = single device — the multi-chip replacement for the "
        "reference's per-GPU process pool)")
    args = parser.parse_args(argv)

    seed_everything(52)
    mesh = None
    if args.data_devices:
        import jax

        from dissc_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(n_data=args.data_devices, n_model=1,
                           devices=jax.devices()[: args.data_devices])
    rtf = run_inference(
        checkpoint_file=args.checkpoint_file,
        input_code_file=args.input_code_file,
        output_dir=args.output_dir,
        data_path=args.data_path,
        vc=args.vc,
        target_speakers=args.target_speakers,
        f0_stats_path=str(args.f0_stats) if args.f0_stats else None,
        unseen_speaker=args.unseen_speaker,
        id_to_spkr_path=str(args.id_to_spkr) if args.id_to_spkr else None,
        pad=args.pad,
        n=args.n,
        batch_size=args.batch_size,
        code_file=args.code_file,
        unseen_f0_path=str(args.unseen_f0) if args.unseen_f0 else None,
        sample_df_path=str(args.sample_df) if args.sample_df else None,
        parts=args.parts,
        mesh=mesh,
    )
    print(f"\nmean RTF: {rtf:.4f}")


if __name__ == "__main__":
    main()
