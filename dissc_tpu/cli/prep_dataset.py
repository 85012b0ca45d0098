"""Dataset split + f0-stats CLI (reference ``data/prep_dataset.py``)."""
import argparse

from dissc_tpu.core.seed import seed_everything
from dissc_tpu.data.stats import calculate_pitch_stats, data_split


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoded_path", default="ESD/hubert100/train.txt")
    parser.add_argument("--stats_path", default="ESD/hubert100/f0_stats.pkl")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--split_method", default=None,
                        help="random | paired_val | None (no split)")
    args = parser.parse_args(argv)

    if args.seed is not None:
        seed_everything(args.seed)
    if args.split_method:
        train_path, _ = data_split(args.encoded_path, split_method=args.split_method)
    else:
        train_path = args.encoded_path
    calculate_pitch_stats(str(train_path), args.stats_path)


if __name__ == "__main__":
    main()
