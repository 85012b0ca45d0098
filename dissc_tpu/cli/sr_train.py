"""Vocoder training CLI (reference ``sr/train.py:290-330`` flag surface)."""
import argparse
import os

from dissc_tpu.core.config import VocoderConfig, build_env
from dissc_tpu.core.seed import seed_everything
from dissc_tpu.train.vocoder_trainer import train_vocoder


def main(argv=None):
    from dissc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", default="checkpoints/vctk_vocoder")
    parser.add_argument("--config", default="configs/VCTK/hubert100_lut.json")
    parser.add_argument("--training_epochs", default=2000, type=int)
    parser.add_argument("--training_steps", default=400000, type=int)
    parser.add_argument("--stdout_interval", default=5, type=int)
    parser.add_argument("--checkpoint_interval", default=10000, type=int)
    parser.add_argument("--summary_interval", default=100, type=int)
    parser.add_argument("--validation_interval", default=1000, type=int)
    args = parser.parse_args(argv)

    h = VocoderConfig.from_json(args.config)
    seed_everything(h.seed)
    build_env(args.config, "config.json", args.checkpoint_path)
    train_vocoder(
        h, args.checkpoint_path,
        training_steps=args.training_steps,
        training_epochs=args.training_epochs,
        stdout_interval=args.stdout_interval,
        checkpoint_interval=args.checkpoint_interval,
        summary_interval=args.summary_interval,
        validation_interval=args.validation_interval,
    )


if __name__ == "__main__":
    main()
