"""Run the REFERENCE sr/inference.py unmodified on a CPU-only image.

The upstream script pins workers to CUDA device indices
(``sr/inference.py:103,114`` — ``generator.to(idx)``); on this image
torch has no CUDA, so ``Module.to``/``Tensor.to`` are patched to map
integer / 'cuda' devices onto the CPU before handing control to the
unmodified source via runpy.  Everything else (CodeDataset mel + YAAPT
f0 pipeline, checkpoint loading, waveform writes) is the reference's own
code, with its gated deps provided by dissc_tpu.compat.refstubs.

Usage: python run_ref_sr_inference.py <reference_sr_dir> [sr/inference args...]
"""
import os
import runpy
import sys

import torch


def _patch_to_cpu():
    def _map(d):
        # NB bool is an int subclass: non_blocking=False must pass through
        if (isinstance(d, int) and not isinstance(d, bool)) or (
                isinstance(d, str) and d.startswith("cuda")):
            return "cpu"
        if isinstance(d, torch.device) and d.type == "cuda":
            return torch.device("cpu")
        return d

    mod_to = torch.nn.Module.to

    def module_to(self, *args, **kwargs):
        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return mod_to(self, *args, **kwargs)

    ten_to = torch.Tensor.to

    def tensor_to(self, *args, **kwargs):
        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return ten_to(self, *args, **kwargs)

    torch.nn.Module.to = module_to
    torch.Tensor.to = tensor_to


def main():
    sr_dir = sys.argv[1]
    script = os.path.join(sr_dir, "inference.py")
    sys.argv = [script] + sys.argv[2:]
    sys.path.insert(0, sr_dir)  # reference-internal `from dataset import ...`
    os.chdir(sr_dir)
    _patch_to_cpu()
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
