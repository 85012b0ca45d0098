"""Export our Flax checkpoints back to reference-compatible torch layouts.

The inverse of ``compat.torch_import``: produces state dicts keyed and
shaped exactly like the reference models' ``state_dict()`` so trained
TPU checkpoints can be loaded by the original PyTorch code (migration in
both directions).  Saved with ``torch.save`` when torch is available,
else as a plain pickle of numpy arrays (torch can read neither — use a
machine with torch for the final write in that case).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _wn_conv1d_out(tree) -> Dict[str, np.ndarray]:
    out = {
        "weight_v": _np(tree["v"]).transpose(2, 1, 0),  # (k,in,out)->(out,in,k)
        "weight_g": _np(tree["g"]).reshape(-1, 1, 1),
    }
    if "bias" in tree:
        out["bias"] = _np(tree["bias"])
    return out


def _wn_convtranspose1d_out(tree) -> Dict[str, np.ndarray]:
    out = {
        "weight_v": _np(tree["v"]).transpose(2, 1, 0),  # (k,out,in)->(in,out,k)
        "weight_g": _np(tree["g"]).reshape(-1, 1, 1),
    }
    if "bias" in tree:
        out["bias"] = _np(tree["bias"])
    return out


def export_code_generator(params: Dict[str, Any], h) -> Dict[str, np.ndarray]:
    """Our CodeGenerator params -> reference ``CodeGenerator.state_dict()``
    key/shape layout (``sr/models.py`` naming)."""
    sd: Dict[str, np.ndarray] = {}
    gen = params["generator"]

    def put(prefix: str, tensors: Dict[str, np.ndarray]):
        for k, v in tensors.items():
            sd[f"{prefix}.{k}"] = v

    put("conv_pre", _wn_conv1d_out(gen["conv_pre"]))
    put("conv_post", _wn_conv1d_out(gen["conv_post"]))
    for i in range(len(h.upsample_rates)):
        put(f"ups.{i}", _wn_convtranspose1d_out(gen[f"ups_{i}"]))
    num_kernels = len(h.resblock_kernel_sizes)
    for n in range(len(h.upsample_rates) * num_kernels):
        block = gen[f"resblocks_{n}"]
        if h.resblock == "1":
            for j in range(3):
                put(f"resblocks.{n}.convs1.{j}", _wn_conv1d_out(block[f"convs1_{j}"]))
                put(f"resblocks.{n}.convs2.{j}", _wn_conv1d_out(block[f"convs2_{j}"]))
        else:
            for j in range(2):
                put(f"resblocks.{n}.convs.{j}", _wn_conv1d_out(block[f"convs_{j}"]))
    if "dict" in params:
        sd["dict.weight"] = _np(params["dict"]["embedding"])
    if "spkr" in params:
        sd["spkr.weight"] = _np(params["spkr"]["embedding"])
    return sd


def save_torch_checkpoint(path: str, obj: Dict[str, Any]) -> None:
    try:
        import torch

        torch.save(
            {k: ({kk: torch.from_numpy(np.ascontiguousarray(vv)) for kk, vv in v.items()}
                 if isinstance(v, dict) else v)
             for k, v in obj.items()},
            path,
        )
    except ImportError:  # pragma: no cover
        import pickle

        with open(path, "wb") as f:
            pickle.dump(obj, f)
