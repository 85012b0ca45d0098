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

        def conv(v):
            if isinstance(v, dict):
                return {k: conv(vv) for k, vv in v.items()}
            if isinstance(v, np.ndarray):
                # torch tensors throughout: ``load_state_dict`` rejects
                # ndarray leaves, and torch>=2.6's weights_only loader
                # rejects numpy globals outright
                return torch.from_numpy(np.ascontiguousarray(v))
            return v

        torch.save(conv(obj), path)
    except ImportError:  # pragma: no cover
        import pickle

        with open(path, "wb") as f:
            pickle.dump(obj, f)


def _plain_conv1d_out(tree) -> Dict[str, np.ndarray]:
    out = {"weight": _np(tree["kernel"]).transpose(2, 1, 0)}  # (k,in,out)->(out,in,k)
    if "bias" in tree:
        out["bias"] = _np(tree["bias"])
    return out


def export_len_predictor(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our LenPredictor {params, batch_stats} -> reference state_dict layout."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {
        "token_emb.weight": _np(params["token_emb"]["embedding"]),
        "spk_emb.weight": _np(params["spk_emb"]["embedding"]),
    }
    convs = ["cnn1"] + [f"cnn1{i}" for i in range(1, 7)] + ["cnn2"]
    for c in convs:
        for k, v in _plain_conv1d_out(params[c]).items():
            sd[f"{c}.{k}"] = v
    for bn in ["bn1"] + [f"bn1{i}" for i in range(1, 7)]:
        sd[f"{bn}.weight"] = _np(params[bn]["BatchNorm_0"]["scale"])
        sd[f"{bn}.bias"] = _np(params[bn]["BatchNorm_0"]["bias"])
        sd[f"{bn}.running_mean"] = _np(stats[bn]["BatchNorm_0"]["mean"])
        sd[f"{bn}.running_var"] = _np(stats[bn]["BatchNorm_0"]["var"])
    return sd


def export_pitch_predictor(variables: Dict[str, Any],
                           model_type: str = "new") -> Dict[str, np.ndarray]:
    """Our Pitch{Predictor,PredictorBase} tree -> reference state_dict layout."""
    params = variables["params"]["core"]
    stats = variables["batch_stats"]["core"]
    sd: Dict[str, np.ndarray] = {
        "token_emb.weight": _np(params["token_emb"]["embedding"]),
        "spk_emb.weight": _np(params["spk_emb"]["embedding"]),
    }
    convs = (["cnn1"] + [f"cnn1{i}" for i in range(1, 8)]
             + ["cnn2", "cnn_class1", "cnn_class2", "cnn_reg1", "cnn_reg2"])
    for c in convs:
        for k, v in _plain_conv1d_out(params[c]).items():
            sd[f"{c}.{k}"] = v
    bns = ([f"bn1{i}" for i in range(1, 8)] + ["bn1", "bn_c1", "bn_r1"]
           if model_type == "base" else ["bn2"])
    for bn in bns:
        if bn not in params:
            continue
        sd[f"{bn}.weight"] = _np(params[bn]["BatchNorm_0"]["scale"])
        sd[f"{bn}.bias"] = _np(params[bn]["BatchNorm_0"]["bias"])
        sd[f"{bn}.running_mean"] = _np(stats[bn]["BatchNorm_0"]["mean"])
        sd[f"{bn}.running_var"] = _np(stats[bn]["BatchNorm_0"]["var"])
    if model_type == "new":
        # the reference registers the (deterministic) linear-ramp PE as a
        # persistent buffer, so strict load_state_dict demands it
        # (model/pitch_predictor.py:6-17); rebuild it exactly
        d = sd["spk_emb.weight"].shape[1]
        ramp = np.linspace(0.0, 1.0, 850, dtype=np.float32)[:, None]
        sd["pe.pe"] = np.concatenate(
            [np.repeat(ramp, d // 2, 1), np.repeat(ramp[::-1], d // 2, 1)],
            axis=-1)[None]
    return sd
