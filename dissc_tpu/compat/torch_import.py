"""Import reference (PyTorch) checkpoints into the TPU param trees.

The reference ships/produces torch ``state_dict`` checkpoints:
  * vocoder ``g_<step>`` = ``{'generator': CodeGenerator.state_dict()}``
    (``sr/train.py:206-208``),
  * ``do_<step>`` = discriminators + optimizers (``:209-214``),
  * prosody ``best_model.pth`` = Len/PitchPredictor state_dicts.

These functions remap them (layout transposes + weight-norm (g, v)
pairs) onto our Flax trees, so a user migrating from the reference can
load their trained models without retraining.  Layout rules (validated
numerically in tests/test_layers_torch_parity.py):

  torch Conv1d weight [out, in, k]          -> ours (k, in, out)
  torch ConvTranspose1d weight [in, out, k] -> ours (k, out, in)
  torch Conv2d weight [out, in, kh, kw]     -> ours (kh, kw, in, out)
  weight_norm dim=0: g per torch-dim-0 channel -> broadcast over our axes
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    # copy, not view: torch .numpy() aliases the tensor's memory, so an
    # in-place torch update (optimizer step, power iteration) would
    # silently mutate the imported tree
    return (x.detach().cpu().numpy().copy() if hasattr(x, "detach")
            else np.asarray(x))


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return obj


def _wn_conv1d(sd, prefix):
    """torch weight-norm Conv1d -> {v, g, bias} in our layout."""
    v = _np(sd[f"{prefix}.weight_v"])  # [out, in, k]
    g = _np(sd[f"{prefix}.weight_g"])  # [out, 1, 1]
    out = {"v": v.transpose(2, 1, 0), "g": g.reshape(1, 1, -1)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _wn_convtranspose1d(sd, prefix):
    v = _np(sd[f"{prefix}.weight_v"])  # [in, out, k]
    g = _np(sd[f"{prefix}.weight_g"])  # [in, 1, 1]
    out = {"v": v.transpose(2, 1, 0), "g": g.reshape(1, 1, -1)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _wn_conv2d(sd, prefix):
    v = _np(sd[f"{prefix}.weight_v"])  # [out, in, kh, kw]
    g = _np(sd[f"{prefix}.weight_g"])  # [out, 1, 1, 1]
    out = {"v": v.transpose(2, 3, 1, 0), "g": g.reshape(1, 1, 1, -1)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _plain_conv1d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def import_code_generator(sd: Dict[str, Any], h) -> Dict[str, Any]:
    """Reference ``CodeGenerator.state_dict()`` -> our CodeGenerator params.

    ``h`` is the matching VocoderConfig (resblock counts/kernels drive
    the module naming).
    """
    num_kernels = len(h.resblock_kernel_sizes)
    gen: Dict[str, Any] = {"conv_pre": _wn_conv1d(sd, "conv_pre"),
                           "conv_post": _wn_conv1d(sd, "conv_post")}
    for i in range(len(h.upsample_rates)):
        gen[f"ups_{i}"] = _wn_convtranspose1d(sd, f"ups.{i}")
    n_res = len(h.upsample_rates) * num_kernels
    for n in range(n_res):
        block: Dict[str, Any] = {}
        if h.resblock == "1":
            for j in range(3):
                block[f"convs1_{j}"] = _wn_conv1d(sd, f"resblocks.{n}.convs1.{j}")
                block[f"convs2_{j}"] = _wn_conv1d(sd, f"resblocks.{n}.convs2.{j}")
        else:
            for j in range(2):
                block[f"convs_{j}"] = _wn_conv1d(sd, f"resblocks.{n}.convs.{j}")
        gen[f"resblocks_{n}"] = block

    params: Dict[str, Any] = {"generator": gen}
    if "dict.weight" in sd:
        params["dict"] = {"embedding": _np(sd["dict.weight"])}
    if "spkr.weight" in sd:
        params["spkr"] = {"embedding": _np(sd["spkr.weight"])}
    return params


def import_vocoder_checkpoint(path: str, h) -> Dict[str, Any]:
    """Load a reference ``g_<step>`` file -> ``{'generator': params}``
    matching our checkpoint schema."""
    obj = load_torch_state_dict(path)
    sd = obj["generator"] if "generator" in obj else obj
    return {"generator": import_code_generator(sd, h)}


def _sn_conv1d(sd, prefix):
    """torch spectral-norm Conv1d -> {kernel, bias} params + u state.

    torch stores ``weight_orig`` [out, in, k] plus power-iteration
    buffers ``weight_u`` [out] / ``weight_v`` [in*k].  Our layout keeps
    the raw kernel (k, in, out) and re-derives v from u each forward, so
    only u needs importing (sigma is invariant to the (in,k) column
    permutation between the two flattenings).
    """
    w = _np(sd[f"{prefix}.weight_orig"])
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out, {"u": _np(sd[f"{prefix}.weight_u"])}


def import_mpd(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``MultiPeriodDiscriminator.state_dict()`` -> our params.

    Reference module layout: ``discriminators.{i}.convs.{j}`` (5 weight-
    norm Conv2d) + ``conv_post`` (``sr/models.py:228-282``).
    """
    params: Dict[str, Any] = {}
    for i in range(5):
        d: Dict[str, Any] = {}
        for j in range(5):
            d[f"convs_{j}"] = _wn_conv2d(sd, f"discriminators.{i}.convs.{j}")
        d["conv_post"] = _wn_conv2d(sd, f"discriminators.{i}.conv_post")
        params[f"disc_{i}"] = d
    return params


def import_msd(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``MultiScaleDiscriminator.state_dict()`` -> our
    {'params', 'spectral'} trees (``sr/models.py:285-333``: scale 0 is
    spectral-normed, scales 1-2 weight-normed)."""
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    for i in range(3):
        d: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for name, prefix in ([(f"convs_{j}", f"discriminators.{i}.convs.{j}")
                              for j in range(7)]
                             + [("conv_post", f"discriminators.{i}.conv_post")]):
            if f"{prefix}.weight_orig" in sd:
                d[name], s[name] = _sn_conv1d(sd, prefix)
            else:
                d[name] = _wn_conv1d(sd, prefix)
        params[f"disc_{i}"] = d
        if s:
            spectral[f"disc_{i}"] = s
    return {"params": params, "spectral": spectral}


def import_len_predictor(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``LenPredictor.state_dict()`` -> our params/batch_stats."""
    params: Dict[str, Any] = {
        "token_emb": {"embedding": _np(sd["token_emb.weight"])},
        "spk_emb": {"embedding": _np(sd["spk_emb.weight"])},
        "cnn2": _plain_conv1d(sd, "cnn2"),
    }
    batch_stats: Dict[str, Any] = {}
    names = ["cnn1"] + [f"cnn1{i}" for i in range(1, 7)]
    bns = ["bn1"] + [f"bn1{i}" for i in range(1, 7)]
    for conv, bn in zip(names, bns):
        params[conv] = _plain_conv1d(sd, conv)
        params[bn] = {"BatchNorm_0": {"scale": _np(sd[f"{bn}.weight"]),
                                      "bias": _np(sd[f"{bn}.bias"])}}
        batch_stats[bn] = {"BatchNorm_0": {"mean": _np(sd[f"{bn}.running_mean"]),
                                           "var": _np(sd[f"{bn}.running_var"])}}
    return {"params": params, "batch_stats": batch_stats}


def import_pitch_predictor(sd: Dict[str, Any], model_type: str = "new") -> Dict[str, Any]:
    """Reference Pitch{Predictor,PredictorBase}.state_dict() -> our tree."""
    params: Dict[str, Any] = {
        "token_emb": {"embedding": _np(sd["token_emb.weight"])},
        "spk_emb": {"embedding": _np(sd["spk_emb.weight"])},
    }
    batch_stats: Dict[str, Any] = {}
    convs = (["cnn1"] + [f"cnn1{i}" for i in range(1, 8)]
             + ["cnn2", "cnn_class1", "cnn_class2", "cnn_reg1", "cnn_reg2"])
    for conv in convs:
        params[conv] = _plain_conv1d(sd, conv)
    bns = ([f"bn1{i}" for i in range(1, 8)] + ["bn1", "bn_c1", "bn_r1"]
           if model_type == "base" else ["bn2"])
    for bn in bns:
        if f"{bn}.weight" not in sd:
            continue
        params[bn] = {"BatchNorm_0": {"scale": _np(sd[f"{bn}.weight"]),
                                      "bias": _np(sd[f"{bn}.bias"])}}
        batch_stats[bn] = {"BatchNorm_0": {"mean": _np(sd[f"{bn}.running_mean"]),
                                           "var": _np(sd[f"{bn}.running_var"])}}
    return {"params": {"core": params}, "batch_stats": {"core": batch_stats}}
