"""Fused MSD G-step: one custom_vjp around the whole multi-scale stack.

The round-3 roofline (``scripts/profile_msd_roofline.py``) measured the
MSD G-step HBM-bandwidth bound — 28.1 GB accessed vs a ~10 GB
store-once/read-once floor — with the excess coming from the
``lhs_dilation`` transposed convs jax's AD emits for the strided
grouped-conv input gradients (reference discriminator
``sr/models.py:285-333``).  Two earlier byte-reduction attempts failed
*composed*: a per-conv ``custom_vjp`` (``layers._strided_conv_fast``)
wins per conv but its 7x3 fusion barriers cost more than they save, and
the s2d lowering's reshapes defeat XLA's fusion around the convs.

This module takes the third geometry: ONE ``custom_vjp`` around the
entire MSD application for the G step only, with a hand-written
backward chain that

  * routes every strided input-gradient through the polyphase
    decomposition (``layers._polyphase_convt`` — no dilation zeros,
    ~stride x fewer FLOPs and bytes than AD's dilated form),
  * saves NO extra residuals: the leaky-relu masks are recovered from
    the post-activation feature maps the forward must return anyway
    (for the feature-match loss), and the conv input-gradients need
    only the folded weights,
  * skips weight/bias gradients entirely (the G step differentiates
    only w.r.t. the generator waveform; the D step keeps the standard
    flax apply).

Weight folding (weight-norm / spectral-norm -> effective conv kernels,
including the train-mode power-iteration update) happens OUTSIDE the
custom_vjp in :func:`fold_msd_weights`, so the fused region is a pure
conv stack.  Forward numerics are bit-identical to
``MultiScaleDiscriminator.apply`` (same op sequence); the backward is
AD-equivalent (equivalence-tested in ``tests/test_msd_fused.py``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dissc_tpu.models.layers import (LRELU_SLOPE, _conv_plain,
                                     _polyphase_convt, _wn_kernel,
                                     leaky_relu)

# (features, kernel, stride, groups, padding) — reference sr/models.py:287-300
MSD_SPECS = (
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)
POST_SPEC = (1, 3, 1, 1, 1)
_LAYERS = tuple(f"convs_{i}" for i in range(len(MSD_SPECS))) + ("conv_post",)


def _spectral_fold(kernel: jnp.ndarray, u: jnp.ndarray, train: bool):
    """Mirror of ``Conv1d._spectral_normalize`` on a raw kernel."""
    out = kernel.shape[-1]
    w = kernel.reshape(-1, out).T  # [out, k*in]
    if train:
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    else:
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
    sigma = u @ (w @ v)
    return kernel / sigma, u


def fold_msd_weights(params, spectral, train: bool = True,
                     dtype: Optional[jnp.dtype] = None):
    """MSD param/spectral trees -> per-scale folded (W_r, W_g, b) tuples.

    One mutable ``msd.apply(y, y_hat, train=True)`` runs the spectral
    power iteration TWICE per scale-0 conv — once inside the real-side
    pass and again inside the generated-side pass, which therefore sees
    a different sigma.  The fold replicates that exactly: ``W_r`` is the
    kernel after the first iteration, ``W_g`` after the second, and
    ``new_spectral`` carries the doubly-advanced state, bit-matching the
    module.  Weight-norm layers share one kernel for both sides.
    """
    scales = sorted(params.keys(), key=lambda s: int(s.split("_")[1]))
    weights = []
    new_spectral = {}
    for sname in scales:
        ws = []
        for lname in _LAYERS:
            p = params[sname][lname]
            if "v" in p:
                W_r = W_g = _wn_kernel(p["v"], p["g"], axes=(0, 1))
            else:
                u = spectral[sname][lname]["u"]
                W_r, u = _spectral_fold(p["kernel"], u, train)
                W_g, u = _spectral_fold(p["kernel"], u, train)
                new_spectral.setdefault(sname, {})[lname] = {"u": u}
            b = p["bias"]
            if dtype is not None:
                W_r, W_g, b = (W_r.astype(dtype), W_g.astype(dtype),
                               b.astype(dtype))
            ws.append((W_r, W_g, b))
        weights.append(tuple(ws))
    return tuple(weights), new_spectral


def _avg_pool(x):
    """torch AvgPool1d(4, 2, padding=2) on [B, T] (discriminators._avg_pool1d)."""
    y = jnp.pad(x, ((0, 0), (2, 2)))
    y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 4), (1, 2), "VALID")
    return y / 4


def _scale_forward(ws, x, side, dtype):
    """One DiscriminatorS forward from folded weights; bit-matches the
    module's op sequence (conv + bias, leaky_relu, fmap append).
    ``side`` selects the real (0) or generated (1) spectral fold."""
    h = x[..., None]
    if dtype is not None:
        h = h.astype(dtype)
    fmap = []
    for lw, (ch, k, s, g, p) in zip(ws[:-1], MSD_SPECS):
        W, b = lw[side], lw[2]
        if dtype is not None:
            h = h.astype(dtype)
        h = _conv_plain(h, W, s, p, g) + b
        h = leaky_relu(h)
        fmap.append(h)
    W, b = ws[-1][side], ws[-1][2]
    _, k, s, g, p = POST_SPEC
    if dtype is not None:
        h = h.astype(dtype)
    h = _conv_plain(h, W, s, p, g) + b
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


def _dconv_input(dy, W, stride, pad, groups, in_len):
    """Cotangent of ``_conv_plain(x, W, stride, pad, groups)`` w.r.t. x.

    Stride 1 lowers to a plain stride-1 conv of the flipped,
    in/out-swapped kernel (XLA fuses it like any conv); stride > 1 goes
    through the polyphase decomposition — no ``lhs_dilation`` buffers.
    """
    k, in_g, out = W.shape
    out_g = out // groups
    rhs2 = (jnp.flip(W, 0)
            .reshape(k, in_g, groups, out_g)
            .transpose(0, 3, 2, 1)           # (k, out_g, groups, in_g)
            .reshape(k, out_g, groups * in_g))
    if stride == 1:
        # same-pad odd kernels everywhere in the MSD: k - 1 - pad == pad
        return jax.lax.conv_general_dilated(
            dy, rhs2, window_strides=(1,), padding=[(k - 1 - pad,) * 2],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups)
    return _polyphase_convt(dy, rhs2, stride, k - 1 - pad, None,
                            out_len=in_len, groups=groups)


def _lrelu_mask(a):
    """d leaky_relu / dx from the POST-activation (sign-preserving map)."""
    return jnp.where(a >= 0, jnp.asarray(1.0, a.dtype),
                     jnp.asarray(LRELU_SLOPE, a.dtype))


def _scale_backward(ws, fmap_g, d_score, d_fmap, in_len):
    """Hand-written VJP of ``_scale_forward`` w.r.t. its input x [B, T]."""
    d = d_fmap[-1] + d_score.reshape(fmap_g[-1].shape)
    _, k, s, g, p = POST_SPEC
    d = _dconv_input(d, ws[-1][1], s, p, g, fmap_g[-2].shape[1])
    for i in range(len(MSD_SPECS) - 1, -1, -1):
        d = d + d_fmap[i]
        d = d * _lrelu_mask(fmap_g[i])
        ch, k, s, g, p = MSD_SPECS[i]
        prev_len = fmap_g[i - 1].shape[1] if i > 0 else in_len
        d = _dconv_input(d, ws[i][1], s, p, g, prev_len)
    return d[..., 0]  # [B, T]


def _dpool(dy, in_len):
    """Cotangent of :func:`_avg_pool` — a tiny polyphase transposed conv
    of the 0.25-box kernel, then the zero-pad crop."""
    w = jnp.full((4, 1, 1), 0.25, dy.dtype)
    dx = _polyphase_convt(dy[..., None], w, 2, 4 - 1 - 2, None,
                          out_len=in_len)
    return dx[..., 0]


@jax.custom_vjp
def msd_g_apply(weights, y, y_hat):
    """``MultiScaleDiscriminator`` forward from folded weights.

    Same output structure as the flax module's ``__call__`` —
    ``(y_d_rs, y_d_gs, fmap_rs, fmap_gs)`` — so the GAN loss code is
    unchanged.  Differentiable w.r.t. ``y_hat`` only (weights and the
    real waveform receive zero cotangents): exactly the G-step contract.
    """
    out, _ = _msd_fwd(weights, y, y_hat)
    return out


def _forward(weights, y, y_hat):
    dtype = weights[0][0][0].dtype
    dtype = None if dtype == jnp.float32 else dtype
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, ws in enumerate(weights):
        if i != 0:
            y = _avg_pool(y)
            y_hat = _avg_pool(y_hat)
        s_r, f_r = _scale_forward(ws, y, 0, dtype)
        s_g, f_g = _scale_forward(ws, y_hat, 1, dtype)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def _msd_fwd(weights, y, y_hat):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = _forward(weights, y, y_hat)
    out = (tuple(y_d_rs), tuple(y_d_gs),
           tuple(tuple(f) for f in fmap_rs), tuple(tuple(f) for f in fmap_gs))
    # residuals: folded weights + the generated-side post-activations
    # (aliased with the outputs — no extra HBM) + the inputs for the
    # zero cotangents' shapes
    return out, (weights, out[3], y, y_hat)


def _msd_bwd(res, cts):
    weights, fmap_gs, y, y_hat = res
    _, d_y_d_gs, _, d_fmap_gs = cts
    pooled_lens = [y_hat.shape[1]]
    for _ in range(len(weights) - 1):
        pooled_lens.append((pooled_lens[-1] + 2 * 2 - 4) // 2 + 1)
    # per-scale input gradients, then chain back up through the pools:
    # d y_hat = g_0 + poolT(g_1 + poolT(g_2))
    d = None
    for i in range(len(weights) - 1, -1, -1):
        g_i = _scale_backward(weights[i], fmap_gs[i], d_y_d_gs[i],
                              d_fmap_gs[i], pooled_lens[i])
        d = g_i if d is None else g_i + _dpool(d, pooled_lens[i])
    d_weights = jax.tree.map(jnp.zeros_like, weights)
    return d_weights, jnp.zeros_like(y), d.astype(y_hat.dtype)


msd_g_apply.defvjp(_msd_fwd, _msd_bwd)
