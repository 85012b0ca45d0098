"""Conv primitives for the TPU build.

All convolutions run in NWC / NHWC layout (channels-last — the TPU
native layout, lanes = channels) via ``lax.conv_general_dilated``, and
carry their normalisation *reparameterisations* as first-class
parameters:

  * **weight norm** (`kernel = g * v / ||v||`) — the reference wraps
    every vocoder conv in ``torch.nn.utils.weight_norm`` (e.g.
    ``sr/models.py:78-94``); at inference the reparameterisation is
    folded (``remove_weight_norm``), which here is a pure function over
    the param tree (:func:`fold_weight_norm`), not a module mutation.
  * **spectral norm** (power iteration kept in a mutable ``spectral``
    collection) — used by the first MSD discriminator
    (``sr/models.py:288``).

Initialisers reproduce the reference's schemes: HiFi-GAN convs are
``normal(0, 0.01)`` (``sr/utils.py:32-35``); the prosody CNNs use the
torch Conv1d default (uniform ±1/sqrt(fan_in)).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1  # vocoder/discriminator slope (sr/models.py:13)


def leaky_relu(x, slope: float = LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


def torch_conv_init(fan_in: int) -> Callable:
    """torch Conv default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def hifigan_init(std: float = 0.01) -> Callable:
    """HiFi-GAN conv init: normal(0, 0.01) (reference sr/utils.py:32-35)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def same_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same' padding for odd kernels (reference sr/utils.py:44-45)."""
    return (kernel_size * dilation - dilation) // 2


def _wn_kernel(v: jax.Array, g: jax.Array, axes: Tuple[int, ...]) -> jax.Array:
    """kernel = g * v / ||v|| with the norm over ``axes`` (f32 accumulation)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=axes, keepdims=True) + 1e-12)
    return (g * (v.astype(jnp.float32) / norm)).astype(v.dtype)


class Conv1d(nn.Module):
    """1D convolution, NWC layout, optional weight norm.

    ``norm='weight'`` stores ``(v, g)`` with the norm taken per *output*
    channel over (k, in) — matching ``torch.nn.utils.weight_norm(Conv1d,
    dim=0)`` on the reference's vocoder convs.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None  # None => 'same' for the (kernel, dilation)
    use_bias: bool = True
    norm: Optional[str] = None  # None | 'weight' | 'spectral'
    kernel_init: Optional[Callable] = None
    precision: Optional[jax.lax.Precision] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    # space-to-depth lowering for strided convs (_strided_conv_s2d):
    # same params/math, stride-1 execution with AD-friendly backward
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_kernel: bool = False):
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = (in_ch // self.groups) * self.kernel_size
        kinit = self.kernel_init or torch_conv_init(fan_in)

        if self.norm == "weight":
            v = self.param("v", kinit, k_shape)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1))
                ).reshape(shape),
                (1, 1, self.features),
            )
            kernel = _wn_kernel(v, g, axes=(0, 1))
        elif self.norm == "spectral":
            kernel = self.param("kernel", kinit, k_shape)
            kernel = self._spectral_normalize(kernel, train)
        else:
            kernel = self.param("kernel", kinit, k_shape)

        if return_kernel:
            # hand the folded weights to a caller that fuses this conv
            # into a merged op (e.g. the block-diagonal MRF); x is used
            # only to fix in_ch so the param tree is identical
            bias = (self.param("bias", torch_conv_init(fan_in), (self.features,))
                    if self.use_bias else None)
            return kernel, bias

        pad = self.padding if self.padding is not None else same_padding(self.kernel_size, self.dilation)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        if self.s2d and self.stride > 1 and self.dilation == 1:
            y = _strided_conv_s2d(x, kernel, self.stride, pad, self.groups,
                                  self.precision)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(self.stride,),
                padding=[(pad, pad)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups,
                precision=self.precision,
            )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y

    def _spectral_normalize(self, kernel: jax.Array, train: bool) -> jax.Array:
        """One power-iteration step on W reshaped to [out, k*in].

        Matches torch ``spectral_norm`` semantics: iterate only in
        training, always divide by the current sigma estimate.
        """
        w = kernel.reshape(-1, self.features).T  # [out, k*in]
        u_var = self.variable(
            "spectral", "u", lambda: jax.random.normal(self.make_rng("params"), (self.features,))
        )
        u = u_var.value
        if train:
            v = w.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            u_var.value = u
        else:
            v = w.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
        sigma = u @ (w @ v)
        return kernel / sigma


def _polyphase_convt(x, rhs, stride, pad, precision, out_len=None, groups=1):
    """Transposed conv as ONE dense stride-1 conv + reshape interleave.

    ``rhs`` is the (k, in, out) flipped kernel of the input-dilated
    formulation.  For output index ``o = q*stride + p`` only taps ``t``
    with ``(o + t - pad) % stride == 0`` touch real (non-dilation-zero)
    input samples, so phase ``p`` is a plain correlation of ``x`` with
    the sub-kernel ``rhs[t0(p)::stride]``.  Packing all ``stride``
    phases into the output-channel axis gives a single dense conv of
    ``ceil(k/stride)+1`` taps producing ``stride*out`` channels, which
    XLA tiles straight onto the MXU — no ``lhs_dilation``, and ~stride×
    fewer FLOPs than the dilated form (which multiplies mostly zeros).

    ``out_len`` defaults to ``T*stride`` (the HiFi-GAN upsampler case,
    ``k - 2*padding == stride``); pass the true transposed-conv output
    length ``(T-1)*stride - 2*p_t + k`` (with ``pad = k-1-p_t``) for the
    general case — extra phase rows are computed and trimmed.  ``rhs``
    may be grouped ([k, in/groups, out] with out group-major); this is
    also the workhorse of the strided-conv input gradient
    (:func:`_strided_conv_fast`), where the dilated form is what jax's
    AD would otherwise emit.
    """
    k, in_g, out = rhs.shape
    B, T = x.shape[0], x.shape[1]
    out_g = out // groups
    if out_len is None:
        out_len = T * stride
    Q = -(-out_len // stride)  # phase rows needed
    phases = []
    for p in range(stride):
        t0 = (pad - p) % stride
        taps = list(range(t0, k, stride))
        shift = (p + t0 - pad) // stride  # x offset of tap j=0 for this phase
        phases.append((taps, shift))
    s_min = min(s for _, s in phases)
    L = max(s - s_min + len(taps) for taps, s in phases)
    # out channels ordered (group, phase, out_g) so feature_group_count
    # sees contiguous per-group blocks
    w = jnp.zeros((L, in_g, groups, stride, out_g), rhs.dtype)
    for p, (taps, shift) in enumerate(phases):
        off = shift - s_min
        for j, t in enumerate(taps):
            w = w.at[off + j, :, :, p, :].set(rhs[t].reshape(in_g, groups, out_g))
    pl = -s_min
    pr = Q - T + L - 1 - pl
    y = jax.lax.conv_general_dilated(
        x,
        w.reshape(L, in_g, groups * stride * out_g),
        window_strides=(1,),
        padding=[(pl, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if groups > 1:
        y = y.reshape(B, Q, groups, stride, out_g).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, Q * stride, out)[:, :out_len]


import functools as _ft


def _strided_conv_s2d(x, kernel, stride, pad, groups=1, precision=None):
    """Strided conv re-expressed as space-to-depth + a stride-1 conv.

    ``y[n] = sum_t W[t] . x[s*n + t - pad]``; substituting ``t = r + s*j``
    gives ``y[n] = sum_j sum_r W[r+s*j] . xp[s*(n+j) + r]`` — a VALID
    stride-1 conv over the s-fold space-to-depth reshape of the padded
    input, with ``L = ceil(k/s)`` taps and ``s x`` the input channels
    (channel order (c, r), so groups stay contiguous for
    ``feature_group_count``).  Identical math (the tap padding only
    multiplies structural zeros; FLOP overhead ``L*s/k`` <= 7% on the
    discriminator shapes), but with two TPU wins over the native strided
    lowering:
      * the MXU sees ``s x`` fuller input lanes (the grouped MSD convs
        run 16-64 channels/group — badly lane-padded at stride 1), and
      * jax's AD emits the input-gradient as ANOTHER stride-1 conv plus
        reshapes — not the ``lhs_dilation`` transposed conv whose TPU
        lowering burns stride x FLOPs on dilation zeros (the dominant
        cost of the GAN G-step backward in the round-2 profile), and
        with no custom_vjp fusion barrier (the round-2 null result).
    """
    B, T, C = x.shape
    k, in_g, F = kernel.shape  # in_g = C // groups
    s = stride
    L = -(-k // s)
    out_len = (T + 2 * pad - k) // s + 1
    I = out_len + L - 1
    total = s * I
    xp = jnp.pad(x, ((0, 0), (pad, max(0, total - T - pad)), (0, 0)))[:, :total]
    xs = xp.reshape(B, I, s, C).transpose(0, 1, 3, 2).reshape(B, I, C * s)
    w = jnp.pad(kernel, ((0, L * s - k), (0, 0), (0, 0)))
    w = w.reshape(L, s, in_g, F).transpose(0, 2, 1, 3).reshape(L, in_g * s, F)
    return jax.lax.conv_general_dilated(
        xs, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups, precision=precision)


def _conv_plain(x, kernel, stride, pad, groups):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)


@_ft.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _strided_conv_fast(x, kernel, stride, pad, groups):
    """Strided conv whose input-gradient avoids ``lhs_dilation``.

    jax's AD differentiates a strided conv into an input-dilated conv
    for dx; this wrapper keeps the forward bit-identical and routes dx
    through the polyphase decomposition instead, with dW delegated to AD
    on a kernel-closure (an ``rhs_dilation`` conv).  Quiet-machine
    verdict on the discriminator shapes: 25-30% faster than AD's dilated
    backward per ISOLATED conv, but 13% SLOWER composed into the full
    MSD backward (54.1 vs 48.0 ms G-step) — the custom_vjp acts as a
    fusion barrier that costs more than the per-conv win.  NOT wired
    into Conv1d/Conv2d; kept (AD-equivalence tested) for programs where
    a single strided conv dominates.
    """
    return _conv_plain(x, kernel, stride, pad, groups)


def _strided_conv_fwd(x, kernel, stride, pad, groups):
    return _conv_plain(x, kernel, stride, pad, groups), (x, kernel)


def _strided_conv_bwd(stride, pad, groups, res, dy):
    x, kernel = res
    _, vjp_w = jax.vjp(lambda W: _conv_plain(x, W, stride, pad, groups), kernel)
    (dW,) = vjp_w(dy)
    # dx = transposed conv of dy with the flipped kernel, out_len = T_in;
    # rhs2[t, o_local, (g, c_local)] = kernel_flip[t, c_local, (g, o_local)]
    k, in_g, out = kernel.shape
    out_g = out // groups
    rhs2 = (jnp.flip(kernel, 0)
            .reshape(k, in_g, groups, out_g)
            .transpose(0, 3, 2, 1)            # (k, out_g, groups, in_g)
            .reshape(k, out_g, groups * in_g))
    dx = _polyphase_convt(dy, rhs2, stride, k - 1 - pad, None,
                          out_len=x.shape[1], groups=groups)
    return dx, dW


_strided_conv_fast.defvjp(_strided_conv_fwd, _strided_conv_bwd)


class ConvTranspose1d(nn.Module):
    """1D transposed convolution with torch semantics, NWC layout.

    Output length = (T-1)*stride - 2*padding + kernel_size.  When
    ``kernel_size - 2*padding == stride`` (every HiFi-GAN upsampler) the
    op runs as a polyphase decomposition — one dense stride-1 conv with
    ``stride*features`` output channels, reshaped to interleave the
    phases (:func:`_polyphase_convt`).  Otherwise it falls back to the
    input-dilated correlation (``lhs_dilation=stride`` with the kernel
    flipped).  The dilated form burns ``stride``× the FLOPs on dilation
    zeros and its TPU lowering relayouts poorly in bf16; the polyphase
    form is the same math regrouped into MXU-shaped dense dots.

    ``norm='weight'`` stores ``(v, g)`` with the norm per *input*
    channel over (k, out): torch ``weight_norm(ConvTranspose1d, dim=0)``
    normalises dim 0 of the ``[in, out, k]`` weight, i.e. per input
    channel — the reference's upsampler stack (``sr/models.py:83-86``)
    trains with exactly that parameterisation.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    norm: Optional[str] = None
    kernel_init: Optional[Callable] = None
    precision: Optional[jax.lax.Precision] = None
    dtype: Optional[jnp.dtype] = None
    polyphase: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        # kernel stored as (k, out, in) so that WIO correlation after a
        # flip+transpose implements the torch scatter semantics.
        k_shape = (self.kernel_size, self.features, in_ch)
        kinit = self.kernel_init or torch_conv_init(in_ch * self.kernel_size)

        if self.norm == "weight":
            v = self.param("v", kinit, k_shape)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))).reshape(shape),
                (1, 1, in_ch),
            )
            kernel = _wn_kernel(v, g, axes=(0, 1))
        else:
            kernel = self.param("kernel", kinit, k_shape)

        # correlate the stride-dilated input with the flipped kernel
        rhs = jnp.flip(kernel, axis=0).transpose(0, 2, 1)  # (k, in, out)
        pad = self.kernel_size - 1 - self.padding
        if self.dtype is not None:
            x = x.astype(self.dtype)
            rhs = rhs.astype(self.dtype)
        if (self.polyphase and self.stride > 1
                and self.kernel_size - 2 * self.padding == self.stride):
            y = _polyphase_convt(x, rhs, self.stride, pad, self.precision)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                rhs,
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=self.precision,
            )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(in_ch * self.kernel_size), (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


class Conv2d(nn.Module):
    """2D convolution (NHWC) with optional weight/spectral norm — for the MPD."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    norm: Optional[str] = None
    kernel_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    s2d: bool = False  # rank-3 fast path only (see Conv1d.s2d)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        k_shape = (kh, kw, in_ch, self.features)
        fan_in = in_ch * kh * kw
        kinit = self.kernel_init or torch_conv_init(fan_in)

        if self.norm == "weight":
            v = self.param("v", kinit, k_shape)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))).reshape(shape),
                (1, 1, 1, self.features),
            )
            kernel = _wn_kernel(v, g, axes=(0, 1, 2))
        elif self.norm == "spectral":
            kernel = self.param("kernel", kinit, k_shape)
            w = kernel.reshape(-1, self.features).T
            u_var = self.variable(
                "spectral", "u", lambda: jax.random.normal(self.make_rng("params"), (self.features,))
            )
            u = u_var.value
            if train:
                v2 = w.T @ u
                v2 = v2 / (jnp.linalg.norm(v2) + 1e-12)
                u = w @ v2
                u = u / (jnp.linalg.norm(u) + 1e-12)
                u = jax.lax.stop_gradient(u)
                v2 = jax.lax.stop_gradient(v2)
                u_var.value = u
            else:
                v2 = w.T @ u
                v2 = v2 / (jnp.linalg.norm(v2) + 1e-12)
            sigma = u @ (w @ v2)
            kernel = kernel / sigma
        else:
            kernel = self.param("kernel", kinit, k_shape)

        if self.dtype is not None:
            # norm reparameterisations (weight/spectral) stay f32 above;
            # only the conv itself runs in the compute dtype
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        if x.ndim == 3:
            # rank-3 fast path: a (kh, 1) kernel applied to [N, H, C] is a
            # 1D conv — keeps H in sublanes / C in lanes with no W padding
            assert kw == 1 and self.padding[1] == 0 and self.strides[1] == 1
            if self.s2d and self.strides[0] > 1:
                y = _strided_conv_s2d(x, kernel[:, 0, :, :], self.strides[0],
                                      self.padding[0])
            else:
                y = jax.lax.conv_general_dilated(
                    x,
                    kernel[:, 0, :, :],
                    window_strides=(self.strides[0],),
                    padding=[(self.padding[0], self.padding[0])],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=self.strides,
                padding=[(self.padding[0], self.padding[0]),
                         (self.padding[1], self.padding[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


def fold_weight_norm(params):
    """Fold every (v, g) weight-norm pair into a direct kernel.

    Pure-functional equivalent of the reference's ``remove_weight_norm``
    inference-time folding (``sr/models.py:116-122``): returns a new
    param tree where each ``{'v': ..., 'g': ...}`` subtree becomes
    ``{'kernel': g * v/||v||}`` — exactly the tree a ``norm=None`` module
    declares, so apply the folded tree with modules built without weight
    norm (the vocoder reads ``VocoderConfig.folded_weights``;
    ``VocoderEngine`` folds automatically at construction).  Works for
    Conv1d (k,in,out), ConvTranspose1d (k,out,in) and Conv2d (h,w,in,out)
    pairs — all normalise over every axis but the last.  Numerics are
    identical (the same ``_wn_kernel`` evaluated once instead of per
    call); the win is skipping the per-call normalisation in un-donated
    inference programs where XLA cannot constant-fold it.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    done = set()
    for path, leaf in flat.items():
        if path in done:
            continue
        if path[-1] == "v":
            g_path = path[:-1] + ("g",)
            if g_path in flat:
                v, g = leaf, flat[g_path]
                if v.ndim == 3:
                    axes = (0, 1)
                elif v.ndim == 4:
                    axes = (0, 1, 2)
                else:
                    axes = tuple(range(v.ndim - 1))
                out[path[:-1] + ("kernel",)] = _wn_kernel(v, g, axes)
                done.add(g_path)
                continue
        out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


class Embed(nn.Module):
    """Embedding table with optional padding index whose output is zero.

    Matches ``nn.Embedding(..., padding_idx=n)`` semantics (reference
    ``model/len_predictor.py:15``): the pad token embeds to the zero
    vector.  torch default init is N(0, 1).
    """

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            lambda key, shape: jax.random.normal(key, shape),
            (self.num_embeddings, self.features),
        )
        out = jnp.take(table, ids, axis=0)
        if self.padding_idx is not None:
            out = jnp.where((ids == self.padding_idx)[..., None], 0.0, out)
        return out
