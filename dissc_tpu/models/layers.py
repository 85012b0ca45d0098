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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
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

        pad = self.padding if self.padding is not None else same_padding(self.kernel_size, self.dilation)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
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


class ConvTranspose1d(nn.Module):
    """1D transposed convolution with torch semantics, NWC layout.

    Output length = (T-1)*stride - 2*padding + kernel_size.  Implemented
    as an input-dilated correlation (``lhs_dilation=stride`` with the
    kernel flipped), which is exactly what XLA lowers transposed convs
    to — no extra cost, but unambiguous semantics.

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

        if x.ndim == 3:
            # rank-3 fast path: a (kh, 1) kernel applied to [N, H, C] is a
            # 1D conv — keeps H in sublanes / C in lanes with no W padding
            assert kw == 1 and self.padding[1] == 0 and self.strides[1] == 1
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
            y = y + bias
        return y


def fold_weight_norm(params):
    """Fold every (v, g) weight-norm pair into a direct kernel.

    Pure-functional equivalent of the reference's ``remove_weight_norm``
    inference-time folding (``sr/models.py:116-122``): returns a new
    param tree where each ``{'v': ..., 'g': ...}`` subtree becomes
    ``{'kernel': g * v/||v||}``.  Modules accept folded params because a
    folded tree is detected per-leaf at apply time.

    Note: folded params must be applied with modules built via
    ``fold=True`` variants — or simply keep using (v, g); XLA constant-
    folds the normalisation at jit time when params are donated/frozen,
    so folding is an optimisation for repeated un-jitted calls and for
    checkpoint export, not a correctness requirement.
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
