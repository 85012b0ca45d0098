"""Numerical parity of conv primitives against torch CPU semantics.

torch (CPU build) is available in this environment; these tests pin our
NWC/lax-based convs to the exact semantics the reference models rely on
(torch Conv1d / ConvTranspose1d / weight_norm / avg_pool1d).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dissc_tpu.models.layers import Conv1d, ConvTranspose1d, fold_weight_norm


def _jax_conv_apply(module, x_nwc, params):
    return module.apply({"params": params}, x_nwc)


@pytest.mark.parametrize("k,s,d,groups", [(3, 1, 1, 1), (7, 1, 1, 1), (3, 1, 5, 1), (41, 2, 1, 4), (11, 3, 1, 1)])
def test_conv1d_matches_torch(rng, k, s, d, groups):
    b, t, cin, cout = 2, 64, 8, 12
    pad = (k * d - d) // 2
    x = rng.standard_normal((b, cin, t)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.tensor(x), torch.tensor(w), torch.tensor(bias), stride=s, padding=pad,
        dilation=d, groups=groups,
    ).numpy()

    mod = Conv1d(cout, k, stride=s, dilation=d, groups=groups, padding=pad)
    params = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(bias)}
    out = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=2e-5)


@pytest.mark.parametrize("k,s,p", [(11, 5, 3), (8, 4, 2), (4, 2, 1), (16, 8, 4)])
def test_conv_transpose1d_matches_torch(rng, k, s, p):
    b, t, cin, cout = 2, 16, 6, 10
    x = rng.standard_normal((b, cin, t)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)  # torch layout
    bias = rng.standard_normal(cout).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), torch.tensor(bias), stride=s, padding=p
    ).numpy()

    mod = ConvTranspose1d(cout, k, stride=s, padding=p)
    # our layout: (k, out, in)
    params = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(bias)}
    out = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    assert ref.shape[-1] == (t - 1) * s - 2 * p + k
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=2e-5)


def test_weight_norm_matches_torch(rng):
    """(v, g) reparam == torch weight_norm(Conv1d, dim=0)."""
    cin, cout, k, t = 5, 7, 3, 32
    x = rng.standard_normal((2, cin, t)).astype(np.float32)

    conv = torch.nn.Conv1d(cin, cout, k, padding=1)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        conv.weight_g.copy_(torch.rand_like(conv.weight_g) + 0.5)
        conv.weight_v.copy_(torch.randn_like(conv.weight_v))
    ref = conv(torch.tensor(x)).detach().numpy()

    v = conv.weight_v.detach().numpy()  # [out, in, k]
    g = conv.weight_g.detach().numpy()  # [out, 1, 1]
    bias = conv.bias.detach().numpy()
    mod = Conv1d(cout, k, padding=1, norm="weight")
    params = {
        "v": jnp.asarray(v.transpose(2, 1, 0)),
        "g": jnp.asarray(g.reshape(1, 1, cout)),
        "bias": jnp.asarray(bias),
    }
    out = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=2e-5)

    # fold_weight_norm produces the same conv via a direct kernel
    folded = fold_weight_norm({"c": dict(params)})["c"]
    assert "kernel" in folded and "v" not in folded
    mod2 = Conv1d(cout, k, padding=1)
    out2 = mod2.apply({"params": folded}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def test_weight_norm_transpose_matches_torch(rng):
    """(v, g) on ConvTranspose == torch weight_norm(ConvTranspose1d, dim=0)
    — which normalises per *input* channel."""
    cin, cout, k, s, p, t = 4, 6, 8, 4, 2, 16
    x = rng.standard_normal((2, cin, t)).astype(np.float32)

    conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s, padding=p)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        conv.weight_g.copy_(torch.rand_like(conv.weight_g) + 0.5)
        conv.weight_v.copy_(torch.randn_like(conv.weight_v))
    ref = conv(torch.tensor(x)).detach().numpy()

    v = conv.weight_v.detach().numpy()  # [in, out, k]
    g = conv.weight_g.detach().numpy()  # [in, 1, 1]
    bias = conv.bias.detach().numpy()
    mod = ConvTranspose1d(cout, k, stride=s, padding=p, norm="weight")
    params = {
        "v": jnp.asarray(v.transpose(2, 1, 0)),  # (k, out, in)
        "g": jnp.asarray(g.reshape(1, 1, cin)),
        "bias": jnp.asarray(bias),
    }
    out = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=2e-5)


def test_avg_pool1d_matches_torch(rng):
    from dissc_tpu.models.discriminators import _avg_pool1d

    x = rng.standard_normal((2, 37)).astype(np.float32)
    ref = torch.nn.functional.avg_pool1d(
        torch.tensor(x)[:, None, :], 4, 2, padding=2
    ).numpy()[:, 0, :]
    out = np.asarray(_avg_pool1d(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)
