"""ECAPA-TDNN converter fidelity vs a torch replica of speechbrain's model.

speechbrain itself is not installed, so this builds the published
ECAPA-TDNN architecture (Desplanques et al. 2020, exactly as
speechbrain.lobes.models.ECAPA_TDNN composes it: TDNN = Conv1d(reflect
'same' padding) -> ReLU -> BatchNorm1d, Res2Net scale chunks, SE blocks,
global-context attentive statistics pooling, k=1-conv fc) in torch with
speechbrain's state-dict key naming, randomly initialises it, and
asserts ``convert_speechbrain_state_dict`` + our Flax model reproduce
its embeddings numerically — the converter mapping, layouts, BN stats
and pooling semantics all have to be right, not just shapes.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dissc_tpu.models.ecapa import (EcapaConfig, EcapaTDNN,
                                    convert_speechbrain_state_dict)


class SBConv1d(tnn.Module):
    """speechbrain.nnet.CNN.Conv1d: 'same' reflect padding; inner .conv."""

    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = tnn.Conv1d(in_ch, out_ch, k, dilation=dilation)
        self.pad = (k - 1) * dilation // 2

    def forward(self, x):
        if self.pad:
            x = F.pad(x, (self.pad, self.pad), mode="reflect")
        return self.conv(x)


class SBBatchNorm1d(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = tnn.BatchNorm1d(ch)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = SBConv1d(in_ch, out_ch, k, dilation)
        self.activation = tnn.ReLU()
        self.norm = SBBatchNorm1d(out_ch)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class Res2NetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, scale, k, dilation):
        super().__init__()
        w_in, w_out = in_ch // scale, out_ch // scale
        self.blocks = tnn.ModuleList(
            [TDNNBlock(w_in, w_out, k, dilation) for _ in range(scale - 1)])
        self.scale = scale

    def forward(self, x):
        chunks = torch.chunk(x, self.scale, dim=1)
        ys = [chunks[0]]
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + y
            y = self.blocks[i - 1](inp)
            ys.append(y)
        return torch.cat(ys, dim=1)


class SEBlock(tnn.Module):
    def __init__(self, in_ch, se_ch, out_ch):
        super().__init__()
        self.conv1 = SBConv1d(in_ch, se_ch, 1)
        self.conv2 = SBConv1d(se_ch, out_ch, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.relu(self.conv1(s))
        s = torch.sigmoid(self.conv2(s))
        return x * s


class SERes2NetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, scale, se_ch, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(in_ch, out_ch, 1, 1)
        self.res2net_block = Res2NetBlock(out_ch, out_ch, scale, k, dilation)
        self.tdnn2 = TDNNBlock(out_ch, out_ch, 1, 1)
        self.se_block = SEBlock(out_ch, se_ch, out_ch)

    def forward(self, x):
        return x + self.se_block(self.tdnn2(self.res2net_block(self.tdnn1(x))))


class ASP(tnn.Module):
    def __init__(self, ch, attn_ch):
        super().__init__()
        self.tdnn = TDNNBlock(ch * 3, attn_ch, 1, 1)
        self.tanh = tnn.Tanh()
        self.conv = SBConv1d(attn_ch, ch, 1)

    def forward(self, x):
        t = x.shape[2]
        mean = x.mean(dim=2, keepdim=True).expand(-1, -1, t)
        std = torch.sqrt(x.var(dim=2, keepdim=True, unbiased=False)
                         + 1e-12).expand(-1, -1, t)
        attn = self.conv(self.tanh(self.tdnn(torch.cat([x, mean, std], dim=1))))
        w = torch.softmax(attn, dim=2)
        mu = (w * x).sum(dim=2)
        sg = torch.sqrt(((w * x * x).sum(dim=2) - mu**2).clamp(min=1e-12))
        return torch.cat([mu, sg], dim=1)


class FCConv(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = tnn.Conv1d(in_ch, out_ch, 1)

    def forward(self, x):
        return self.conv(x.unsqueeze(2)).squeeze(2)


class RefEcapa(tnn.Module):
    """speechbrain-shaped module tree (state-dict keys match)."""

    def __init__(self, cfg: EcapaConfig):
        super().__init__()
        c = cfg
        self.blocks = tnn.ModuleList([
            TDNNBlock(c.n_mels, c.channels, c.kernel_sizes[0], c.dilations[0]),
            SERes2NetBlock(c.channels, c.channels, c.res2net_scale,
                           c.se_channels, c.kernel_sizes[1], c.dilations[1]),
            SERes2NetBlock(c.channels, c.channels, c.res2net_scale,
                           c.se_channels, c.kernel_sizes[2], c.dilations[2]),
            SERes2NetBlock(c.channels, c.channels, c.res2net_scale,
                           c.se_channels, c.kernel_sizes[3], c.dilations[3]),
        ])
        self.mfa = TDNNBlock(c.channels * 3, c.channels * 3 // 2,
                             c.kernel_sizes[4], c.dilations[4])
        self.asp = ASP(c.channels * 3 // 2, c.attention_channels)
        self.asp_bn = tnn.BatchNorm1d(c.channels * 3)
        self.fc = FCConv(c.channels * 3, c.lin_neurons)

    def forward(self, feats):  # [B, T, n_mels]
        x = feats.transpose(1, 2)
        x = self.blocks[0](x)
        outs = []
        for blk in self.blocks[1:]:
            x = blk(x)
            outs.append(x)
        x = torch.cat(outs, dim=1)
        x = self.mfa(x)
        x = self.asp(x)
        x = self.asp_bn(x)
        return self.fc(x)


@pytest.mark.parametrize("channels", [64])
def test_converter_reproduces_torch_replica(channels):
    cfg = EcapaConfig(channels=channels, se_channels=16, attention_channels=16,
                      lin_neurons=24, n_mels=20)
    torch.manual_seed(0)
    ref = RefEcapa(cfg).eval()
    # non-trivial BN running stats so the stats mapping is exercised
    g = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)

    # speechbrain's mfa norm key path differs from TDNN-in-blocks only by
    # prefix — assert the replica's keys look speechbrain-shaped
    sd = ref.state_dict()
    assert "blocks.0.conv.conv.weight" in sd
    assert "blocks.1.res2net_block.blocks.0.norm.norm.running_mean" in sd
    assert "fc.conv.weight" in sd

    params, stats = convert_speechbrain_state_dict(sd, cfg)

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 50, cfg.n_mels)).astype(np.float32)
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(feats)).numpy()

    import jax.numpy as jnp
    ours = EcapaTDNN(cfg).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(feats), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_emb, atol=2e-4)
