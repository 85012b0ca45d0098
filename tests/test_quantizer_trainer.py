"""F0-VQVAE quantizer training smoke test."""
import os

import numpy as np


class _SyntheticF0Dataset:
    """Contours with two modes so the VQ has structure to capture."""

    def __init__(self, n=24, t=64, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            base = 120.0 if i % 2 == 0 else 220.0
            f0 = base + 20 * np.sin(np.linspace(0, 4, t)) + rng.normal(0, 3, t)
            f0 = f0 * (rng.random(t) > 0.2)
            self.items.append({"f0": f0.reshape(t, 1).astype(np.float32)})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_f0_quantizer_trains_and_checkpoints(tmp_path):
    from dissc_tpu.train.quantizer_trainer import (
        DEFAULT_F0_PARAMS,
        train_f0_quantizer,
    )

    qp = dict(
        f0_encoder_params=dict(input_emb_width=1, output_emb_width=16, levels=1,
                               downs_t=[2], strides_t=[2], width=16, depth=1,
                               m_conv=1.0),
        f0_vq_params=dict(l_bins=8, emb_width=16, mu=0.99, levels=1),
        f0_decoder_params=dict(input_emb_width=1, output_emb_width=16, levels=1,
                               downs_t=[2], strides_t=[2], width=16, depth=1,
                               m_conv=1.0),
    )
    ds = _SyntheticF0Dataset()
    ckpt = str(tmp_path / "f0vq")
    state = train_f0_quantizer(
        ds, ckpt, batch_size=4, training_steps=8, checkpoint_interval=4,
        quantizer_params=qp,
    )
    assert int(state.step) == 8
    assert any(f.startswith("g_") for f in os.listdir(ckpt))

    # the trained stack encodes/decodes and the codebook is initialised
    import jax

    k = jax.tree_util.tree_leaves(state.vq_state)[0]
    assert float(np.abs(np.asarray(k)).sum()) > 0
