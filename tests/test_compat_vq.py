"""Torch-checkpoint importer tree-compatibility + VQ/jukebox behaviour."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.compat.torch_import import (
    import_code_generator,
    import_len_predictor,
    import_pitch_predictor,
)


def _tree_shapes(t):
    import flax

    return {k: v.shape for k, v in flax.traverse_util.flatten_dict(t).items()}


def _fake_wn_conv1d(sd, prefix, out_ch, in_ch, k, rng):
    sd[f"{prefix}.weight_v"] = rng.standard_normal((out_ch, in_ch, k)).astype(np.float32)
    sd[f"{prefix}.weight_g"] = rng.random((out_ch, 1, 1)).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = rng.standard_normal(out_ch).astype(np.float32)


def _fake_wn_convT1d(sd, prefix, in_ch, out_ch, k, rng):
    sd[f"{prefix}.weight_v"] = rng.standard_normal((in_ch, out_ch, k)).astype(np.float32)
    sd[f"{prefix}.weight_g"] = rng.random((in_ch, 1, 1)).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = rng.standard_normal(out_ch).astype(np.float32)


def test_import_code_generator_tree_matches(rng):
    from dissc_tpu.models.hifigan import CodeGenerator

    h = VocoderConfig(upsample_initial_channel=32, embedding_dim=8, model_in_dim=17)
    model = CodeGenerator(h)
    ref_tree = model.init(
        jax.random.key(0), jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4, 1)),
        jnp.zeros((1, 1), jnp.int32),
    )["params"]

    # synthesise a reference-shaped state dict (sr/models.py naming)
    sd = {}
    _fake_wn_conv1d(sd, "conv_pre", 32, h.model_in_dim, 7, rng)
    ch = 32
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        _fake_wn_convT1d(sd, f"ups.{i}", ch, ch // 2, k, rng)
        ch //= 2
    n = 0
    ch = 32
    for i in range(len(h.upsample_rates)):
        ch //= 2
        for j, rk in enumerate(h.resblock_kernel_sizes):
            for jj in range(3):
                _fake_wn_conv1d(sd, f"resblocks.{n}.convs1.{jj}", ch, ch, rk, rng)
                _fake_wn_conv1d(sd, f"resblocks.{n}.convs2.{jj}", ch, ch, rk, rng)
            n += 1
    _fake_wn_conv1d(sd, "conv_post", 1, ch, 7, rng)
    sd["dict.weight"] = rng.standard_normal((h.num_embeddings, 8)).astype(np.float32)
    sd["spkr.weight"] = rng.standard_normal((200, 8)).astype(np.float32)

    imported = import_code_generator(sd, h)
    assert _tree_shapes(imported) == _tree_shapes(ref_tree)
    # imported params actually run
    y = model.apply({"params": imported}, jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 4, 1)), jnp.zeros((1, 1), jnp.int32))
    assert y.shape == (1, 4 * 320)


def test_import_len_predictor_tree_matches(rng):
    from dissc_tpu.models.prosody import LenPredictor

    model = LenPredictor(n_tokens=100, n_speakers=4)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32),
                     jnp.zeros((1, 1), jnp.int32), (0.0, 1.0))

    sd = {"token_emb.weight": rng.standard_normal((101, 32)).astype(np.float32),
          "spk_emb.weight": rng.standard_normal((4, 32)).astype(np.float32)}
    convs = [("cnn1", 64, 128)] + [(f"cnn1{i}", 128, 128) for i in range(1, 7)]
    for name, cin, cout in convs:
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, 3)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)
    sd["cnn2.weight"] = rng.standard_normal((1, 128, 3)).astype(np.float32)
    sd["cnn2.bias"] = rng.standard_normal(1).astype(np.float32)
    for bn in ["bn1"] + [f"bn1{i}" for i in range(1, 7)]:
        sd[f"{bn}.weight"] = np.ones(128, np.float32)
        sd[f"{bn}.bias"] = np.zeros(128, np.float32)
        sd[f"{bn}.running_mean"] = np.zeros(128, np.float32)
        sd[f"{bn}.running_var"] = np.ones(128, np.float32)

    imported = import_len_predictor(sd)
    assert _tree_shapes(imported["params"]) == _tree_shapes(ref["params"])
    assert _tree_shapes(imported["batch_stats"]) == _tree_shapes(ref["batch_stats"])
    out = model.apply(imported, jnp.zeros((1, 4), jnp.int32),
                      jnp.zeros((1, 1), jnp.int32), (0.0, 1.0))
    assert out.shape == (1, 4)


def test_import_pitch_predictor_new_tree_matches(rng):
    from dissc_tpu.models.prosody import PitchPredictor

    model = PitchPredictor(n_tokens=100, n_speakers=4)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32),
                     jnp.zeros((1, 1), jnp.int32))

    sd = {"token_emb.weight": rng.standard_normal((101, 32)).astype(np.float32),
          "spk_emb.weight": rng.standard_normal((5, 32)).astype(np.float32)}
    convs = ([("cnn1", 64, 128, 3)] + [(f"cnn1{i}", 128, 128, 3) for i in range(1, 8)]
             + [("cnn2", 128, 128, 3), ("cnn_class1", 128, 128, 3),
                ("cnn_class2", 128, 1, 1), ("cnn_reg1", 128, 128, 3),
                ("cnn_reg2", 128, 1, 1)])
    for name, cin, cout, k in convs:
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)
    sd["bn2.weight"] = np.ones(128, np.float32)
    sd["bn2.bias"] = np.zeros(128, np.float32)
    sd["bn2.running_mean"] = np.zeros(128, np.float32)
    sd["bn2.running_var"] = np.ones(128, np.float32)

    imported = import_pitch_predictor(sd, "new")
    assert _tree_shapes(imported["params"]) == _tree_shapes(ref["params"])
    assert _tree_shapes(imported["batch_stats"]) == _tree_shapes(ref["batch_stats"])


def test_vq_bottleneck_straight_through(rng):
    from dissc_tpu.models.vq import Bottleneck

    vq = Bottleneck(l_bins=8, emb_width=4, mu=0.99, levels=1)
    x = [jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))]
    variables = vq.init({"params": jax.random.key(0), "vq": jax.random.key(1)}, x)
    (zs, xq, commits, metrics), new_state = vq.apply(
        variables, x, rngs={"vq": jax.random.key(2)}, mutable=["vq_state"]
    )
    assert zs[0].shape == (2, 6)
    assert xq[0].shape == (2, 6, 4)
    assert float(commits[0]) >= 0
    # codebook got initialised from data
    k = jax.tree_util.tree_leaves(new_state["vq_state"])[0]
    assert np.abs(np.asarray(k)).sum() > 0

    # eval path: no state mutation needed (module is state-only, no params)
    zs2, xq2, _, _ = vq.apply(
        {"vq_state": new_state["vq_state"]},
        x, update_k=False, rngs={"vq": jax.random.key(3)},
    )
    np.testing.assert_array_equal(np.asarray(zs2[0]).shape, (2, 6))


def test_jukebox_encoder_decoder_roundtrip_shapes(rng):
    from dissc_tpu.models.jukebox import Decoder, Encoder

    kw = dict(input_emb_width=1, output_emb_width=8, levels=1, downs_t=[2],
              strides_t=[2], width=8, depth=2, m_conv=1.0)
    enc = Encoder(**kw)
    dec = Decoder(**kw)
    x = jnp.asarray(rng.standard_normal((2, 16, 1)).astype(np.float32))
    ep = enc.init(jax.random.key(0), x)
    xs = enc.apply(ep, x)
    assert xs[0].shape == (2, 4, 8)  # 16 / 2**2
    dp = dec.init(jax.random.key(1), xs)
    y = dec.apply(dp, xs)
    assert y.shape == (2, 16, 1)


def test_export_import_roundtrip(rng):
    """export_code_generator(import) == identity on the torch-layout dict,
    and import(export) == identity on the Flax tree."""
    import jax

    from dissc_tpu.compat.torch_export import export_code_generator
    from dissc_tpu.models.hifigan import CodeGenerator

    h = VocoderConfig(upsample_initial_channel=32, embedding_dim=8, model_in_dim=17)
    model = CodeGenerator(h)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4, 1)),
        jnp.zeros((1, 1), jnp.int32),
    )["params"]

    sd = export_code_generator(params, h)
    back = import_code_generator(sd, h)
    flat_a = _tree_shapes(params)
    flat_b = _tree_shapes(back)
    assert flat_a == flat_b
    import flax

    for (ka, va), (kb, vb) in zip(
        sorted(flax.traverse_util.flatten_dict(params).items()),
        sorted(flax.traverse_util.flatten_dict(back).items()),
    ):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(va), vb, atol=1e-7, err_msg=str(ka))


def test_prosody_export_import_roundtrip(rng):
    import jax

    from dissc_tpu.compat.torch_export import export_len_predictor, export_pitch_predictor
    from dissc_tpu.models.prosody import LenPredictor, PitchPredictor
    from dissc_tpu.compat.torch_import import import_len_predictor, import_pitch_predictor
    import flax

    lm = LenPredictor(n_tokens=100, n_speakers=4)
    v = lm.init(jax.random.key(1), jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, 1), jnp.int32), (0.0, 1.0))
    back = import_len_predictor(export_len_predictor(v))
    for (ka, va), (kb, vb) in zip(
        sorted(flax.traverse_util.flatten_dict(v["params"]).items()),
        sorted(flax.traverse_util.flatten_dict(back["params"]).items()),
    ):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(va), vb, atol=1e-7)

    pm = PitchPredictor(n_tokens=100, n_speakers=4)
    v = pm.init(jax.random.key(2), jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, 1), jnp.int32))
    back = import_pitch_predictor(export_pitch_predictor(v, "new"), "new")
    for (ka, va), (kb, vb) in zip(
        sorted(flax.traverse_util.flatten_dict(v["params"]).items()),
        sorted(flax.traverse_util.flatten_dict(back["params"]).items()),
    ):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(va), vb, atol=1e-7)
