"""ConversionPipeline: the one-call Python API over the jitted engines.

Builds the full artifact layout (id_to_spkr.pkl / f0_stats.pkl / prosody
checkpoint dirs / vocoder checkpoint dir) with tiny random-init models
and drives record -> waveform conversion end-to-end, covering what the
reference only offers as a subprocess chain
(``scripts/convert_eval.py:55-139``).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.models.hifigan import CodeGenerator
from dissc_tpu.models.prosody import LenPredictor
from dissc_tpu.pipeline import ConversionPipeline
from dissc_tpu.train.checkpoints import save_checkpoint
from dissc_tpu.train.prosody_trainer import build_pitch_model

SPEAKERS = ["p231", "p245", "p270"]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    key = jax.random.key(0)

    import pickle

    with open(root / "id_to_spkr.pkl", "wb") as f:
        pickle.dump(SPEAKERS, f)
    with open(root / "f0_stats.pkl", "wb") as f:
        pickle.dump({s: {"mean": 140.0 + 10 * i, "std": 15.0 + i}
                     for i, s in enumerate(SPEAKERS)}, f)

    len_dir = root / "len"
    len_dir.mkdir()
    len_model = LenPredictor(n_tokens=100, n_speakers=len(SPEAKERS))
    len_vars = len_model.init(key, jnp.zeros((1, 16), jnp.int32),
                              jnp.zeros((1, 1), jnp.int32),
                              (jnp.float32(4.0), jnp.float32(2.0)))
    save_checkpoint(str(len_dir / "best_model.pth"), dict(len_vars))
    save_checkpoint(str(len_dir / "len_norm_stats.pth"), (4.0, 2.0))

    pitch_dir = root / "pitch"
    pitch_dir.mkdir()
    pitch_model = build_pitch_model("new", 100, len(SPEAKERS))
    pitch_vars = pitch_model.init(key, jnp.zeros((1, 32), jnp.int32),
                                  jnp.zeros((1, 1), jnp.int32))
    save_checkpoint(str(pitch_dir / "best_model.pth"), dict(pitch_vars))

    voc_dir = root / "vocoder"
    voc_dir.mkdir()
    h = VocoderConfig(upsample_initial_channel=32, embedding_dim=8,
                      model_in_dim=17)
    with open(voc_dir / "config.json", "w") as f:
        json.dump({"upsample_initial_channel": 32, "embedding_dim": 8,
                   "model_in_dim": 17}, f)
    voc = CodeGenerator(h)
    voc_params = voc.init(key, jnp.zeros((1, 32), jnp.int32),
                          jnp.zeros((1, 32, 1), jnp.float32),
                          jnp.zeros((1, 1), jnp.int32))["params"]
    save_checkpoint(str(voc_dir / "g_00000000"), {"generator": voc_params})
    return root


def _record(rng, spk, n=20):
    units, f0 = [], []
    while len(units) < n:
        run = int(rng.integers(1, 4))
        u = int(rng.integers(0, 100))
        units += [u] * run
        f0 += [0.0 if rng.random() < 0.3 else 150.0 + float(rng.normal(0, 8))] * run
    return {"units": units[:n], "f0": f0[:n], "audio": f"{spk}_001.wav"}


@pytest.fixture(scope="module")
def pipe(artifacts):
    return ConversionPipeline.load(
        vocoder_ckpt=str(artifacts / "vocoder"),
        id_to_spkr=str(artifacts / "id_to_spkr.pkl"),
        len_model_dir=str(artifacts / "len"),
        f0_model_dir=str(artifacts / "pitch"),
        f0_stats=str(artifacts / "f0_stats.pkl"),
    )


@pytest.mark.fast
def test_convert_record(pipe):
    rng = np.random.default_rng(0)
    wav, sr = pipe.convert_record(_record(rng, "p231"), "p245")
    assert sr == 16000
    assert wav.ndim == 1 and wav.size > 0
    assert wav.size % 320 == 0  # whole code frames
    assert np.isfinite(wav).all()


@pytest.mark.fast
def test_convert_record_deterministic_and_target_sensitive(pipe, monkeypatch):
    rng = np.random.default_rng(1)
    rec = _record(rng, "p231")
    w1, _ = pipe.convert_record(rec, "p245")
    w2, _ = pipe.convert_record(rec, "p245")
    np.testing.assert_array_equal(w1, w2)
    # The random-init generator follows the reference's N(0, 0.01) conv
    # init, which attenuates input differences below f32 resolution — so
    # target sensitivity is asserted at the vocoder's INPUT: different
    # targets must condition synthesis with different spkr ids and
    # different predicted f0 contours.
    captured = []
    orig = pipe.vocoder.synthesize_utterances

    def spy(items, **kw):
        captured.append(items)
        return orig(items, **kw)

    monkeypatch.setattr(pipe.vocoder, "synthesize_utterances", spy)
    pipe.convert_record(rec, "p245")
    pipe.convert_record(rec, "p270")
    (a,), (b,) = captured
    assert a["spkr"][0] == pipe.spk_dict["p245"]
    assert b["spkr"][0] == pipe.spk_dict["p270"]
    assert not np.allclose(a["f0"], b["f0"])  # pitch predictor saw the target


@pytest.mark.fast
def test_convert_batch(pipe):
    rng = np.random.default_rng(2)
    recs = [_record(rng, s, n=16 + 4 * i) for i, s in enumerate(SPEAKERS)]
    wavs, sr = pipe.convert_batch(recs, "p231")
    assert len(wavs) == 3 and sr == 16000
    for w in wavs:
        assert w.size > 0 and np.isfinite(w).all()


@pytest.mark.fast
def test_renorm_f0_and_errors(pipe):
    rng = np.random.default_rng(3)
    rec = _record(rng, "p231")
    w, _ = pipe.convert_record(rec, "p270", renorm_f0=True)
    assert np.isfinite(w).all()
    with pytest.raises(KeyError):
        pipe.convert_record(rec, "nobody")
    with pytest.raises(RuntimeError, match="hubert_weights"):
        pipe.encode(np.zeros(16000, np.float32))
    with pytest.raises(ValueError, match="source_speaker"):
        pipe.convert_record({"units": rec["units"], "f0": rec["f0"]}, "p245")


@pytest.mark.fast
def test_heuristic_pitch_path_honors_norm_pitch(artifacts, monkeypatch):
    """Without a pitch model the pipeline falls back to the reference's
    nearest-interpolation heuristic (``utils.py:47-52``), and the default
    ``norm_pitch=True`` must still whiten the source contour by the
    SOURCE speaker's stats (``infer.py:40-41``) before the vocoder sees
    it — the pipeline may not silently mask the flag on this path."""
    kw = dict(
        vocoder_ckpt=str(artifacts / "vocoder"),
        id_to_spkr=str(artifacts / "id_to_spkr.pkl"),
        len_model_dir=str(artifacts / "len"),
        f0_stats=str(artifacts / "f0_stats.pkl"),
    )
    rng = np.random.default_rng(7)
    rec = _record(rng, "p231")

    captured = []
    for norm in (True, False):
        p = ConversionPipeline.load(norm_pitch=norm, **kw)
        assert p.prosody.pitch_model is None
        orig = p.vocoder.synthesize_utterances

        def spy(items, _orig=orig, **kwargs):
            captured.append(items[0]["f0"])
            return _orig(items, **kwargs)

        monkeypatch.setattr(p.vocoder, "synthesize_utterances", spy)
        p.convert_record(rec, "p245")
    whitened, raw = captured
    # p231: mean 140, std 15 -> voiced ~150 Hz whitens to ~(150-140)/15
    assert np.abs(whitened[whitened != 0]).max() < 10.0
    assert raw[raw != 0].min() > 100.0


@pytest.mark.fast
def test_heuristic_norm_pitch_without_stats_is_a_clean_error(artifacts):
    p = ConversionPipeline.load(
        vocoder_ckpt=str(artifacts / "vocoder"),
        id_to_spkr=str(artifacts / "id_to_spkr.pkl"),
        len_model_dir=str(artifacts / "len"),
    )
    rec = _record(np.random.default_rng(8), "p231")
    with pytest.raises(ValueError, match="f0 statistics"):
        p.convert_record(rec, "p245")
    # opting out of normalisation works without stats
    w, _ = ConversionPipeline.load(
        vocoder_ckpt=str(artifacts / "vocoder"),
        id_to_spkr=str(artifacts / "id_to_spkr.pkl"),
        len_model_dir=str(artifacts / "len"),
        norm_pitch=False,
    ).convert_record(rec, "p245")
    assert w.size > 0 and np.isfinite(w).all()


@pytest.mark.fast
def test_source_speaker_override(pipe):
    """A record without a reference-style name converts when the source
    speaker is passed explicitly."""
    rng = np.random.default_rng(4)
    rec = _record(rng, "p231")
    del rec["audio"]
    w, _ = pipe.convert_record(rec, "p245", source_speaker="p270")
    assert w.size > 0 and np.isfinite(w).all()


@pytest.mark.fast
def test_mesh_serving_matches_single_device(pipe, artifacts):
    """Batch conversion sharded over an 8-virtual-device ``data`` mesh
    reproduces the single-device waveforms — the multi-chip serving shape
    replacing the reference's one-GPU-per-process inference pool
    (``sr/inference.py:288-292``).  Both engines are per-sample programs,
    so the sharded forward is collective-free (it runs on any host, no
    in-process-communicator hazard) and a 5-record batch exercises the
    pad-to-mesh rounding (5 -> 8 rows, padded rows dropped)."""
    from dissc_tpu.parallel.mesh import create_mesh

    mesh_pipe = ConversionPipeline.load(
        vocoder_ckpt=str(artifacts / "vocoder"),
        id_to_spkr=str(artifacts / "id_to_spkr.pkl"),
        len_model_dir=str(artifacts / "len"),
        f0_model_dir=str(artifacts / "pitch"),
        f0_stats=str(artifacts / "f0_stats.pkl"),
        mesh=create_mesh(n_data=8, n_model=1),
    )
    assert mesh_pipe.vocoder.mesh is not None
    assert mesh_pipe.prosody.mesh is not None
    rng = np.random.default_rng(9)
    recs = [_record(rng, "p231", n=12 + 4 * (i % 2)) for i in range(5)]
    w1, _ = pipe.convert_batch(recs, "p245")
    w8, _ = mesh_pipe.convert_batch(recs, "p245")
    assert len(w1) == len(w8) == 5
    for a, b in zip(w1, w8):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)
