"""Integration: prosody training -> checkpoints -> conversion -> vocoder.

The end-to-end smoke path of SURVEY.md §4: a synthetic toy corpus runs
through the full slice (train rhythm+pitch predictors, convert a val
split, vocode to waveforms) on the virtual CPU mesh.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dissc_tpu.core.config import ProsodyConfig, VocoderConfig
from dissc_tpu.data.stats import calculate_pitch_stats, save_id_to_spkr


def _make_toy_corpus(root, n_train=12, n_val=4, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    speakers = ["p1", "p2"]
    save_id_to_spkr(os.path.join(root, "id_to_spkr.pkl"), speakers)

    def gen_records(n, offset):
        recs = []
        for i in range(n):
            spk = speakers[i % 2]
            n_runs = int(rng.integers(5, 12))
            units, f0 = [], []
            for _ in range(n_runs):
                u = int(rng.integers(0, 20))
                run = int(rng.integers(1, 4))
                units += [u] * run
                base = 120.0 if spk == "p1" else 220.0
                f0 += [0.0 if rng.random() < 0.3 else base + float(rng.normal(0, 15))] * run
            recs.append({"units": units, "f0": f0, "audio": f"{spk}_{offset+i:03d}.wav"})
        return recs

    for split, recs in (("train", gen_records(n_train, 100)), ("val", gen_records(n_val, 200))):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    calculate_pitch_stats(os.path.join(root, "train.txt"), os.path.join(root, "f0_stats.pkl"))
    return root


@pytest.fixture(scope="module")
def toy_corpus(tmp_path_factory):
    return _make_toy_corpus(str(tmp_path_factory.mktemp("corpus")))


@pytest.fixture(scope="module")
def trained_checkpoints(toy_corpus, tmp_path_factory):
    from dissc_tpu.train.prosody_trainer import train_f0_predictor, train_len_predictor

    out = str(tmp_path_factory.mktemp("ckpt"))
    cfg = ProsodyConfig(n_epochs=2, batch_size=4, n_tokens=100)
    len_dir = train_len_predictor(toy_corpus, out, cfg)
    pitch_dir = train_f0_predictor(
        toy_corpus, os.path.join(toy_corpus, "f0_stats.pkl"), out,
        ProsodyConfig(n_epochs=2, batch_size=4, model_type="new"),
    )
    return len_dir, pitch_dir


def test_prosody_training_writes_checkpoints(trained_checkpoints):
    len_dir, pitch_dir = trained_checkpoints
    assert os.path.exists(os.path.join(len_dir, "best_model.pth"))
    assert os.path.exists(os.path.join(len_dir, "len_norm_stats.pth"))
    assert os.path.exists(os.path.join(pitch_dir, "best_model.pth"))


def test_infer_file_writes_jsonl(toy_corpus, trained_checkpoints, tmp_path):
    from dissc_tpu.data.jsonl import read_unit_records
    from dissc_tpu.infer.prosody import infer_file

    len_dir, pitch_dir = trained_checkpoints
    out = str(tmp_path / "pred")
    infer_file(
        input_path=os.path.join(toy_corpus, "val.txt"),
        out_path=out,
        len_model_dir=len_dir,
        f0_model_dir=pitch_dir,
        f0_stats_path=os.path.join(toy_corpus, "f0_stats.pkl"),
        vc=True,
        target_speakers=["p2"],
    )
    recon = read_unit_records(os.path.join(out, "val.txt"))
    conv = read_unit_records(os.path.join(out, "p2_val.txt"))
    assert len(recon) == len(conv) == 4
    for r in recon + conv:
        assert len(r["units"]) == len(r["f0"]) > 0
        assert all(0 <= u < 100 for u in r["units"])
        # predicted durations >= 1 per run: output at least as long as a dedup
        assert set(r.keys()) == {"units", "f0", "audio"}


def test_infer_no_pitch_model_heuristic_path(toy_corpus, trained_checkpoints, tmp_path):
    from dissc_tpu.data.jsonl import read_unit_records
    from dissc_tpu.infer.prosody import infer_file

    len_dir, _ = trained_checkpoints
    out = str(tmp_path / "pred_heur")
    infer_file(
        input_path=os.path.join(toy_corpus, "val.txt"),
        out_path=out,
        len_model_dir=len_dir,
        f0_model_dir=None,
        f0_stats_path=os.path.join(toy_corpus, "f0_stats.pkl"),
    )
    recon = read_unit_records(os.path.join(out, "val.txt"))
    for r in recon:
        assert len(r["units"]) == len(r["f0"])  # morphed pitch matches re-timed length


def test_gan_train_step_runs_and_updates():
    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    h = VocoderConfig(
        upsample_initial_channel=32,
        embedding_dim=8,
        model_in_dim=17,
        segment_size=1280,
        batch_size=2,
    )
    state, gen_tx, disc_tx = init_gan_state(h, jax.random.key(0), seg_frames=4)
    train_step, val_step = make_gan_train_step(h, gen_tx, disc_tx)

    rng = np.random.default_rng(0)
    batch = {
        "code": jnp.asarray(rng.integers(0, 100, (2, 4)).astype(np.int32)),
        "f0": jnp.asarray(rng.normal(0, 1, (2, 4, 1)).astype(np.float32)),
        "spkr": jnp.zeros((2, 1), jnp.int32),
        "audio": jnp.asarray(rng.uniform(-0.5, 0.5, (2, 1280)).astype(np.float32)),
    }
    # snapshot to host BEFORE the step: train_step donates the state
    old_gen = jax.tree_util.tree_map(np.asarray, state.gen_params)
    old_mpd = jax.tree_util.tree_map(np.asarray, state.mpd_params)
    new_state, metrics = train_step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss_gen_total"]))
    assert np.isfinite(float(metrics["loss_disc"]))
    # both param sets actually moved
    g_delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: np.asarray(a) - b, new_state.gen_params, old_gen),
        0.0,
    )
    d_delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: np.asarray(a) - b, new_state.mpd_params, old_mpd),
        0.0,
    )
    assert g_delta > 0 and d_delta > 0
    err, y_hat = val_step(new_state, batch)
    # val_step returns PER-ITEM mel errors (the host averages over
    # unique items so wrap-around-padded final batches trim exactly)
    assert err.shape == (2,) and bool(np.all(np.isfinite(np.asarray(err))))
    assert y_hat.shape == (2, 1280)


def test_vocoder_engine_buckets_and_lengths(tmp_path):
    from dissc_tpu.infer.vocoder import VocoderEngine
    from dissc_tpu.models.hifigan import CodeGenerator

    h = VocoderConfig(upsample_initial_channel=32, embedding_dim=8, model_in_dim=17)
    model = CodeGenerator(h)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1, 4, 1)), jnp.zeros((1, 1), jnp.int32),
    )["params"]
    engine = VocoderEngine(h, params, frame_buckets=(8, 16))
    items = [
        {"code": np.array([1, 2, 3], np.int32), "f0": np.zeros((3, 1), np.float32),
         "spkr": np.array([0], np.int32)},
        {"code": np.arange(10, dtype=np.int32), "f0": np.zeros((10, 1), np.float32),
         "spkr": np.array([1], np.int32)},
    ]
    wavs, rtf = engine.synthesize_utterances(items, batch_size=4)
    assert wavs[0].shape == (3 * 320,)
    assert wavs[1].shape == (10 * 320,)
    assert rtf > 0


def test_infer_sample_df_restricts_pairs(toy_corpus, trained_checkpoints, tmp_path):
    """sample_df mode: no reconstruction, only the CSV's (sample, target)
    pairs are converted (reference infer.py:112-122)."""
    import pandas as pd

    from dissc_tpu.data.jsonl import read_unit_records
    from dissc_tpu.infer.prosody import infer_file

    len_dir, pitch_dir = trained_checkpoints
    # val records are p1_200.wav, p2_201.wav, p1_202.wav, p2_203.wav
    df = pd.DataFrame({
        "ref": ["p2_000", "p1_000"],
        "syn_trgt": ["p2", "p1"],
        "syn_sample": ["p1_200", "p2_201"],
        "label": [1, 0],
    })
    csv = str(tmp_path / "speaker_verification.csv")
    df.to_csv(csv)

    out = str(tmp_path / "pred_sv")
    infer_file(
        input_path=os.path.join(toy_corpus, "val.txt"),
        out_path=out,
        len_model_dir=len_dir,
        f0_model_dir=pitch_dir,
        f0_stats_path=os.path.join(toy_corpus, "f0_stats.pkl"),
        vc=True,
        sample_df=csv,
    )
    assert not os.path.exists(os.path.join(out, "val.txt"))  # no reconstruction
    p2_recs = read_unit_records(os.path.join(out, "p2_val.txt"))
    assert [r["audio"] for r in p2_recs] == ["p1_200.wav"]
    p1_recs = read_unit_records(os.path.join(out, "p1_val.txt"))
    assert [r["audio"] for r in p1_recs] == ["p2_201.wav"]


def test_prosody_truncation_warns(toy_corpus, trained_checkpoints):
    """expand_factor clipping must warn and count, never truncate silently."""
    import pickle
    import warnings

    from dissc_tpu.data.jsonl import read_unit_records
    from dissc_tpu.data.stats import load_f0_stats, load_id_to_spkr, prep_stats_arrays
    from dissc_tpu.infer.prosody import ProsodyConverter

    len_dir, pitch_dir = trained_checkpoints
    spk_id_dict = load_id_to_spkr(os.path.join(toy_corpus, "id_to_spkr.pkl"))
    stats = load_f0_stats(os.path.join(toy_corpus, "f0_stats.pkl"))
    id2mean, id2std = prep_stats_arrays(spk_id_dict, stats)
    conv = ProsodyConverter.load(
        n_speakers=len(spk_id_dict), len_model_dir=len_dir,
        f0_model_dir=pitch_dir, id2pitch_mean=id2mean, id2pitch_std=id2std,
    )
    conv.expand_factor = 0.05  # force the cap below any plausible output
    records = read_unit_records(os.path.join(toy_corpus, "val.txt"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = conv.convert_records(records, spk_id_dict)
    assert conv.truncation_count > 0
    assert any("truncated" in str(x.message) for x in w)
    assert all(len(r["units"]) > 0 for r in out)
