"""Vocoder pipeline integration: dataset -> GAN training -> checkpoints ->
resume -> inference, on a tiny config with synthetic WAVs."""
import json
import os

import numpy as np
import pytest

from dissc_tpu.core.config import VocoderConfig
from dissc_tpu.core.wav import write_wav


def _make_vocoder_corpus(root, n_files=6, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    records = []
    for i in range(n_files):
        spk = ["p1", "p2"][i % 2]
        n_frames = int(rng.integers(8, 14))
        wav = (rng.standard_normal(n_frames * 320) * 0.2).astype(np.float32)
        name = f"{spk}_{i:03d}.wav"
        write_wav(os.path.join(root, "wav", name), wav, 16000)
        units = rng.integers(0, 100, n_frames).tolist()
        f0 = (rng.uniform(80, 250, n_frames) * (rng.random(n_frames) > 0.3)).tolist()
        records.append({"units": units, "f0": f0, "audio": name})
    for split, recs in (("train", records[:4]), ("val", records[4:])):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    return root


def _tiny_config(root):
    return VocoderConfig(
        upsample_initial_channel=32,
        embedding_dim=8,
        model_in_dim=17,
        segment_size=1280,
        batch_size=2,
        input_training_file=os.path.join(root, "train.txt"),
        input_validation_file=os.path.join(root, "val.txt"),
        train_base_path=os.path.join(root, "wav"),
        val_base_path=os.path.join(root, "wav"),
        test_base_path=os.path.join(root, "wav"),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return _make_vocoder_corpus(str(tmp_path_factory.mktemp("voc")))


def test_code_dataset_native_and_python_paths_agree(corpus):
    from dissc_tpu.data.code_dataset import CodeDataset, get_dataset_filelist

    h = _tiny_config(corpus)
    files, _ = get_dataset_filelist(h)
    ds_a = CodeDataset(files, h.segment_size, h.code_hop_size, h.sampling_rate, seed=7)
    ds_b = CodeDataset(files, h.segment_size, h.code_hop_size, h.sampling_rate, seed=7)
    batch_native = next(ds_a.batches(2, shuffle=False, use_native=True))
    batch_python = next(ds_b.batches(2, shuffle=False, use_native=False))
    for k in ("code", "f0", "spkr"):
        np.testing.assert_array_equal(batch_native[k], batch_python[k], err_msg=k)
    np.testing.assert_allclose(batch_native["audio"], batch_python["audio"], atol=1e-5)


def test_code_dataset_f0_false_omits_key(corpus):
    from dissc_tpu.data.code_dataset import CodeDataset, get_dataset_filelist

    h = _tiny_config(corpus)
    files, _ = get_dataset_filelist(h)
    for use_native in (True, False):
        ds = CodeDataset(files, h.segment_size, h.code_hop_size,
                         h.sampling_rate, f0=False, seed=7)
        batch = next(ds.batches(2, shuffle=False, use_native=use_native))
        assert "f0" not in batch, f"use_native={use_native}"
        assert batch["code"].shape[0] == 2


def test_code_dataset_yaapt_fallback_native_matches_python(tmp_path):
    # records WITHOUT manifest f0 but f0=True -> YAAPT computed on the crop
    # on both paths (reference sr/dataset.py:280-289)
    import json as _json

    from dissc_tpu.data.code_dataset import CodeDataset, get_dataset_filelist

    root = str(tmp_path)
    rng = np.random.default_rng(3)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    records = []
    for i in range(2):
        n_frames = 12
        t = np.arange(n_frames * 320) / 16000.0
        wav = (0.4 * np.sin(2 * np.pi * 140.0 * t)).astype(np.float32)
        name = f"p1_{i:03d}.wav"
        write_wav(os.path.join(root, "wav", name), wav, 16000)
        records.append({"units": rng.integers(0, 100, n_frames).tolist(),
                        "audio": name})
    for split in ("train", "val"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            for r in records:
                f.write(_json.dumps(r) + "\n")
    h = _tiny_config(root)
    files, _ = get_dataset_filelist(h)
    ds_a = CodeDataset(files, h.segment_size, h.code_hop_size, h.sampling_rate,
                       f0=True, seed=7)
    ds_b = CodeDataset(files, h.segment_size, h.code_hop_size, h.sampling_rate,
                       f0=True, seed=7)
    bn = next(ds_a.batches(2, shuffle=False, use_native=True))
    bp = next(ds_b.batches(2, shuffle=False, use_native=False))
    assert bn["f0"].shape == bp["f0"].shape
    np.testing.assert_allclose(bn["f0"], bp["f0"], atol=1e-4)
    # the sine should be tracked as voiced around 140 Hz on at least some frames
    voiced = bn["f0"][bn["f0"] > 0]
    assert voiced.size > 0 and abs(np.median(voiced) - 140.0) < 20.0


def test_native_loader_reports_unreadable_files(tmp_path):
    from dissc_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native loader unavailable")
    good = str(tmp_path / "ok.wav")
    write_wav(good, np.zeros(1600, np.float32), 16000)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(IOError, match="failed to decode"):
        native_loader.load_crops([good, bad], [0, 0], 800)


def test_train_vocoder_checkpoints_and_resume(corpus, tmp_path):
    from dissc_tpu.train.checkpoints import scan_checkpoint
    from dissc_tpu.train.vocoder_trainer import train_vocoder

    h = _tiny_config(corpus)
    ckpt = str(tmp_path / "ckpt")
    state = train_vocoder(
        h, ckpt, training_steps=3, training_epochs=10,
        stdout_interval=1, checkpoint_interval=2, summary_interval=100,
        validation_interval=2, max_val_batches=1,
    )
    assert int(state.step) == 3
    assert scan_checkpoint(ckpt, "g_") is not None
    assert scan_checkpoint(ckpt, "do_") is not None
    assert os.path.exists(os.path.join(ckpt, "id_to_spkr.pkl"))

    # resume continues from the saved step
    state2 = train_vocoder(
        h, ckpt, training_steps=5, training_epochs=10,
        stdout_interval=1, checkpoint_interval=100, summary_interval=100,
        validation_interval=100, max_val_batches=1,
    )
    assert int(state2.step) == 5


def test_gan_step_bf16_discriminators_track_f32(corpus):
    """disc_compute_dtype='bfloat16' runs the D/G step with bf16 conv
    stacks (params and loss accumulation f32) and produces losses close
    to the f32 step at init."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dissc_tpu.train.vocoder_trainer import init_gan_state, make_gan_train_step

    rng = np.random.default_rng(0)
    res = {}
    for name, kw in (("f32", {}), ("bf16", {"disc_compute_dtype": "bfloat16"})):
        h = dataclasses.replace(_tiny_config(corpus), **kw)
        F = h.segment_size // h.code_hop_size
        state, gtx, dtx = init_gan_state(h, jax.random.key(0), F)
        step, _ = make_gan_train_step(h, gtx, dtx)
        batch = {
            "code": jnp.asarray(rng.integers(0, 100, (2, F)).astype(np.int32)),
            "f0": jnp.asarray(rng.normal(0, 1, (2, F, 1)).astype(np.float32)),
            "spkr": jnp.asarray(rng.integers(0, 2, (2, 1)).astype(np.int32)),
            "audio": jnp.asarray(
                (rng.standard_normal((2, h.segment_size)) * 0.3).astype(np.float32)),
        }
        new_state, metrics = step(state, batch)
        res[name] = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in res[name].values()), name
        # mixed precision contract: master params stay f32
        assert {str(x.dtype) for x in jax.tree.leaves(new_state.msd_params)} == {"float32"}
    for k in res["f32"]:
        a, b = res["f32"][k], res["bf16"][k]
        assert abs(a - b) <= 0.05 * abs(a) + 0.05, (k, a, b)


def test_validation_runs_when_val_split_smaller_than_batch(corpus, tmp_path):
    """Validation must not silently skip when len(val) < batch_size.

    The reference validates with batch_size=1 (sr/train.py:104-110);
    our trainer sizes the val batch to min(batch, len(val)) — a val
    split smaller than the train batch previously yielded zero batches
    and logged nothing.
    """
    import dataclasses

    from dissc_tpu.train.vocoder_trainer import train_vocoder

    h = dataclasses.replace(_tiny_config(corpus), batch_size=4)  # val has 2
    ckpt = str(tmp_path / "ckpt_vbs")
    train_vocoder(
        h, ckpt, training_steps=2, training_epochs=10,
        stdout_interval=10, checkpoint_interval=100, summary_interval=100,
        validation_interval=2, max_val_batches=2,
    )
    logged = open(os.path.join(ckpt, "logs", "metrics.jsonl")).read()
    assert "validation/mel_spec_error" in logged


def test_vocoder_inference_from_trained_checkpoint(corpus, tmp_path):
    import dataclasses
    import jax

    from dissc_tpu.infer.vocoder import run_inference
    from dissc_tpu.train.vocoder_trainer import train_vocoder

    h = _tiny_config(corpus)
    ckpt = str(tmp_path / "ckpt2")
    train_vocoder(h, ckpt, training_steps=1, training_epochs=10,
                  stdout_interval=10, checkpoint_interval=1,
                  summary_interval=100, validation_interval=100)
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(h), f)
    out_dir = str(tmp_path / "wavs")
    rtf = run_inference(
        checkpoint_file=ckpt,
        input_code_file=os.path.join(corpus, "val.txt"),
        output_dir=out_dir,
        data_path=os.path.join(corpus, "wav"),
        vc=True,
        target_speakers=["p2"],
        n=2,
    )
    gen = [f for f in os.listdir(out_dir) if f.endswith("_gen.wav")]
    gt = [f for f in os.listdir(out_dir) if f.endswith("_gt.wav")]
    assert len(gt) == 2
    # resynthesis + VC outputs for each of the 2 items
    assert len(gen) == 4
    assert rtf > 0
