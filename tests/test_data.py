"""Data-contract tests: JSONL, stats pickles, splits, padded datasets."""
import json
import pickle

import numpy as np

from dissc_tpu.data import (
    calculate_pitch_stats,
    data_split,
    get_spkrs_dict,
    load_f0_stats,
    load_id_to_spkr,
    prep_stats_arrays,
    read_unit_records,
    save_id_to_spkr,
)
from dissc_tpu.data.datasets import LenDataset, PitchDataset, batch_iterator


def _write_jsonl(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _toy_records():
    return [
        {"units": [1, 1, 2, 3, 3, 3], "f0": [0.0, 120.0, 130.0, 0.0, 140.0, 150.0], "audio": "p1_001.wav"},
        {"units": [4, 4, 4, 5], "f0": [200.0, 210.0, 0.0, 220.0], "audio": "p2_001.wav"},
        {"units": [1, 2], "f0": [100.0, 0.0], "audio": "p1_002.wav"},
    ]


def test_jsonl_roundtrip(tmp_path):
    p = str(tmp_path / "data.txt")
    _write_jsonl(p, _toy_records())
    recs = read_unit_records(p)
    assert len(recs) == 3
    assert recs[0]["units"] == [1, 1, 2, 3, 3, 3]


def test_spkr_dict_ordering(tmp_path):
    p = str(tmp_path / "data.txt")
    _write_jsonl(p, _toy_records())
    d = get_spkrs_dict(p)
    assert d == {"p1": 0, "p2": 1}


def test_id_to_spkr_pickle_compat(tmp_path):
    p = str(tmp_path / "id_to_spkr.pkl")
    save_id_to_spkr(p, ["p1", "p2"])
    # the on-disk format must be a plain list (reference sr/train.py:107-108)
    with open(p, "rb") as f:
        assert pickle.load(f) == ["p1", "p2"]
    assert load_id_to_spkr(p) == {"p1": 0, "p2": 1}


def test_pitch_stats_voiced_only(tmp_path):
    p = str(tmp_path / "data.txt")
    out = str(tmp_path / "f0_stats.pkl")
    _write_jsonl(p, _toy_records())
    calculate_pitch_stats(p, out)
    stats = load_f0_stats(out)
    v = np.array([120.0, 130.0, 140.0, 150.0, 100.0])  # voiced frames of p1
    assert np.isclose(stats["p1"]["mean"], v.mean())
    assert np.isclose(stats["p1"]["std"], v.std())
    id2mean, id2std = prep_stats_arrays({"p1": 0, "p2": 1}, stats)
    assert np.isclose(id2mean[0], v.mean())


def test_paired_val_split(tmp_path):
    p = str(tmp_path / "all.txt")
    recs = [
        {"units": [1], "f0": [0.0], "audio": "p1_010.wav"},
        {"units": [2], "f0": [0.0], "audio": "p1_025.wav"},
        {"units": [3], "f0": [0.0], "audio": "p2_024.wav"},
    ]
    _write_jsonl(p, recs)
    train_p, val_p = data_split(p, split_method="paired_val")
    train = read_unit_records(str(train_p))
    val = read_unit_records(str(val_p))
    # utterance number <= 24 -> val (reference data/data_utils.py:19-28)
    assert [r["audio"] for r in val] == ["p1_010.wav", "p2_024.wav"]
    assert [r["audio"] for r in train] == ["p1_025.wav"]


def test_len_dataset_padding(tmp_path):
    p = str(tmp_path / "data.txt")
    _write_jsonl(p, _toy_records())
    ds = LenDataset.from_file(p, {"p1": 0, "p2": 1})
    assert ds.vals.shape == (3, 3)  # longest deduped seq has 3 runs
    np.testing.assert_array_equal(ds.vals[0], [1, 2, 3])
    np.testing.assert_array_equal(ds.lens[0], [2, 1, 3])
    np.testing.assert_array_equal(ds.vals[2], [1, 2, 100])  # pad = n_tokens
    np.testing.assert_array_equal(ds.lens[2], [1, 1, -1])  # pad = -1
    assert ds.spk_ids.tolist() == [[0], [1], [0]]
    mean, std = ds.train_norm_stats()
    all_lens = np.array([2, 1, 3, 3, 1, 1, 1], float)
    assert np.isclose(mean, all_lens.mean())
    assert np.isclose(std, all_lens.std(), atol=1e-4)


def test_pitch_dataset_whitening(tmp_path):
    p = str(tmp_path / "data.txt")
    _write_jsonl(p, _toy_records())
    stats = {"p1": {"mean": 100.0, "std": 10.0}, "p2": {"mean": 200.0, "std": 20.0}}
    ds = PitchDataset.from_file(p, {"p1": 0, "p2": 1}, stats)
    # voiced frames whitened, unvoiced (0) untouched, pads = -100
    assert ds.fs[0][0] == 0.0
    assert np.isclose(ds.fs[0][1], (120.0 - 100.0) / 10.0)
    assert ds.fs[1][-2] == -100.0 or ds.fs.shape[1] == 6
    assert np.all(ds.fs[1][4:] == -100.0)
    ds_raw = PitchDataset.from_file(p, {"p1": 0, "p2": 1}, None, normalise_pitch=False)
    assert ds_raw.fs[0][1] == 120.0


def test_batch_iterator_fixed_shape(tmp_path):
    xs = np.arange(10).reshape(5, 2)
    ys = np.arange(5)
    batches = list(
        batch_iterator((xs, ys), batch_size=2, shuffle=False, pad_row_values=(-1, -1))
    )
    assert len(batches) == 3
    for bx, by in batches:
        assert bx.shape == (2, 2) and by.shape == (2,)
    assert batches[-1][0][1].tolist() == [-1, -1]  # padded row
