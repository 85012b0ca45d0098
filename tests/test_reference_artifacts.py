"""Load the reference's real bundled artifacts through our data layer.

These are data files (speaker tables + f0 statistics pickles) shipped in
the reference repo — loading them validates pickle-format interop with
artifacts we didn't write.  Skipped when the reference isn't mounted.
"""
import os

import numpy as np
import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.mark.parametrize("dataset,n_speakers", [("VCTK", 108), ("ESD", 10),
                                                ("Syn_VCTK", 108)])
def test_reference_id_to_spkr_loads(dataset, n_speakers):
    from dissc_tpu.data.stats import load_id_to_spkr

    d = load_id_to_spkr(f"{REF}/{dataset}/hubert100/id_to_spkr.pkl")
    assert len(d) == n_speakers
    assert all(isinstance(k, str) and isinstance(v, int) for k, v in d.items())
    assert sorted(d.values()) == list(range(n_speakers))


@pytest.mark.parametrize("dataset", ["VCTK", "ESD", "Syn_VCTK"])
def test_reference_f0_stats_load_and_pack(dataset):
    from dissc_tpu.data.stats import load_f0_stats, load_id_to_spkr, prep_stats_arrays

    spk = load_id_to_spkr(f"{REF}/{dataset}/hubert100/id_to_spkr.pkl")
    stats = load_f0_stats(f"{REF}/{dataset}/hubert100/f0_stats.pkl")
    # every known speaker has voiced-frame stats in a plausible range
    common = [s for s in spk if s in stats]
    assert len(common) >= len(spk) - 2
    id2mean, id2std = prep_stats_arrays({s: spk[s] for s in common},
                                        stats)
    means = id2mean[np.asarray([spk[s] for s in common]) < len(common)]
    assert np.all((id2mean > 50) & (id2mean < 400))
    assert np.all(id2std > 0)


def test_reference_unseen_wavs_through_pipeline():
    """The two bundled unseen wavs run through our wav reader + F0 tracker."""
    from dissc_tpu.audio.yaapt import yaapt_f0
    from dissc_tpu.core.wav import read_wav

    path = f"{REF}/unseen/wav_orig/s1_1.wav"
    if not os.path.isfile(path):
        pytest.skip("wav not present")
    wav, sr = read_wav(path, dtype="float32")
    assert sr in (16000, 22050, 44100, 48000)
    assert len(wav) > 1000
    if sr != 16000:
        from dissc_tpu.audio.resample import resample_poly_np

        wav = resample_poly_np(wav, sr, 16000)
    f0 = yaapt_f0(np.asarray(wav[: 16000 * 3]), 16000)
    voiced = f0[f0 > 0]
    assert voiced.size > 10
    assert 50 < np.median(voiced) < 400  # human speech range
