"""make-synth-data --soundscape: the reproducible long-recording generator
behind the scan/robustness baselines (BASELINE.md r3/r4 scan rows)."""

import numpy as np

from anuraxla.cli.make_synth_data import make_soundscape, synth_call, _parse_plant
from anuraxla.utils.wavio import read_wav


def test_soundscape_plants_and_snr(tmp_path):
    sr = 16000
    out = tmp_path / "rec.wav"
    used = make_soundscape(
        out, sr=sr, minutes=0.5, plants=[(0, 8.0), (2, 20.0)],
        call_seconds=4.0, snr_db=14.0, seed=1,
    )
    assert used == [(0, 8.0), (2, 20.0)]
    y, got_sr = read_wav(out)
    assert got_sr == sr and y.shape[0] == sr * 30

    # noise sigma honors the requested SNR vs the call's RMS (quiet region)
    probe = synth_call(np.random.default_rng(3), sr, 4.0, 400.0, 4.0)
    rms_call = float(np.sqrt(np.mean(probe**2)))
    rms_noise = float(np.sqrt(np.mean(y[: 6 * sr] ** 2)))
    snr = 20.0 * np.log10(rms_call / rms_noise)
    assert abs(snr - 14.0) < 0.5  # PCM16 quantization + sampling noise

    # the planted extents carry visibly more energy than the bed
    e_call = float(np.mean(y[8 * sr : 12 * sr] ** 2))
    assert e_call > 3.0 * rms_noise**2

    # and the species-0 plant is the same fixed-seed call the detector
    # tests train against (bed + call superposition, PCM16-rounded)
    seg = y[8 * sr : 12 * sr]
    corr = float(np.dot(seg, probe) / (np.linalg.norm(seg) * np.linalg.norm(probe)))
    assert corr > 0.8


def test_soundscape_clean_bed_default(tmp_path):
    sr = 16000
    out = tmp_path / "rec.wav"
    make_soundscape(out, sr=sr, minutes=0.25, plants=[(1, 5.0)], seed=2)
    y, _ = read_wav(out)
    rms_bed = float(np.sqrt(np.mean(y[: 4 * sr] ** 2)))
    assert rms_bed < 0.002  # faint 0.001-sigma bed


def test_soundscape_rejects_out_of_range_plant(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="outside"):
        make_soundscape(tmp_path / "r.wav", sr=8000, minutes=0.1,
                        plants=[(0, 500.0)])


def test_plant_arg_parser():
    assert _parse_plant("3@614.5") == (3, 614.5)
