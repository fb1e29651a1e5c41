"""config.json schema layer: round-trips, validation errors, fallback chains
(the behaviors the reference hardcodes in map_detector_core.py:326-421 and the
fit/eval scripts)."""

import json
import numpy as np
import pytest

from anuraxla.config import (
    get_chunk_seconds,
    priority_ranks,
    read_map,
    read_radial,
    require_species,
    write_map,
    write_radial,
)
from anuraxla.constants import PRIORITY_ORDER, DEFAULT_MEL


def test_require_species_and_chunk_seconds():
    assert require_species({"species": ["a", "b"]}) == ["a", "b"]
    with pytest.raises(SystemExit):
        require_species({"species": "nope"})
    assert get_chunk_seconds({"chunk_seconds": 3}) == 3.0
    assert get_chunk_seconds({"chunk_seconds": "bad"}) == 5.0
    assert get_chunk_seconds({}) == 5.0


def test_priority_ranks_known_and_unknown():
    sp = [PRIORITY_ORDER[2], "Zzz_new", PRIORITY_ORDER[0], "Aaa_new"]
    r = priority_ranks(sp)
    # known species keep their priority positions
    assert r[0] == 2.0 and r[2] == 0.0
    # unknown species ranked after, lexicographically: Aaa before Zzz
    assert r[3] < r[1]
    assert min(r[1], r[3]) >= len(PRIORITY_ORDER)


def test_radial_roundtrip_and_backup(tmp_path, rng):
    cfg_path = tmp_path / "config.json"
    cfg = {"species": ["a", "b"], "chunk_seconds": 2.0, "keep_me": 42}
    cfg_path.write_text(json.dumps(cfg))

    K, D = 2, 4
    centroids = rng.standard_normal((K, D)).astype(np.float32)
    rk = np.array([1.0, 2.0], np.float32)
    write_radial(
        cfg_path, cfg, ["a", "b"], centroids, rk,
        chunks_dir=tmp_path, mel=DEFAULT_MEL.replace(duration=2.0),
        q_in=0.9, q_out=0.1, max_per_class=0, seed=1,
        per_species_meta={"a": {}, "b": {}},
    )
    assert (tmp_path / "config.json.bak").exists()
    loaded = json.loads(cfg_path.read_text())
    assert loaded["keep_me"] == 42  # unrelated keys preserved

    species, c2, t2, cs = read_radial(loaded)
    assert species == ["a", "b"] and cs == 2.0
    np.testing.assert_allclose(c2, centroids, atol=1e-6)
    np.testing.assert_allclose(t2, rk)


def test_read_radial_errors_and_dim_mismatch():
    with pytest.raises(ValueError, match="radial_detector"):
        read_radial({})
    with pytest.raises(ValueError, match="centroids"):
        read_radial({"radial_detector": {"centroids": []}})
    # species with a mismatched latent dim are dropped (09:421 semantics)
    cfg = {
        "radial_detector": {
            "centroids": {"a": [1.0, 2.0], "b": [1.0, 2.0], "c": [1.0]},
            "thresholds": {"a": 1.0, "b": 1.0, "c": 1.0},
        }
    }
    species, c, t, _ = read_radial(cfg)
    assert species == ["a", "b"]


def test_map_roundtrip_priors_and_tau(tmp_path, rng):
    cfg_path = tmp_path / "config.json"
    cfg = {"species": ["a", "b"], "chunk_seconds": 4.0}
    cfg_path.write_text(json.dumps(cfg))

    K, D = 2, 3
    means = rng.standard_normal((K, D)).astype(np.float32)
    covs = np.stack([np.eye(D, dtype=np.float32)] * K)
    precs = covs.copy()
    lds = np.zeros(K, np.float32)
    priors = np.array([0.75, 0.25], np.float32)
    write_map(
        cfg_path, cfg, ["a", "b"], means, covs, precs, lds, priors, tau=-10.0,
        cov_type="qda", cov_structure="full", priors_mode="empirical",
        chunks_dir=tmp_path, mel=DEFAULT_MEL.replace(duration=4.0),
        max_per_class=0, seed=1, eps=1e-6, shrink=0.0, tau_q=0.05,
        score_true_global_summary={},
        per_species_meta={"a": {"prior": 0.75}, "b": {"prior": 0.25}},
    )
    loaded = json.loads(cfg_path.read_text())
    species, m2, p2, l2, pr2, tau, cs = read_map(loaded)
    assert species == ["a", "b"]
    assert tau == -10.0
    assert cs == 4.0  # from map meta_fit chunk_seconds
    np.testing.assert_allclose(pr2, priors, atol=1e-6)

    # missing per-species priors -> uniform fallback (core:326-355)
    del loaded["map_detector"]["meta_fit"]["per_species"]["b"]["prior"]
    _, _, _, _, pr3, _, _ = read_map(loaded)
    np.testing.assert_allclose(pr3, [0.5, 0.5])

    # negative priors clamped then renormalized
    loaded["map_detector"]["meta_fit"]["per_species"]["a"]["prior"] = -1.0
    loaded["map_detector"]["meta_fit"]["per_species"]["b"]["prior"] = 0.5
    _, _, _, _, pr4, _, _ = read_map(loaded)
    np.testing.assert_allclose(pr4, [0.0, 1.0])


def test_read_map_errors():
    with pytest.raises(ValueError, match="map_detector"):
        read_map({})
    with pytest.raises(ValueError, match="model"):
        read_map({"map_detector": {"model": "other"}})
    with pytest.raises(ValueError, match="means"):
        read_map({"map_detector": {"model": "gaussian_map"}})


def test_read_map_majority_dim_and_ragged_precision():
    """One truncated/malformed species must not discard the healthy majority
    (read_radial semantics), and ragged precision lists are skipped, not a
    numpy crash."""
    eye2 = [[1.0, 0.0], [0.0, 1.0]]
    md = {
        "model": "gaussian_map",
        # 'Aaa' sorts first but is truncated to D=1; 'Bbb'/'Ccc' are healthy
        "means": {"Aaa": [1.0], "Bbb": [0.0, 1.0], "Ccc": [2.0, 3.0]},
        "precision": {"Aaa": [[1.0]], "Bbb": eye2, "Ccc": [[1.0, 0.0], [0.0]]},
        "logdet_cov": {"Aaa": 0.0, "Bbb": 0.0, "Ccc": 0.0},
    }
    species, means, precs, lds, priors, tau, cs = read_map({"map_detector": md})
    # majority dimension is 2; Aaa (wrong D) and Ccc (ragged precision) skipped
    assert species == ["Bbb"]
    assert means.shape == (1, 2) and precs.shape == (1, 2, 2)

    # nothing consistent at all -> clear error, not an empty-array crash
    md_bad = {
        "model": "gaussian_map",
        "means": {"Aaa": [1.0], "Bbb": [2.0]},
        "precision": {"Aaa": [[1.0, 0.0]], "Bbb": "nope"},
        "logdet_cov": {"Aaa": 0.0, "Bbb": 0.0},
    }
    with pytest.raises(ValueError, match="consistent"):
        read_map({"map_detector": md_bad})
