"""Artifact-format goldens: summary.txt byte layout (regex-parsed downstream),
results.csv columns, and metric aggregation including ERROR-row exclusion."""

import csv

from anuraxla.pipeline.benchmark import summarize_rows, write_results_csv, write_summary


def rows_fixture():
    mk = lambda sp, pred, d: {  # noqa: E731
        "file": f"/x/{sp}/{d}.wav",
        "true_species": sp,
        "pred_species": pred,
        "detected": pred not in ("NO_DETECT", "ERROR"),
        "correct": pred == sp,
        "best_distance": 1.0,
    }
    return [
        mk("Aa", "Aa", 0), mk("Aa", "Aa", 1), mk("Aa", "NO_DETECT", 2), mk("Aa", "Bb", 3),
        mk("Bb", "Bb", 0), mk("Bb", "NO_DETECT", 1),
    ]


def test_summary_exact_format(tmp_path):
    p = tmp_path / "summary.txt"
    write_summary(rows_fixture(), p)
    text = p.read_text()
    lines = text.splitlines()
    assert lines[0] == "=== Detection Benchmark Summary ==="
    assert lines[1] == "Total files: 6"
    assert lines[2] == "Correct: 3  | Accuracy: 50.00%"
    assert lines[3] == "NO_DETECT: 2 | Rate: 33.33%"
    assert lines[4] == ""
    assert lines[5] == "=== Per-class ==="
    # per-class sorted by accuracy desc, fixed-width fields
    assert lines[6] == "- Aa                              n=   4  acc= 50.00%  no_detect= 25.00%"
    assert lines[7] == "- Bb                              n=   2  acc= 50.00%  no_detect= 50.00%"

    # and it parses with the downstream regexes
    from anuraxla.cli.spearman_analysis import parse_summary

    acc_g, nd_g, acc_sp, nd_sp = parse_summary(p)
    assert acc_g == 0.5 and abs(nd_g - 1 / 3) < 1e-4
    assert acc_sp == {"Aa": 0.5, "Bb": 0.5}
    assert nd_sp == {"Aa": 0.25, "Bb": 0.5}

    # MAP header variant
    write_summary(rows_fixture(), p, map_variant=True)
    assert p.read_text().splitlines()[0] == "=== Detection Benchmark Summary (MAP) ==="


def test_error_rows_excluded_from_metrics():
    rows = rows_fixture() + [{
        "file": "/x/Aa/bad.wav", "true_species": "Aa", "pred_species": "ERROR",
        "detected": False, "correct": False, "best_distance": float("nan"),
        "error": "boom",
    }]
    res = summarize_rows(rows)
    assert res.total == 6  # ERROR row not counted
    assert res.accuracy == 0.5


def test_results_csv_columns(tmp_path):
    rows = rows_fixture()
    p = tmp_path / "results.csv"
    write_results_csv(rows, p, "best_distance")
    with open(p) as f:
        r = list(csv.DictReader(f))
    assert list(r[0].keys()) == ["file", "true_species", "pred_species", "detected", "correct", "best_distance"]
    assert len(r) == 6

    rows.append({
        "file": "x", "true_species": "Aa", "pred_species": "ERROR",
        "detected": False, "correct": False, "best_distance": float("nan"), "error": "E",
    })
    write_results_csv(rows, p, "best_distance")
    with open(p) as f:
        r = list(csv.DictReader(f))
    assert "error" in r[0]  # error column appears when any row failed
