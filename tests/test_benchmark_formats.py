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


def test_spearman_constant_input_explicit_na(tmp_path):
    """A constant metric column must produce an explicit n/a row with a
    reason — NOT scipy's ConstantInputWarning + silent NaN (VERDICT r4 #7)."""
    import json
    import warnings

    from anuraxla.cli.spearman_analysis import analyze_grid, spearman_safe
    from anuraxla.pipeline.benchmark import write_summary

    # grid of 3 runs whose global metrics are IDENTICAL (constant y)
    for i, q in enumerate(("0.10", "0.20", "0.30")):
        d = tmp_path / f"qout_{q}"
        d.mkdir()
        write_summary(rows_fixture(), d / "summary.txt")
        (d / "config_snapshot.json").write_text(json.dumps({
            "q_out": float(q),
            "rk_per_species": {"Aa": 1.0 + 0.1 * i, "Bb": 2.0},  # Bb: constant rk
        }))

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning (incl. scipy's) fails
        rows = analyze_grid(tmp_path, log=lambda *a, **k: None)

    by_key = {(r["scope"], r["species"], r["x"], r["y"]): r for r in rows}
    g_acc = by_key[("GLOBAL", "", "q_out", "ACC_global")]
    assert g_acc["rho"] != g_acc["rho"]  # NaN
    assert "constant input" in g_acc["note"]
    # constant rk for Bb -> per-class rk correlations are n/a with reason
    bb = by_key[("PER_CLASS", "Bb", "rk", "ACC")]
    assert bb["rho"] != bb["rho"] and "constant input" in bb["note"]
    # varying rk for Aa vs constant acc -> still n/a (y constant), with reason
    aa = by_key[("PER_CLASS", "Aa", "rk", "ACC")]
    assert "constant input" in aa["note"]
    # q_out vs rk for Aa is well-defined: monotone increasing -> rho == 1
    aq = by_key[("PER_CLASS", "Aa", "q_out", "rk")]
    assert aq["note"] == "" and abs(aq["rho"] - 1.0) < 1e-9

    # the CSV carries the note column
    import csv as _csv

    with open(tmp_path / "spearman_table.csv") as f:
        crows = list(_csv.DictReader(f))
    assert "note" in crows[0]

    # direct unit check of the guard
    rho, p, note = spearman_safe([1.0, 1.0, 1.0], [1.0, 2.0, 3.0])
    assert rho != rho and "constant input (x)" in note
