"""``spearman-analysis`` — Spearman correlations over a q_out grid
(reference ``9100_spearman_rk_analysis.py``): parses each run dir's
summary.txt + config_snapshot.json, correlates q_out vs global ACC/NO_DETECT
and, per species, rk vs acc / rk vs no_detect / q_out vs rk; writes
spearman_table.csv into the grid dir.
"""

from __future__ import annotations

import argparse
import csv
import json
import re
from pathlib import Path
from typing import Dict, List, Tuple

SUMMARY_GLOBAL_RE = re.compile(r"Correct:\s*\d+\s*\|\s*Accuracy:\s*([0-9.]+)%")
SUMMARY_NODET_RE = re.compile(r"NO_DETECT:\s*\d+\s*\|\s*Rate:\s*([0-9.]+)%")
SUMMARY_CLASS_RE = re.compile(
    r"^\-\s*(?P<sp>.+?)\s+n=\s*(?P<n>\d+)\s+acc=\s*(?P<acc>[0-9.]+)%\s+no_detect=\s*(?P<nd>[0-9.]+)%",
    re.IGNORECASE,
)


def parse_summary(path: Path) -> Tuple[float, float, Dict[str, float], Dict[str, float]]:
    acc_g = nd_g = None
    acc_sp: Dict[str, float] = {}
    nd_sp: Dict[str, float] = {}
    for line in path.read_text(encoding="utf-8", errors="replace").splitlines():
        if m := SUMMARY_GLOBAL_RE.search(line):
            acc_g = float(m.group(1)) / 100.0
        if m := SUMMARY_NODET_RE.search(line):
            nd_g = float(m.group(1)) / 100.0
        if m := SUMMARY_CLASS_RE.match(line.strip()):
            acc_sp[m.group("sp").strip()] = float(m.group("acc")) / 100.0
            nd_sp[m.group("sp").strip()] = float(m.group("nd")) / 100.0
    if acc_g is None or nd_g is None:
        raise RuntimeError(f"could not parse global ACC/NO_DETECT from {path}")
    return acc_g, nd_g, acc_sp, nd_sp


def spearman_safe(x: List[float], y: List[float]) -> Tuple[float, float]:
    if len(x) < 3 or len(y) < 3:
        return float("nan"), float("nan")
    try:
        from scipy.stats import spearmanr

        rho, p = spearmanr(x, y)
        return (
            float(rho) if rho is not None else float("nan"),
            float(p) if p is not None else float("nan"),
        )
    except Exception:
        return float("nan"), float("nan")


def analyze_grid(grid_dir: Path, log=print) -> List[dict]:
    run_dirs = sorted(d for d in grid_dir.iterdir() if d.is_dir() and d.name.startswith("qout_"))
    if not run_dirs:
        raise RuntimeError(f"no qout_* dirs in {grid_dir}")

    records = []
    for d in run_dirs:
        summary, snap = d / "summary.txt", d / "config_snapshot.json"
        if not summary.exists() or not snap.exists():
            log(f"⚠️ skipping {d.name} (missing summary/snapshot)")
            continue
        acc_g, nd_g, acc_sp, nd_sp = parse_summary(summary)
        s = json.loads(snap.read_text())
        records.append({
            "q_out": float(s["q_out"]),
            "acc_g": acc_g, "nd_g": nd_g,
            "acc_sp": acc_sp, "nd_sp": nd_sp,
            "rk": {k: float(v) for k, v in (s.get("rk_per_species") or {}).items()},
        })
    if not records:
        raise RuntimeError("no parsable runs")
    records.sort(key=lambda r: r["q_out"])

    qouts = [r["q_out"] for r in records]
    rho_nd, p_nd = spearman_safe(qouts, [r["nd_g"] for r in records])
    rho_acc, p_acc = spearman_safe(qouts, [r["acc_g"] for r in records])
    log("\n📊 SPEARMAN CORRELATIONS")
    log(f"GLOBAL corr(q_out, NO_DETECT) = {rho_nd: .3f} (p={p_nd: .4f})")
    log(f"GLOBAL corr(q_out, ACC)       = {rho_acc: .3f} (p={p_acc: .4f})")

    rows = [
        {"scope": "GLOBAL", "species": "", "x": "q_out", "y": "NO_DETECT_global",
         "rho": rho_nd, "p": p_nd, "n_points": len(qouts)},
        {"scope": "GLOBAL", "species": "", "x": "q_out", "y": "ACC_global",
         "rho": rho_acc, "p": p_acc, "n_points": len(qouts)},
    ]

    species = sorted({sp for r in records for sp in r["rk"]} | {sp for r in records for sp in r["acc_sp"]})
    for sp in species:
        xs, ya, yn, xq = [], [], [], []
        for r in records:
            if sp in r["rk"] and sp in r["acc_sp"] and sp in r["nd_sp"]:
                xs.append(r["rk"][sp])
                ya.append(r["acc_sp"][sp])
                yn.append(r["nd_sp"][sp])
                xq.append(r["q_out"])
        if len(xs) < 3:
            log(f"- {sp}: insufficient points (n={len(xs)})")
            continue
        for x, y, xn, yn_name, vals in [
            (xs, ya, "rk", "ACC", None),
            (xs, yn, "rk", "NO_DETECT", None),
            (xq, xs, "q_out", "rk", None),
        ]:
            rho, p = spearman_safe(x, y)
            rows.append({"scope": "PER_CLASS", "species": sp, "x": xn, "y": yn_name,
                         "rho": rho, "p": p, "n_points": len(x)})
        log(f"- {sp}: corr(rk,ACC)={rows[-3]['rho']: .3f} corr(rk,ND)={rows[-2]['rho']: .3f} corr(q,rk)={rows[-1]['rho']: .3f}")

    out_csv = grid_dir / "spearman_table.csv"
    with open(out_csv, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=["scope", "species", "x", "y", "rho", "p", "n_points"])
        w.writeheader()
        w.writerows(rows)
    log(f"\n✅ table: {out_csv}")
    return rows


def _latest_grid_dir() -> Path | None:
    """Default like the reference's dated-dir convention: the newest
    outputs/qout_grid_* under the project root."""
    from anuraxla.utils.io import find_project_root

    root = find_project_root(Path.cwd())
    cands = sorted((root / "outputs").glob("qout_grid_*")) if (root / "outputs").exists() else []
    return cands[-1] if cands else None


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid-dir", type=str, default=None,
                   help="default: newest outputs/qout_grid_* under the project root")
    args = p.parse_args()
    grid_dir = Path(args.grid_dir).expanduser().resolve() if args.grid_dir else _latest_grid_dir()
    if grid_dir is None or not grid_dir.exists():
        raise SystemExit(f"❌ grid dir not found: {grid_dir or '(no outputs/qout_grid_* found)'}")
    analyze_grid(grid_dir)


if __name__ == "__main__":
    main()
