"""JSON/config persistence and project-root discovery.

Parity targets: ``map_detector_core.py:48-89`` (find_project_root,
load_json/save_json) and the ``.bak`` backup behavior of the fit scripts
(``08_fit_radial_detector.py:585-587``).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict


def find_project_root(start: Path) -> Path:
    """Walk up from ``start`` to find the project root.

    The reference looks for ``downloaded_models/`` + ``latent_space_exploration/``
    (``map_detector_core.py:48-54``). We accept those markers or our own
    (``config.json`` next to a ``models/`` or ``anuraxla`` dir) so the same
    tree layout keeps working.
    """
    cur = Path(start).resolve()
    for _ in range(15):
        if (cur / "downloaded_models").exists() and (cur / "latent_space_exploration").exists():
            return cur
        if (cur / "config.json").exists() and (
            (cur / "models").exists() or (cur / "anuraxla").exists() or (cur / "latent_space_exploration").exists()
        ):
            return cur
        if cur.parent == cur:
            break
        cur = cur.parent
    return Path(start).resolve()


def load_json(path: Path) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        obj = json.load(f)
    if not isinstance(obj, dict):
        raise ValueError(f"JSON at {path} is not an object/dict.")
    return obj


def save_json(path: Path, obj: Dict[str, Any]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=2, ensure_ascii=False)


def save_json_with_backup(path: Path, obj: Dict[str, Any]) -> Path:
    """Write ``obj`` to ``path``, first copying any existing file to
    ``<path>.bak`` (reference behavior before every config overwrite)."""
    path = Path(path)
    backup = path.with_suffix(path.suffix + ".bak")
    if path.exists():
        shutil.copy2(path, backup)
    save_json(path, obj)
    return backup


def resolve_root_dir(root_arg: str, project_root: Path) -> Path:
    """Robust --root resolution (``08_fit_radial_detector.py:405-426``):
    absolute as-is, else try CWD, project root, project_root/latent_space_exploration.
    """
    root_in = Path(root_arg).expanduser()
    if root_in.is_absolute():
        candidates = [root_in]
    else:
        candidates = [
            Path.cwd() / root_in,
            project_root / root_in,
            project_root / "latent_space_exploration" / root_in,
        ]
    for cand in candidates:
        cand = cand.resolve()
        if cand.exists() and cand.is_dir():
            return cand
    tried = "\n".join(f"   - {c.resolve()}" for c in candidates)
    raise SystemExit(f"❌ chunks dir not found. Tried:\n{tried}")
