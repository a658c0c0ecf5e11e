"""dist/fusus_spark.zip freshness guard.

The zip is what executors import under spark-submit --py-files (and
BENCH/localcluster.py's addPyFile); a stale zip fails at TASK time with
ModuleNotFoundError or signature drift — this guard fails at TEST time
instead, with the fix in the message.
"""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_dist_zip_matches_sources():
    zip_path = REPO / "dist" / "fusus_spark.zip"
    assert zip_path.exists(), "missing dist/fusus_spark.zip — run tools/package.sh"
    zf = zipfile.ZipFile(zip_path)
    entries = {n for n in zf.namelist() if n.endswith(".py")}
    stale = []
    for src in sorted((REPO / "fusus_spark").rglob("*.py")):
        rel = src.relative_to(REPO).as_posix()
        if rel not in entries:
            stale.append(f"missing from zip: {rel}")
        elif zf.read(rel) != src.read_bytes():
            stale.append(f"outdated in zip: {rel}")
    extra = entries - {
        s.relative_to(REPO).as_posix() for s in (REPO / "fusus_spark").rglob("*.py")
    }
    stale.extend(f"orphan in zip: {e}" for e in sorted(extra))
    assert not stale, "dist zip is stale — run tools/package.sh:\n" + "\n".join(stale)
