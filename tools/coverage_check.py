"""Docs-consistency gate: every registered harness query id must appear
in COVERAGE.md (the judge-facing operator map), and every qNN mentioned
there must exist in the registry — so the map can't silently drift from
the code.

Usage: python tools/coverage_check.py   (exit 1 on drift)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from gfw_pixetl_spark import harness

    registered = {name.split("_")[0] for name in harness.QUERIES}
    text = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    # \b fails before '_' (q01_pricing_summary), so anchor on the digits
    mentioned = {f"q{m}" for m in re.findall(r"\bq(\d{2,3})(?!\d)", text)}
    missing = sorted(registered - mentioned, key=lambda q: int(q[1:]))
    stale = sorted(mentioned - registered, key=lambda q: int(q[1:]))
    ok = True
    if missing:
        ok = False
        print(f"NOT IN COVERAGE.md: {', '.join(missing)}")
    if stale:
        ok = False
        print(f"STALE IN COVERAGE.md (no such query): {', '.join(stale)}")
    if ok:
        print(f"coverage map consistent: {len(registered)} queries all mapped")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
