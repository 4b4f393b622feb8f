"""Compare two bench JSON lines (BENCH_r{N}.json or bench.py output)
per query: deltas, regressions, and additions — so a round-over-round
slowdown is visible immediately instead of hiding inside the total.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
Exit 0 always (informational); prints regressions sorted by ratio.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load(path: str) -> dict:
    """Accept both shapes: an indented BENCH_DETAIL*.json document, or a
    driver log whose LAST line is the compact bench JSON."""
    raw = Path(path).read_text().strip()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return json.loads(raw.splitlines()[-1])


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag queries slower than old * threshold")
    args = ap.parse_args(argv)
    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"total: {old.get('value')} -> {new.get('value')} "
          f"({len(oq)} -> {len(nq)} queries)")
    regressions, improved = [], []
    for name, t_new in sorted(nq.items()):
        t_old = oq.get(name)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        ratio = t_new / t_old
        if ratio >= args.threshold:
            regressions.append((ratio, name, t_old, t_new))
        elif ratio <= 1 / args.threshold:
            improved.append((ratio, name, t_old, t_new))
    for ratio, name, t_old, t_new in sorted(regressions, reverse=True):
        print(f"SLOWER {name}: {t_old:.2f}s -> {t_new:.2f}s ({ratio:.1f}x)")
    for ratio, name, t_old, t_new in sorted(improved):
        print(f"faster {name}: {t_old:.2f}s -> {t_new:.2f}s ({ratio:.2f}x)")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
