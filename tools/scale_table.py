#!/usr/bin/env python
"""Emit SCALE_*.md measurement tables FROM the bench JSON artifacts.

VERDICT r6 "what's wrong #1": the round-6 artifact-refresh commit
hand-edited SCALE_r06.md and mechanically overwrote the 30x-seconds
column with the 10x-ratio values. Measurement tables must be generated
from the JSON they claim to summarize, never retyped. This tool reads
two (or three) bench artifacts (the ``{"queries": {name: sec}}`` shape
every ``bench.py`` run emits) and prints a GitHub-markdown table whose
ratio column is recomputed from the same rows it sits next to — a
self-consistent table by construction.

Usage:
  python tools/scale_table.py BASE.json SCALED.json \
      [--base-label "sf0.1 s"] [--scaled-label "sf1 s"] \
      [--queries a,b,c | --top N]

``--queries`` fixes the row set and order (e.g. the 30x spot-check
subset); ``--top N`` picks the N highest-ratio rows among queries
present in both artifacts. Exits non-zero if a requested query is
missing from either artifact — a silent blank would be hand-edit
drift all over again.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    qs = doc.get("queries")
    if not isinstance(qs, dict) or not qs:
        raise SystemExit(f"{path}: no 'queries' map — not a bench artifact")
    return {k: float(v) for k, v in qs.items()}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("base", help="baseline bench JSON (denominator)")
    ap.add_argument("scaled", help="scaled-run bench JSON (numerator)")
    ap.add_argument("--base-label", default="base s")
    ap.add_argument("--scaled-label", default="scaled s")
    ap.add_argument("--queries", default=None,
                    help="comma-separated row set, in order")
    ap.add_argument("--top", type=int, default=None,
                    help="emit the N highest-ratio common queries")
    ap.add_argument("--extra", default=None,
                    help="third bench JSON prepended as its own column")
    ap.add_argument("--extra-label", default="sf0.1 s")
    args = ap.parse_args(argv)

    base = load_queries(args.base)
    scaled = load_queries(args.scaled)
    extra = load_queries(args.extra) if args.extra else None

    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
        missing = [q for q in names
                   if q not in base or q not in scaled
                   or (extra is not None and q not in extra)]
        if missing:
            raise SystemExit(f"missing from an artifact: {missing}")
    else:
        names = sorted(
            (q for q in scaled if q in base
             and (extra is None or q in extra)),
            key=lambda q: scaled[q] / base[q],
            reverse=True,
        )
        if args.top:
            names = names[: args.top]

    cols = ["query"]
    if extra is not None:
        cols.append(args.extra_label)
    cols += [args.base_label, args.scaled_label,
             f"{args.scaled_label.split()[0]}/{args.base_label.split()[0]}"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for q in names:
        row = [q]
        if extra is not None:
            row.append(f"{extra[q]:.2f}")
        row += [f"{base[q]:.2f}", f"{scaled[q]:.2f}",
                f"{scaled[q] / base[q]:.2f}"]
        print("| " + " | ".join(row) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
