"""Cross-artifact bench comparison: per-query deltas between two bench
JSON records, tolerant of the driver's length-bounded capture format.

    python scripts/bench_compare.py OLD.json NEW.json [--top N]

Accepts either a full bench line ({"metric": ..., "queries": {...}})
or a driver capture ({"tail": "<truncated JSON line>"}) — the tail is
recovered by regex, so partially-visible runs still compare on their
visible suffix. Prints the common-query totals, the ratio, and the
biggest per-query movers. No Spark session; pure JSON math.

Interpretation discipline (see README "Benchmark" + bench.py module
docstring): this VM is burst-credit throttled, so a uniform +0.05-0.4s
drift across many queries means the slower RUN was hotter, not that
plans regressed — plan regressions are caught by tests/test_plans.py
and show up as isolated multi-x jumps instead.
"""

from __future__ import annotations

import argparse
import json
import re

_PAIR = re.compile(r'"([a-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)')
_NON_QUERY = {"value", "sf"}


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read().strip()
    try:
        # driver records are pretty-printed multi-line JSON
        doc = json.loads(text)
    except json.JSONDecodeError:
        # bench.py output may share a file with stderr noise: the
        # JSON line is the last line
        doc = json.loads(text.splitlines()[-1])
    if isinstance(doc.get("queries"), dict):
        return {
            k: float(v)
            for k, v in doc["queries"].items()
            if isinstance(v, (int, float))
        }
    tail = doc.get("tail", "")
    pairs = _PAIR.findall(tail)
    # digit-only keys are sentinel_probes positions, not queries
    return {
        k: float(v)
        for k, v in pairs
        if k not in _NON_QUERY and not k.isdigit()
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--top", type=int, default=6)
    args = p.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(
        f"common: {len(common)}  old={t_old:.1f}s  new={t_new:.1f}s  "
        f"ratio={t_new / t_old:.2f}x"
    )
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old[:10])}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new[:10])}")
    diffs = sorted((new[k] - old[k], k) for k in common)
    print("improved:")
    for d, k in diffs[: args.top]:
        if d < 0:
            print(f"  {k:36s} {old[k]:7.3f} -> {new[k]:7.3f}  ({d:+.2f}s)")
    print("regressed:")
    for d, k in diffs[-args.top:]:
        if d > 0:
            print(f"  {k:36s} {old[k]:7.3f} -> {new[k]:7.3f}  ({d:+.2f}s)")


if __name__ == "__main__":
    main()
