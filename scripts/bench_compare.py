"""Cross-artifact bench comparison: per-query deltas between two bench
JSON records, tolerant of the driver's length-bounded capture format.

    python scripts/bench_compare.py OLD.json NEW.json [--top N]
                                    [--band 1.3] [--abs-floor 0.3]

Accepts either a full bench line ({"metric": ..., "queries": {...}})
or a driver capture ({"tail": "<truncated JSON line>"}) — the tail is
recovered by regex, so partially-visible runs still compare on their
visible suffix. Prints the common-query totals, the ratio, and the
biggest per-query movers. No Spark session; pure JSON math.

Drift normalization (VERDICT r11 #2): this VM is burst-credit
throttled and the builder measured ±1.3× cross-day drift on identical
code, so raw per-query ratios re-litigate noise every round. Both
records carry the SAME calibration signal — the sub-second sentinel
query probed every 10 queries ("sentinel_probes") — so the comparison
(a) scales every per-query ratio by the runs' probe-median ratio
(if the new box ran the identical probe 1.2× slower, a query at raw
1.2× is exactly flat), and (b) classifies drift-corrected ratios
inside the measured ±`--band` (default 1.3×) envelope as NOISE,
reporting only movers that clear both the band and an absolute-delta
floor (`--abs-floor`, default 0.3 s — a 0.1→0.2 s "2×" is never a
finding). Plan regressions show up as isolated multi-× jumps that
survive the correction; uniform inflation is absorbed by the probe
ratio.
"""

from __future__ import annotations

import argparse
import json
import re

_PAIR = re.compile(r'"([a-z0-9_:]+)":([0-9]+(?:\.[0-9]+)?)')
_NON_QUERY = {"value", "sf"}

DRIFT_BAND = 1.3  # measured cross-day drift envelope (SCALE.md A/B)
ABS_FLOOR = 0.3  # sub-this-delta movers are never findings


def _load_doc(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    try:
        # driver records are pretty-printed multi-line JSON
        return json.loads(text)
    except json.JSONDecodeError:
        # bench.py output may share a file with stderr noise: the
        # JSON line is the last line
        return json.loads(text.splitlines()[-1])


def load_queries(path: str) -> dict[str, float]:
    return _doc_queries(_load_doc(path))


def _doc_queries(doc: dict) -> dict[str, float]:
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


def probe_median(doc: dict) -> float | None:
    """Median of the run's sentinel-probe timings — the same-code,
    same-data calibration signal recorded every 10 queries. None when
    the record carries no probes (tail captures)."""
    probes = doc.get("sentinel_probes")
    if not isinstance(probes, dict) or not probes:
        return None
    vals = sorted(float(v) for v in probes.values())
    n = len(vals)
    mid = n // 2
    return vals[mid] if n % 2 else 0.5 * (vals[mid - 1] + vals[mid])


def classify(
    old: dict[str, float],
    new: dict[str, float],
    calib: float,
    band: float = DRIFT_BAND,
    abs_floor: float = ABS_FLOOR,
) -> list[tuple]:
    """Per common query: (name, old_s, new_s, raw_ratio, corrected
    ratio, label). corrected = (new/old)/calib; label is "noise"
    inside the drift band OR under the absolute-delta floor (measured
    against the drift-corrected delta), else "regressed"/"improved"."""
    rows = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        raw = n / o if o else float("inf")
        corr = raw / calib
        # corrected absolute delta: what the query moved beyond what
        # the box moved
        delta = n / calib - o
        if o == n:
            # byte-identical timing = a min-merged carry from a shared
            # base record, not a fresh measurement — applying the box
            # correction to it would invent a mover out of lineage
            # bookkeeping
            label = "noise"
        elif (1.0 / band) <= corr <= band or abs(delta) < abs_floor:
            label = "noise"
        elif corr > band:
            label = "regressed"
        else:
            label = "improved"
        rows.append((name, o, n, raw, corr, label))
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--top", type=int, default=6)
    p.add_argument("--band", type=float, default=DRIFT_BAND)
    p.add_argument("--abs-floor", type=float, default=ABS_FLOOR)
    args = p.parse_args()

    old_doc, new_doc = _load_doc(args.old), _load_doc(args.new)
    old, new = _doc_queries(old_doc), _doc_queries(new_doc)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return
    pm_old, pm_new = probe_median(old_doc), probe_median(new_doc)
    calib = (pm_new / pm_old) if pm_old and pm_new else 1.0
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(
        f"common: {len(common)}  old={t_old:.1f}s  new={t_new:.1f}s  "
        f"raw_ratio={t_new / t_old:.2f}x"
    )
    if pm_old and pm_new:
        print(
            f"probe calibration: old_median={pm_old:.3f}s "
            f"new_median={pm_new:.3f}s  box_factor={calib:.2f}x  "
            f"drift-corrected total ratio={t_new / t_old / calib:.2f}x"
        )
    else:
        print("probe calibration: unavailable (missing sentinel_probes) "
              "— raw ratios only")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old[:10])}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new[:10])}")

    rows = classify(old, new, calib, args.band, args.abs_floor)
    noise = sum(1 for r in rows if r[5] == "noise")
    print(f"inside ±{args.band}x drift band or <{args.abs_floor}s delta "
          f"(noise): {noise}/{len(rows)}")
    improved = sorted(
        (r for r in rows if r[5] == "improved"), key=lambda r: r[4]
    )
    regressed = sorted(
        (r for r in rows if r[5] == "regressed"), key=lambda r: -r[4]
    )
    print("improved (drift-corrected):")
    for name, o, n, raw, corr, _ in improved[: args.top]:
        print(f"  {name:36s} {o:7.3f} -> {n:7.3f}  raw {raw:5.2f}x  "
              f"corrected {corr:5.2f}x")
    print("regressed (drift-corrected):")
    for name, o, n, raw, corr, _ in regressed[: args.top]:
        print(f"  {name:36s} {o:7.3f} -> {n:7.3f}  raw {raw:5.2f}x  "
              f"corrected {corr:5.2f}x")


if __name__ == "__main__":
    main()
