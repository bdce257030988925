#!/usr/bin/env python3
"""Probe-normalized round-over-round bench comparison (r13).

Usage: probe_compare.py OLD.json NEW.json [threshold_ratio] [min_secs]
Env: OLD_SCAN / OLD_SHUFFLE override the old run's probe minima when
its JSON predates the probe fields (r12's durable tables carry probes
only in BASELINE.md prose).

Reads two full-surface bench JSONs (same leg type — comparing across
leg types is exactly what the probe protocol forbids), prints:
  - probe drift: new/old for scan and shuffle probes (min of pre/post);
  - raw and probe-normalized total ratios (normalizer = geometric mean
    of the two probe ratios — scan-bound and shuffle-bound work move
    together on a context day, split on a plan regression);
  - per-query screen at >threshold_ratio and >min_secs, both raw and
    probe-normalized.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def probemin(d, kind):
    import os
    if "probe_pre" not in d:
        return float(os.environ["OLD_" + kind.upper()])
    vals = []
    for side in ("probe_pre", "probe_post"):
        p = d[side]
        # merged durable tables carry one probe pair PER RUN (a list)
        vals += [x[kind] for x in p] if isinstance(p, list) else [p[kind]]
    return min(vals)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    scan_r = probemin(new, "scan") / probemin(old, "scan")
    shuf_r = probemin(new, "shuffle") / probemin(old, "shuffle")
    norm = (scan_r * shuf_r) ** 0.5
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    to = sum(qo[q] for q in shared)
    tn = sum(qn[q] for q in shared)
    print(f"probes: scan {probemin(old,'scan'):.3f}->{probemin(new,'scan'):.3f} "
          f"({scan_r:.2f}x)  shuffle {probemin(old,'shuffle'):.3f}->"
          f"{probemin(new,'shuffle'):.3f} ({shuf_r:.2f}x)  norm={norm:.3f}")
    print(f"totals ({len(shared)} shared): {to:.1f} -> {tn:.1f} s  "
          f"raw {tn/to:.3f}x  probe-normalized {(tn/to)/norm:.3f}x")
    ratios = sorted(((qn[q] / qo[q] if qo[q] > 0 else float('inf')), q)
                    for q in shared if qo[q] > 0)
    med = ratios[len(ratios) // 2][0]
    print(f"median per-query ratio: raw {med:.3f}  normalized {med/norm:.3f}")
    rows = [(r, q) for r, q in ratios
            if r / norm > thr and qn[q] - qo[q] > floor]
    if rows:
        print(f"normalized movers (> {thr}x and > {floor}s):")
        for r, q in sorted(rows, reverse=True):
            print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f}  raw {r:.2f}x  "
                  f"norm {r/norm:.2f}x")
    else:
        print(f"no normalized movers above {thr}x / {floor}s")
    # the other direction, for completeness
    down = [(r, q) for r, q in ratios if r / norm < 1 / thr and qo[q] - qn[q] > floor]
    if down:
        print("normalized improvements:")
        for r, q in sorted(down):
            print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f}  norm {r/norm:.2f}x")


if __name__ == "__main__":
    main()
