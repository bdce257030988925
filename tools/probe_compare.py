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


def probeband(d, kind):
    """(min, median, max) of the probe samples. r14+ JSONs carry all
    raw samples in probe_samples (9 per side: min-of-3 pre + 3
    interleaved singles + min-of-3 post); earlier JSONs only have the
    pre/post min-of-3 pair, so the band degenerates to those two points
    and its width UNDERSTATES the true leg variance — treat pre-r14
    bands as a floor, not an estimate."""
    import os
    if "probe_samples" in d:
        xs = sorted(d["probe_samples"][kind])
    elif "probe_pre" in d:
        xs = []
        for side in ("probe_pre", "probe_post"):
            p = d[side]
            xs += [x[kind] for x in p] if isinstance(p, list) else [p[kind]]
        xs.sort()
    else:
        v = float(os.environ["OLD_" + kind.upper()])
        xs = [v]
    n = len(xs)
    med = xs[n // 2] if n % 2 == 1 else (xs[n // 2 - 1] + xs[n // 2]) / 2
    return xs[0], med, xs[-1]


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    scan_r = probemin(new, "scan") / probemin(old, "scan")
    shuf_r = probemin(new, "shuffle") / probemin(old, "shuffle")
    norm = (scan_r * shuf_r) ** 0.5
    # Banded normalizer (r14, verdict item 3): a single probe point's
    # variance exceeds the effects being adjudicated, so the normalized
    # ratio is a RANGE. Point estimate from the medians; the band's ends
    # from the cross-extremes (new-min/old-max .. new-max/old-min per
    # side, geomean across sides) — the widest drift consistent with the
    # recorded samples. A claim is only decidable when its whole band
    # sits on one side of the bar.
    sc_o, sh_o = probeband(old, "scan"), probeband(old, "shuffle")
    sc_n, sh_n = probeband(new, "scan"), probeband(new, "shuffle")
    norm_med = ((sc_n[1] / sc_o[1]) * (sh_n[1] / sh_o[1])) ** 0.5
    norm_lo = ((sc_n[0] / sc_o[2]) * (sh_n[0] / sh_o[2])) ** 0.5
    norm_hi = ((sc_n[2] / sc_o[0]) * (sh_n[2] / sh_o[0])) ** 0.5
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    to = sum(qo[q] for q in shared)
    tn = sum(qn[q] for q in shared)
    print(f"probes: scan {probemin(old,'scan'):.3f}->{probemin(new,'scan'):.3f} "
          f"({scan_r:.2f}x)  shuffle {probemin(old,'shuffle'):.3f}->"
          f"{probemin(new,'shuffle'):.3f} ({shuf_r:.2f}x)  norm={norm:.3f}")
    print(f"probe bands: scan old[{sc_o[0]:.3f},{sc_o[1]:.3f},{sc_o[2]:.3f}] "
          f"new[{sc_n[0]:.3f},{sc_n[1]:.3f},{sc_n[2]:.3f}]  "
          f"shuffle old[{sh_o[0]:.3f},{sh_o[1]:.3f},{sh_o[2]:.3f}] "
          f"new[{sh_n[0]:.3f},{sh_n[1]:.3f},{sh_n[2]:.3f}]")
    print(f"normalizer band: {norm_lo:.3f} .. {norm_med:.3f} .. {norm_hi:.3f} "
          f"(median point; ends = widest drift consistent with samples)")
    raw = tn / to
    print(f"totals ({len(shared)} shared): {to:.1f} -> {tn:.1f} s  "
          f"raw {raw:.3f}x  probe-normalized {raw/norm:.3f}x  "
          f"normalized band {raw/norm_hi:.3f}x .. {raw/norm_med:.3f}x .. {raw/norm_lo:.3f}x")
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
