#!/usr/bin/env python3
"""Cross-SF plan-shape gate (round 10, verdict item 6).

Diffs two `ExplainAudit ALL` tables (one per scale factor) against a
pinned allowlist, so corpus/AQE-driven plan drift fails LOUD instead of
needing a manual audit each round.

Usage:
  sbt "Test/runMain graft.ExplainAudit ALL /root/testdata/sf0.01" | grep '\\[audit\\]' > /tmp/audit_small.txt
  sbt "Test/runMain graft.ExplainAudit ALL /tmp/graft_sf1.0"      | grep '\\[audit\\]' > /tmp/audit_big.txt
  python3 tools/shape_gate.py /tmp/audit_small.txt /tmp/audit_big.txt

Rules:
  - an ERROR line in either table fails the gate;
  - cartesian > 0 anywhere fails the gate (no allowlist can excuse it);
  - a query whose JOIN SHAPE tuple (scans, joins, bhj, smj) differs
    between the two SFs must be named in tools/shape_allowlist.txt
    (the hand-adjudicated AQE flips — e.g. fact-fact BHJ→SMJ at 10×),
    else the gate fails;
  - allowlisted queries that NO LONGER differ are reported as stale
    (warning only — an allowlist should shrink, not rot);
  - an allowlist name that is not a query in EITHER audit table fails
    the gate (r11): a typo'd or renamed adjudication gates nothing.
spans/exchanges are reported as context but not gated: codegen span
counts move with Spark's stage splitting at different input sizes
without any plan-shape meaning.
"""
import re
import sys
from pathlib import Path

LINE = re.compile(
    r"\[audit\] (\S+) spans=(\d+) exchanges=(\d+) scans=(\d+) "
    r"joins=(\d+) bhj=(\d+) smj=(\d+) cartesian=(\d+)")
ERR = re.compile(r"\[audit\] (\S+) ERROR (.*)")


def parse(path):
    rows, errs = {}, {}
    for ln in Path(path).read_text().splitlines():
        m = LINE.search(ln)
        if m:
            n = m.group(1)
            rows[n] = dict(zip(
                ("spans", "exchanges", "scans", "joins", "bhj", "smj", "cartesian"),
                map(int, m.groups()[1:])))
            continue
        e = ERR.search(ln)
        if e:
            errs[e.group(1)] = e.group(2)
    return rows, errs


def main():
    small, big = sys.argv[1], sys.argv[2]
    allow_path = Path(sys.argv[3] if len(sys.argv) > 3 else
                      Path(__file__).parent / "shape_allowlist.txt")
    allow = set()
    if allow_path.exists():
        for ln in allow_path.read_text().splitlines():
            name = ln.split("#")[0].strip()
            if name:
                allow.add(name)
    a, ea = parse(small)
    b, eb = parse(big)
    fails, warns = [], []
    for n, msg in sorted({**ea, **eb}.items()):
        fails.append(f"ERROR {n}: {msg}")
    for n in sorted(set(a) ^ set(b)):
        if n not in ea and n not in eb:
            fails.append(f"MISSING {n}: present at only one SF")
    drifted = set()
    for n in sorted(set(a) & set(b)):
        ra, rb = a[n], b[n]
        if ra["cartesian"] or rb["cartesian"]:
            fails.append(f"CARTESIAN {n}: small={ra['cartesian']} big={rb['cartesian']}")
        key = ("scans", "joins", "bhj", "smj")
        ta, tb = tuple(ra[k] for k in key), tuple(rb[k] for k in key)
        if ta != tb:
            drifted.add(n)
            desc = (f"{n}: (scans,joins,bhj,smj) {ta} -> {tb}")
            if n in allow:
                print(f"  ~ allowed drift {desc}")
            else:
                fails.append(f"DRIFT {desc} (not in {allow_path.name})")
    for n in sorted(allow - drifted):
        # r11 (driver advice): an allowlist name that isn't even a query
        # in either audit table is a TYPO or a rename — it silently gates
        # nothing while the real query's drift would fail under its true
        # name. That's a broken adjudication, so it FAILS; a name that is
        # present but no longer drifting is the allowlist shrinking
        # healthily — warn only.
        if n not in a and n not in b:
            fails.append(f"UNKNOWN allowlist entry: {n} is not a query "
                         "in either audit table (typo / renamed query?)")
        else:
            warns.append(f"stale allowlist entry: {n} no longer drifts")
    for w in warns:
        print(f"  ! {w}")
    for f in fails:
        print(f"  ✗ {f}")
    print(f"SHAPE-GATE queries={len(set(a) & set(b))} drifted={len(drifted)} "
          f"allowed={len(drifted & allow)} FAIL={len(fails)} stale={len(warns)}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
