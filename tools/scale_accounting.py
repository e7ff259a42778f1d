#!/usr/bin/env python3
"""sf1 -> sf10 class accounting over the full inventory (r10 verdict #4).

Usage:
  python3 tools/scale_accounting.py /tmp/bench_sf1_r11.json /tmp/bench_sf10_r11.json [inflate]

Reads two Bench artifacts (per-op min seconds) and buckets every common
op's sf1->sf10 ratio against its scaling class. `inflate` is the
core-count inflation factor to apply to the LINEAR line when the two
legs ran at different parallelism (sf1 at CPUS=32 vs sf10 at CPUS=24
=> 32/24 = 1.333; every ratio carries it, so the line moves, not the
data). Buckets:

  sub      ratio <= 3              sketch-/calendar-/metadata-bounded
  linear   ratio <= 10*inflate     corpus-linear for 10x data
  loglin   ratio <= 2*10*inflate   linearithmic / constant-heavy linear
  over     above                   needs adjudication: fix or weak label

Ops below `floor` seconds at BOTH scales are reported as 'overhead'
(fixed-cost dominated; a ratio over tiny denominators is noise, and at
100 TB these ops are metadata-bounded by construction).
"""
import json, sys

sf1_path, sf10_path = sys.argv[1], sys.argv[2]
inflate = float(sys.argv[3]) if len(sys.argv) > 3 else 32 / 24
floor = 0.5

d1 = json.load(open(sf1_path))
d10 = json.load(open(sf10_path))
q1, q10 = d1["queries"], d10["queries"]
# A crashed op's map entry is its throw time, not a query time — Bench
# reports the failure in "errors". Classifying a crash's milliseconds
# would file a hard scale FAILURE under 'sub-linear', the exact opposite
# of this tool's purpose: surface them as their own adjudication bucket.
crashed = sorted((set(d1.get("errors", {})) | set(d10.get("errors", {}))) & (set(q1) | set(q10)))
common = sorted((set(q1) & set(q10)) - set(crashed))
missing = sorted(set(q1) - set(q10) - set(crashed))

lin = 10 * inflate
buckets = {"overhead": [], "sub": [], "linear": [], "loglin": [], "over": []}
for k in common:
    a, b = q1[k], q10[k]
    if a <= 0 or b < 0:
        continue
    r = b / a
    if b < floor and a < floor:
        buckets["overhead"].append((k, a, b, r))
    elif r <= 3:
        buckets["sub"].append((k, a, b, r))
    elif r <= lin:
        buckets["linear"].append((k, a, b, r))
    elif r <= 2 * lin:
        buckets["loglin"].append((k, a, b, r))
    else:
        buckets["over"].append((k, a, b, r))

print(f"ops compared: {len(common)}  (sf1-only, excluded from sf10 leg: {len(missing)}: {','.join(missing)})")
if crashed:
    print(f"CRASHED in a leg -- adjudicate first, not classified: {len(crashed)}: {','.join(crashed)}")
print(f"linear line: 10x data x {inflate:.3f} core inflation = {lin:.1f}x\n")
for name, label in [("overhead", "fixed-cost (<0.5 s both scales)"),
                    ("sub", "sub-linear (<=3x)"),
                    ("linear", f"~linear (<= {lin:.1f}x)"),
                    ("loglin", f"linearithmic band (<= {2*lin:.1f}x)"),
                    ("over", "ABOVE class -- adjudicate")]:
    rows = sorted(buckets[name], key=lambda t: -t[3])
    print(f"{label}: {len(rows)}")
    show = rows if name == "over" else rows[:8]
    for k, a, b, r in show:
        print(f"  {k:32s} {a:8.2f} -> {b:8.2f}   {r:6.1f}x")
    print()
