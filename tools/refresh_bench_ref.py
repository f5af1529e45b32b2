#!/usr/bin/env python3
"""bench_ref.json refresh with the r13 discipline (VERDICT r12 #3):

NEVER refresh the re-time baseline from a single closing run's raw
numbers — a host-slowed run bakes a uniformly inflated baseline that
mutes next round's >3x contention flags (r12's ref was ~1.25x high).

Rule implemented here: per-query value = min(first-pass, re-time) from
the given bench artifact, and the tool REFUSES (exit 2) when the run's
ambient control heartbeat shows contention (max > 3x min and max >= 1s)
unless --force. To fold in a quiet-box medians file (the MEDIANS_r11
protocol), pass it with --medians: the refreshed value then takes
min(run, median) per query.

Usage: python3 tools/refresh_bench_ref.py <bench_out.json> [--medians M.json]
       [--force] [-o bench_ref.json]
"""
import sys, json


def main(argv):
    src = None
    med_path = None
    out = "bench_ref.json"
    force = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--medians":
            i += 1; med_path = argv[i]
        elif a == "-o":
            i += 1; out = argv[i]
        elif a == "--force":
            force = True
        else:
            src = a
        i += 1
    if src is None:
        print(__doc__)
        return 1
    run = json.load(open(src))
    amb = [v for _, v in run.get("ambient", [])]
    if amb and max(amb) >= 1.0 and max(amb) > 3 * min(amb) and not force:
        print(f"REFUSED: ambient control heartbeat spiked "
              f"(min {min(amb)}s, max {max(amb)}s) — this run is "
              f"contention-poisoned; refresh from a quiet run or --force")
        return 2
    q = dict(run["queries"])
    for name, pair in run.get("retimed", {}).items():
        q[name] = min(q.get(name, pair[0]), pair[1])
    if med_path:
        med = json.load(open(med_path))
        med = med.get("median", med)  # MEDIANS_r11 layout or a flat map
        for name, v in med.items():
            if isinstance(v, dict):  # per-sf layout
                v = v.get("sf0.1", None)
            if isinstance(v, (int, float)) and name in q:
                q[name] = min(q[name], v)
    ref = {"metric": "total", "value": round(sum(q.values()), 3),
           "unit": "sec", "queries": q, "sf": run.get("sf", "0.1")}
    # compact separators: graft.BenchAdj.parseRefMap scopes on the exact
    # '"queries":{' / '"sf":"' byte patterns
    json.dump(ref, open(out, "w"), separators=(",", ":"))
    print(f"wrote {out}: {len(q)} queries, total {ref['value']}s "
          f"(source {src}{' + ' + med_path if med_path else ''})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
