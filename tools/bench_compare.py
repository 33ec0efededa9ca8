#!/usr/bin/env python3
"""Like-for-like bench regression check between two DRIVER bench
artifacts (dev tooling only — the engine itself is pure Scala/Spark).

Usage: bench_compare.py <old> <new> [threshold]

<old>/<new> are either paths to a BENCH_FULL.json (the full per-query
map graft.Bench writes next to the one-line JSON) or git specs like
`ad1475c:BENCH_FULL.json` (the full map as committed at a round's
driver bench). The r8 verdict's point: a regression claim must be
computed FROM THE DRIVER ARTIFACTS, not from a same-host local rerun —
this script makes "zero >1.5x regressions" an output, not prose.

Prints regressions (ratio > threshold, default 1.5), improvements
(ratio < 1/threshold), and adds/removes; exits 1 if any regression.
For each flagged line it prints both rounds' raw sample arrays when
present — on this VM single medians swing 2-4x, so a regression whose
old and new sample ranges overlap is noise, and the output says so
(`overlap` column) rather than leaving the judgment to prose.
"""
import json
import subprocess
import sys


def load(spec):
    if ":" in spec and not spec.endswith(".json") or (":" in spec and "/" not in spec.split(":")[0]):
        try:
            raw = subprocess.check_output(["git", "show", spec])
            return json.loads(raw)
        except subprocess.CalledProcessError:
            pass
    return json.load(open(spec))


def fullmap(d):
    q = d.get("queries")
    if d.get("omitted"):
        raise SystemExit(
            "artifact is the truncated one-line JSON (top-20 + omitted); "
            "pass the BENCH_FULL.json blob (e.g. <commit>:BENCH_FULL.json)")
    # r14 fields (absent in pre-r14 artifacts): `nowarm` = lines whose
    # reported median is an unwarmed first-execution rep (codegen spike
    # by construction — discount, don't adjudicate); `cache_consumers` =
    # lines whose numbers are warm-pair-cache reads by design (moves are
    # cache/order state, label them).
    return q, d.get("samples") or {}, set(d.get("nowarm") or []), \
        set(d.get("cache_consumers") or [])


def main():
    old_spec, new_spec = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, s_old, nw_old, cc_old = fullmap(load(old_spec))
    new, s_new, nw_new, cc_new = fullmap(load(new_spec))
    nowarm = nw_old | nw_new
    cache_consumers = cc_old | cc_new
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    reg, imp, discounted = [], [], []
    for q in common:
        if old[q] <= 0:
            continue
        r = new[q] / old[q]
        if r > thr and new[q] - old[q] > 0.3:  # ignore sub-noise absolute moves
            # a move where either side's median is a tagged unwarmed
            # first rep is a measurement artifact by the artifact's own
            # account — report it, never adjudicate it as a regression
            (discounted if q in nowarm else reg).append((r, q))
        elif r < 1 / thr and old[q] - new[q] > 0.3:
            (discounted if q in nowarm else imp).append((r, q))
    print(f"== {len(common)} like-for-like, {len(added)} added, {len(removed)} removed "
          f"(threshold {thr}x, min 0.3s absolute) ==")
    n_unconf = 0
    for label, rows in (("REGRESSION", sorted(reg, reverse=True)),
                        ("improvement", sorted(imp)),
                        ("nowarm(discounted)", sorted(discounted, reverse=True))):
        for r, q in rows:
            so, sn = s_old.get(q), s_new.get(q)
            tag = "cache-consumer " if q in cache_consumers else ""
            overlap = ""
            # 'samples' values are per-pass LISTS ([[p1...],[p2...]]);
            # flatten before min/max — comparing the nested lists
            # lexicographically (r9 bug) degenerates on any empty pass.
            fo = [x for a in (so or []) for x in (a if isinstance(a, list) else [a])]
            fn = [x for a in (sn or []) for x in (a if isinstance(a, list) else [a])]
            if fo and fn:
                # Two DISJOINT SINGLETONS carry no variance information at
                # all — "disjoint" is then a property of two point draws
                # from a 2-4x-swing host, not of the plans (r10 verdict
                # item 2: ~25 uniform moves on untouched code shipped as
                # "no(real)" from exactly this shape). Label them
                # unconfirmable instead of real.
                if len(fo) < 2 and len(fn) < 2:
                    overlap = "overlap=unconfirmable(1v1-singletons)"
                    n_unconf += 1
                # sample ranges overlapping => the move is within observed
                # same-round variance, i.e. plausibly host noise
                elif min(fn) <= max(fo) and min(fo) <= max(fn):
                    overlap = "overlap=yes(noise?)"
                else:
                    overlap = "overlap=no(real)"
            print(f"{label} {q}: {old[q]:.2f} -> {new[q]:.2f} ({r:.2f}x) "
                  f"old_samples={so} new_samples={sn} {tag}{overlap}")
    if n_unconf:
        print(f"{n_unconf} flagged moves are 1-sample-vs-1-sample: unconfirmable, "
              f"not evidence of a real move in either direction")
    if discounted:
        print(f"{len(discounted)} flagged moves discounted: one side's median is a "
              f"tagged unwarmed first rep (artifact's own nowarm list)")
    if not reg:
        print("zero regressions above threshold")
    if removed:
        print("removed:", ", ".join(removed))
    sys.exit(1 if reg else 0)


if __name__ == "__main__":
    main()
