#!/usr/bin/env python3
"""Assemble CORRECTNESS_x10.json from a `tools/run.sh check` log
(dev tooling: records the 10x-scale gate result in the same shape the
driver records the sf0.01 gate).

Usage: write_x10_artifact.py <check_log> <fixture_desc> [out=CORRECTNESS_x10.json]
"""
import json
import re
import sys


def main():
    log_path, fixture = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_x10.json"
    queries = {}
    for line in open(log_path):
        # FAIL lines read "FAIL name: err" — the colon is line syntax,
        # not part of the name; capturing it forked phantom entries when
        # a later retry PASS line used the bare name (r11). Lazy \S+?
        # with an optional TRAILING colon (r12 advice): the r11 class
        # [^\s:]+ silently truncated any name that itself contained a
        # colon, which would merge or fork entries without warning.
        m = re.match(r"^(PASS|FAIL) (\S+?):?(?: \((\d+) rows\))?( .*)?$", line.strip())
        if not m:
            continue
        status, name, rows, rest = m.groups()
        queries[name] = {"pass": status == "PASS"}
        if rows:
            queries[name]["rows"] = int(rows)
        if status == "FAIL" and rest:
            queries[name]["err"] = rest.strip(": ")[:200]
    doc = {
        "fixture": fixture,
        "protocol": ("graft.Verify at the 10x fixture -> tools/check_oracle.py "
                     "(DuckDB) -- the sf0.01 driver gate re-run at 10x scale"),
        "n_oracled": len(queries),
        "n_pass": sum(1 for q in queries.values() if q["pass"]),
        "queries": dict(sorted(queries.items())),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {doc['n_pass']}/{doc['n_oracled']}")


if __name__ == "__main__":
    main()
