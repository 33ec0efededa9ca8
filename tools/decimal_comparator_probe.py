#!/usr/bin/env python3
"""Local reproduction of the op_decimal_agg driver-hash divergence
(dev tooling; r9 verdict item 1's comparator-decimal hypothesis).

op_decimal_agg is rows/schema-green and hash-red at the driver for
three rounds across three value-exact implementations, and it is the
surface's ONLY entry with DECIMAL-typed OUTPUT columns. This probe
shows the mechanism without the driver: materialize the Spark result
the way a pyarrow-based comparator would (parquet -> pyarrow ->
pandas) and the oracle the way a duckdb-based one would (.df()), then
compare under every plausible hash path.

  spark decimal(38,2) -> pandas object column of decimal.Decimal
  duckdb DECIMAL(38,2) -> .df() float64

Python's Decimal('1233170563.40') != float 1233170563.4 (exact
comparison against the binary float), str() differs ('...40' vs
'...4'), so equality, to_csv hashing, and hash_pandas_object ALL
mismatch on numerically identical results — exactly the driver's
rows-green/hash-red signature, and only possible on decimal outputs.
The op_decimal_agg_cents twin (same plan, BIGINT-cents + VARCHAR
final projection) maps to int64/str on both sides and is immune.

Usage: decimal_comparator_probe.py <verify_out_dir> <sf_dir>
(run tools/run.sh check <sf> <out> op_decimal_agg op_decimal_agg_cents first)
"""
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq


def load(out_dir, sf_dir, name):
    sp = pq.read_table(glob.glob(f"{out_dir}/{name}/*.parquet")).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    od = con.sql(json.load(open(f"{out_dir}/oracle_sql.json"))[name]).df()
    return sp[sorted(sp.columns)], od[sorted(od.columns)]


def verdicts(sp, od):
    csv = hashlib.md5(sp.to_csv(index=False).encode()).hexdigest() == \
        hashlib.md5(od.to_csv(index=False).encode()).hexdigest()
    try:
        ph = pd.util.hash_pandas_object(sp).tolist() == \
            pd.util.hash_pandas_object(od).tolist()
    except TypeError:
        ph = False
    eq = bool(sp.equals(od))
    return {"csv_hash": csv, "hash_pandas": ph, "frame_equals": eq}


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    for name in ("op_decimal_agg", "op_decimal_agg_cents"):
        sp, od = load(out_dir, sf_dir, name)
        v = verdicts(sp, od)
        cell_types = {c: (type(sp[c].iloc[0]).__name__, str(od[c].dtype))
                      for c in sp.columns}
        print(f"{name}: {v}  cell-types(spark,duck)={cell_types}")
    print("expected: op_decimal_agg all-False (Decimal vs float64), "
          "op_decimal_agg_cents all-True")


if __name__ == "__main__":
    main()
