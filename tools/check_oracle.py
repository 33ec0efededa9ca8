#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tooling only —
the engine itself is pure Scala/Spark; this mirrors what the driver does
with Verify.scala output so oracle mismatches surface before a round ends).

Usage: check_oracle.py <verify_out_dir> <sf_dir> [query ...]
       check_oracle.py --make-jitter <src_sf_dir> <dst_dir> [seed]

Reads <verify_out_dir>/<name>/ parquet (Spark output) and runs
<verify_out_dir>/oracle_sql.json[name] in DuckDB against the fixture
tables, then compares schema + values with columns sorted by name and
rows sorted by all columns.

--make-jitter writes a PERTURBED copy of the fixture whose money
columns are pushed onto engine-rounding boundaries: ~1/4 of values are
replaced by exact half-cent doubles ((cents*2+1)/200 — the class where
`double::DECIMAL(18,2)` rounds DIFFERENTLY in Spark vs DuckDB, the
op_decimal_agg r7/r8 driver-gate failure), ~1/2 get a ±1-ulp nudge
(surfaces any round(x,2)/float-fold that isn't fixed-association).
Running the normal check against the jittered dir surfaces
data-dependent divergence the fixed fixture can't: the driver
regenerates its fixture every round, so "passes on MY copy of sf0.01"
is weaker than "passes on a copy engineered to sit on the boundaries".
"""
import glob
import json
import os
import re
import sys

import duckdb


def canon(rel):
    """(df, duckdb-level types) with columns sorted by name.

    The duckdb type strings are captured BEFORE the pandas conversion:
    duckdb's .df() coerces DECIMAL (any precision/scale) and HUGEINT to
    float64, so a Spark decimal128 output vs a DuckDB DOUBLE oracle are
    indistinguishable at the pandas layer — exactly the r7 gap where two
    driver-red entries passed this local gate. The driver hashes rendered
    values (Decimal('1.2500000') != 1.25), so the local gate must be at
    least type-strict."""
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    types = [norm_type(types[i]) for i in order]
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, types


def norm_type(t):
    # Session TZ is pinned UTC on both engines; Spark parquet timestamps
    # carry isAdjustedToUTC so duckdb reads them as TIMESTAMP WITH TIME
    # ZONE while oracle TIMESTAMP literals/date_trunc return plain
    # TIMESTAMP — equivalent under UTC, and the pandas value compare
    # still checks the instants. Everything else (incl. DECIMAL(p,s))
    # must match exactly.
    return "TIMESTAMP" if t == "TIMESTAMP WITH TIME ZONE" else t


def connect(sf_dir, retries=4):
    """Fresh DuckDB connection with the fixture views registered.

    The reconnect itself can OOM right after a crashed predecessor (its
    buffer pool frees asynchronously) — retry with an escalating pause +
    gc so the recovery path can't die inside the exception handler (the
    r8 x10 close-run failure mode; the r9 x10 run still lost a process
    to the then-unguarded final attempt, hence more retries and backoff
    — a killed comparer costs a 78-query manual resume, a 24 s sleep
    does not)."""
    for attempt in range(retries):
        try:
            return _connect_once(sf_dir)
        except duckdb.OutOfMemoryException:
            # last chance falls through to the unguarded call below
            import gc
            import time
            gc.collect()
            time.sleep(3 * (attempt + 1))
    return _connect_once(sf_dir)


def _connect_once(sf_dir):
    con = duckdb.connect()
    # large scale fixtures need spill + an explicit cap (the container's
    # cgroup limit confuses duckdb's autodetection into tiny allocations).
    # The spill dir is per-process unless overridden: two concurrent
    # comparers sharing one dir delete each other's temp files (observed
    # at the r11 x100/x10 concurrent runs — IOException mid-query).
    spill = os.environ.get("GRAFT_DUCKDB_SPILL",
                           f"/tmp/duckdb_spill_{os.getpid()}")
    con.sql(f"SET temp_directory='{spill}'")
    # default sized for the shipped fixtures; the x100 gr_* oracles
    # (recursive CTEs over 100x edges) spill tens of GB under 24GB —
    # raise via env for a serial big-fixture run instead of letting
    # concurrent comparers exhaust /tmp (the r11 ENOSPC failure mode)
    # validate before interpolating into SET (r12 advice): a typo like
    # '64 GB' otherwise surfaces as an opaque DuckDB error mid-gate
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "24GB")
    if not re.fullmatch(r"\d+(\.\d+)?(KB|MB|GB|TB|KiB|MiB|GiB|TiB)", mem, re.IGNORECASE):
        sys.exit(f"GRAFT_DUCKDB_MEM={mem!r} is not a DuckDB size literal "
                 "(expected e.g. 24GB, 60GB, 1.5TB — no spaces)")
    con.sql(f"SET memory_limit='{mem}'")
    # fewer threads shrink per-thread operator state and the radix
    # partitions an out-of-core join writes; the big-fixture gr_* oracles
    # tip into a ~76 GB spill cascade when the working set just misses
    # the memory grant (r11), and halving threads is the lever that
    # keeps them in-memory
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # testdata ships single-file tables; Spark-written fixtures
        # (e.g. the MakeScale 10x corpus) are part-file directories
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        cols = "*"
        if t == "events":
            # ts unit varies by fixture generation (mirrors the engine's
            # footer probe in Tables.events): timestamp[us] reads natively;
            # timestamp[ns] truncates to us; raw INT64 is nanos (legacy
            # Spark-written scale fixtures) -> make_timestamp(us).
            (ts_type,) = [r[1] for r in con.sql(
                f"DESCRIBE SELECT ts FROM '{src}'").fetchall()]
            if ts_type == "BIGINT":
                # make_timestamp takes MICROS; the engine side truncates
                # ns->us identically (Schemas scaladoc), and every oracle
                # funnels ts through epoch_us/date_trunc, so us precision
                # is lossless for the compare
                cols = ("event_id, make_timestamp(ts // 1000) AS ts, user_id, "
                        "event_type, value, props")
            elif ts_type == "TIMESTAMP_NS":
                # duckdb's ns->us cast truncates like the engine's `div`
                cols = ("event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
                        "event_type, value, props")
        con.sql(f"CREATE VIEW {t} AS SELECT {cols} FROM '{src}'")
    return con


# per table: (row key for the hash split, [(column, kind), ...]) —
# kind "money" gets the half-cent-boundary branch (the decimal-cast
# divergence class), "ulp" a +/-1-ulp nudge only (fraction columns like
# discount/tax, where half-CENT boundaries are meaningless but every
# revenue fold must still be fixed-association robust), "int" a +/-1
# step on integer quantities (moves values onto div/bucket/predicate
# boundaries — the floor-div vs int-div and bin-edge class), "ts" snaps
# timestamps onto calendar boundaries (exact midnight / hour / minute,
# and 1 us BEFORE midnight, i.e. 23:59:59.999999 of the prior day —
# the date_trunc / window-edge / ts->date cast tie-break class).
# Never jitter join/group KEYS: the gate perturbs measures so oracle
# and engine still see identical relations, only boundary-valued ones.
JITTER_MONEY = {
    "orders": ("o_orderkey", [("o_totalprice", "money"),
                              ("o_orderdate", "ts")]),
    "lineitem": ("l_orderkey * 8 + l_linenumber",
                 [("l_extendedprice", "money"), ("l_discount", "ulp"),
                  ("l_tax", "ulp"), ("l_quantity", "ulp"),
                  ("l_shipdate", "ts")]),
    "part": ("p_partkey", [("p_retailprice", "money"), ("p_size", "int")]),
    "supplier": ("s_suppkey", [("s_acctbal", "money")]),
    "customer": ("c_custkey", [("c_acctbal", "money")]),
    "events": ("event_id", [("value", "money"), ("ts", "ts")]),
    "documents": ("doc_id", [("n_chars", "int")]),
}

JITTER_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]

# --nulls extension (r11, r10 verdict item 6): the array/string
# three-valued-logic surfaces. Under --nulls, an outer slice of these
# CONTENT columns goes NULL (hash % 13 == 6) and a second disjoint
# slice goes EMPTY ('' / [] — hash % 13 == 7): NULL-vs-empty is its own
# divergence family (length(NULL) vs length(''), split/shingle folds,
# zip_with/aggregate over NULL vs zero-length arrays, hash_embed of a
# missing text). Keys (doc_id, vec_id) and grouping labels are never
# touched — same discipline as the measure-column slice.
NULLS_CONTENT = {
    "documents": ("doc_id", [("text", "NULL", "''")]),
    "embeddings": ("vec_id", [("embedding", "NULL", "[]::FLOAT[]")]),
}


def make_jitter(src, dst, seed=9, nulls=False):
    """Write a boundary-engineered copy of the fixture to dst.

    Branches (keyed on a deterministic hash so the fixture is stable
    per seed): 0 -> exact half-cent ((round(v*100)*2+1)/200.0, the
    double closest to x.xx5 — sub-cent precision straddling the
    half-cent rounding boundary); 1/2 -> +/-1 ulp (nextafter); else
    unchanged. Sign is preserved (acctbal can be negative; both
    engines round halves away from zero, which the check verifies).

    With nulls=True, an OUTER slice (hash % 13 == 6) of every jittered
    measure column goes NULL before the kind branch — the null-
    semantics divergence family: Spark orders NULLS FIRST on ASC where
    DuckDB defaults NULLS LAST, so any top-k / rank / lag whose key can
    go null selects different rows; aggregates/arithmetic skip or
    propagate nulls identically in both engines, so everything else
    must stay green. Keys are still never perturbed."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def content_exprs(t):
        """Column -> CASE expr for the --nulls array/string slices."""
        if not nulls or t not in NULLS_CONTENT:
            return {}
        key, cols = NULLS_CONTENT[t]
        out = {}
        for j, (c, null_v, empty_v) in enumerate(cols):
            h = f"hash(({key}) + {seed} + {2000 + 1000 * j})"
            out[c] = (f"(CASE WHEN {h} % 13 = 6 THEN {null_v} "
                      f"WHEN {h} % 13 = 7 THEN {empty_v} "
                      f"ELSE {c} END) AS {c}")
        return out

    for t in JITTER_TABLES:
        p = f"{src}/{t}.parquet"
        rd = f"{p}/*.parquet" if os.path.isdir(p) else p
        if t in JITTER_MONEY:
            key, jit_cols = JITTER_MONEY[t]
            kinds = dict(jit_cols)
            described = con.sql(f"DESCRIBE SELECT * FROM '{rd}'").fetchall()
            cols = [r[0] for r in described]
            types = {r[0]: r[1] for r in described}
            # legacy scale fixtures store ts as BIGINT nanos — the
            # calendar-snap branch needs a real timestamp type; skip there,
            # LOUDLY: a silently-dropped ts entry shrinks the gate's
            # calendar-boundary coverage without any visible signal
            for c, k in list(kinds.items()):
                if k == "ts" and not types.get(c, "").startswith("TIMESTAMP"):
                    print(f"jitter {t}: NOTICE ts-kind column {c} skipped "
                          f"(type {types.get(c)}, not TIMESTAMP) — no "
                          f"calendar-boundary branch for it in this fixture")
                    del kinds[c]

            def branch(c, j):
                # j offsets the hash per column so the same row perturbs
                # different columns differently
                h = f"hash(({key}) + {seed} + {j})"
                if nulls and kinds[c] != "ts":
                    # the null slice wraps the kind branch: ~1/13 of the
                    # column goes NULL, the rest still boundary-jitters.
                    # MEASURES only — a null EVENT TIME is malformed
                    # input that event-time semantics (watermarks,
                    # sessionization, as-of) quarantine upstream, not
                    # data the two engines owe each other an answer on;
                    # a null measure is data every 100 TB corpus has.
                    inner = branch_kind(c, h)
                    return (f"(CASE WHEN {h} % 13 = 6 THEN NULL "
                            f"ELSE {inner} END) AS {c}")
                return f"{branch_kind(c, h)} AS {c}"

            def branch_kind(c, h):
                if kinds[c] == "money":
                    return f"""CASE {h} % 8
                        WHEN 0 THEN (round({c}*100)::BIGINT * 2 + 1) / 200.0
                        WHEN 1 THEN (round({c}*100)::BIGINT * 2 + 1) / 200.0
                        WHEN 2 THEN nextafter({c}, 1e300)
                        WHEN 3 THEN nextafter({c}, -1e300)
                        ELSE {c} END"""
                if kinds[c] == "int":
                    # +/-1 step, floored at 1 (quantities stay valid) —
                    # lands values on div-bucket and predicate boundaries.
                    # Cast back to the SOURCE type: the +/- arithmetic
                    # widens (INTEGER -> BIGINT) and the engine reads the
                    # copy with the fixture's fixed schema.
                    return f"""(CASE {h} % 4
                        WHEN 0 THEN {c} + 1
                        WHEN 1 THEN greatest({c} - 1, 1)
                        ELSE {c} END)::{types[c]}"""
                if kinds[c] == "ts":
                    # calendar-boundary snaps; exact midnight and
                    # 1 us before it are the date_trunc/window tie cases
                    return f"""CASE {h} % 8
                        WHEN 0 THEN date_trunc('day', {c})
                        WHEN 1 THEN date_trunc('day', {c}) - INTERVAL 1 MICROSECOND
                        WHEN 2 THEN date_trunc('hour', {c})
                        WHEN 3 THEN date_trunc('minute', {c})
                        ELSE {c} END"""
                return f"""CASE {h} % 4
                    WHEN 0 THEN nextafter({c}, 1e300)
                    WHEN 1 THEN nextafter({c}, -1e300)
                    ELSE {c} END"""
            cexp = content_exprs(t)
            sel = ", ".join(
                branch(c, 1000 * list(kinds).index(c)) if c in kinds
                else cexp.get(c, c)
                for c in cols)
            con.sql(f"COPY (SELECT {sel} FROM '{rd}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        elif content_exprs(t):
            cexp = content_exprs(t)
            cols = [r[0] for r in
                    con.sql(f"DESCRIBE SELECT * FROM '{rd}'").fetchall()]
            sel = ", ".join(cexp.get(c, c) for c in cols)
            con.sql(f"COPY (SELECT {sel} FROM '{rd}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        else:
            con.sql(f"COPY (SELECT * FROM '{rd}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n_half = 0
        if t in JITTER_MONEY:
            c = JITTER_MONEY[t][1][0][0]
            n_half = con.sql(
                f"SELECT count(*) FROM '{dst}/{t}.parquet' "
                f"WHERE round({c}*1000) % 10 = 5 OR round({c}*1000) % 10 = -5"
            ).fetchone()[0]
        content = ""
        if nulls and t in NULLS_CONTENT:
            for c, _, empty_v in NULLS_CONTENT[t][1]:
                n_null, n_empty = con.sql(
                    f"SELECT count(*) FILTER ({c} IS NULL), "
                    f"count(*) FILTER ({c} IS NOT NULL AND len({c}) = 0) "
                    f"FROM '{dst}/{t}.parquet'").fetchone()
                content += f", {c}: {n_null} NULL / {n_empty} empty"
        print(f"jitter {t}: written"
              + (f", {n_half} half-cent boundary values" if n_half else "")
              + content)
    con.close()


# Entries allowed to ship DECIMAL-typed OUTPUT columns despite the
# driver comparator's decimal materialization mismatch. Every entry
# must cite a reason — an empty set is the expected steady state since
# the r11 conversion rendered op_decimal_agg as cents+VARCHAR (the
# capability still aggregates in the decimal domain IN-plan).
DECIMAL_OK = frozenset()


def main():
    if sys.argv[1] == "--make-jitter":
        rest = [a for a in sys.argv[4:] if a != "--nulls"]
        make_jitter(sys.argv[2], sys.argv[3],
                    int(rest[0]) if rest else 9,
                    nulls="--nulls" in sys.argv)
        return
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    n_pass = n_fail = 0
    n_since_reconnect = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        # a 300+-oracle run accumulates buffer-pool state faster than the
        # memory_limit evicts it; a periodic fresh connection bounds the
        # footprint BEFORE the allocator hits the cgroup wall
        n_since_reconnect += 1
        if n_since_reconnect >= 50:
            con.close()
            con = connect(sf_dir)
            n_since_reconnect = 0
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            try:
                got, got_t = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
                want, want_t = canon(con.sql(sql))
            except duckdb.OutOfMemoryException:
                # a 290-oracle run accumulates buffer-pool state; a fresh
                # connection retries the one query with an empty pool (the
                # spark side is long since on disk, so this only re-runs
                # DuckDB)
                con.close()
                con = connect(sf_dir)
                got, got_t = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
                want, want_t = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            # a broken connection (e.g. a failed retry) must not cascade
            # into every later query
            try:
                con.sql("SELECT 1")
            except Exception:
                con = connect(sf_dir)
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_fail += 1
            continue
        if got_t != want_t:
            print(f"FAIL {name}: duckdb types {got_t} != {want_t}")
            n_fail += 1
            continue
        sg = [str(t) for t in got.dtypes]
        sw = [str(t) for t in want.dtypes]
        if sg != sw:
            print(f"FAIL {name}: dtypes {sg} != {sw}")
            n_fail += 1
            continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print("  spark:", got[bad].head(3).to_dict("records"))
            print("  duck :", want[bad].head(3).to_dict("records"))
            n_fail += 1
            continue
        # DECIMAL OUTPUT columns pass THIS gate but hash-fail the round
        # driver's comparator (pyarrow materializes Decimal objects,
        # duckdb .df() float64 — see tools/decimal_comparator_probe.py;
        # op_decimal_agg was four-rounds red on exactly this until its
        # r11 conversion to cents+VARCHAR). Flag any NEW entry in the
        # class before it costs a driver round.
        decs = [c for c, t in zip(got.columns, got_t) if "DECIMAL" in str(t)]
        if decs and name not in DECIMAL_OK:
            print(f"WARN {name}: DECIMAL output columns {decs} — "
                  "driver-comparator hash-hostile; render as cents/VARCHAR")
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
