#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tooling only,
not part of the Spark library). Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--stress LIMIT]
Reads each <verifyOutDir>/<name> parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name and rows by all columns, and
compares values EXACTLY — floats bit-for-bit (the queries' exact-DECIMAL
canonicalization makes both engines produce identical doubles; there is
no tolerance).

--stress LIMIT (e.g. --stress 512MB): run the WHOLE registry sequentially
on ONE DuckDB connection pinned to `SET memory_limit = LIMIT`, with no
OOM retry and no reconnect. This models the driver's shared-connection
harness under host memory pressure: an oracle whose residual footprint
pushes the connection to its ceiling fails HERE, deterministically,
instead of OOM-ing a neighbor in the driver's run (r4/r5 failure mode).
Every oracle must pass this gate at a small limit before a round ships."""
import json, os, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v  # exact: the engine-side canonicalization must be bit-identical
    return v

def connect(sf_dir, memory_limit=None):
    con = duckdb.connect()
    if memory_limit:
        con.sql(f"SET memory_limit = '{memory_limit}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

def main(sf_dir, out_dir, stress_limit=None):
    con = connect(sf_dir, stress_limit)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = infra = 0
    # Verify-side failure roster: every entry is a FAIL here, including
    # rows-only queries with no oracle SQL (they'd otherwise vanish
    # silently — the r6 regression mode where 37 broken queries made the
    # registry look smaller instead of red).
    verify_errors = {}
    try:
        verify_errors = json.load(open(f"{out_dir}/_errors.json"))
    except FileNotFoundError:
        pass
    for name, msg in sorted(verify_errors.items()):
        print(f"FAIL {name}: verify-side error (no Spark output): {msg}")
        fail += 1
    for name, sql in sorted(oracle.items()):
        if name in verify_errors:
            continue  # already counted above; no output to compare
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: oracle entry has NO Spark output directory "
                  f"(query unregistered in Verify, or output deleted)")
            fail += 1
            continue
        for attempt in (1, 2):
            r = check_one(con, out_dir, name, sql, attempt,
                          retry_oom=stress_limit is None)
            # DuckDB OOM is transient host memory pressure (e.g. a JVM
            # still unwinding next door), not a correctness signal —
            # retry once with a fresh connection before counting a fail.
            # (In --stress mode retry_oom is off: an OOM under the pinned
            # limit is exactly the signal the mode exists to surface.)
            if r == "oom" and attempt == 1:
                import time, gc
                # the reconnect itself can OOM under the same transient
                # pressure — keep backing off until the host frees memory
                reconnected = False
                for backoff in (5, 15, 30):
                    gc.collect(); time.sleep(backoff)
                    try:
                        con = connect(sf_dir)
                        reconnected = True
                        break
                    except Exception:
                        continue
                if not reconnected:
                    # never retry on the stale post-OOM connection: record
                    # as an infra failure, distinct from a real mismatch
                    print(f"INFRA {name}: reconnect failed after backoff; "
                          "host memory pressure, not an oracle mismatch")
                    infra += 1
                    break
                continue
            if r is True:
                ok += 1
            else:
                fail += 1
            break
    print(f"\n{ok} ok, {fail} fail" + (f", {infra} infra" if infra else ""))
    return 1 if (fail or infra) else 0


def check_one(con, out_dir, name, sql, attempt, retry_oom=True):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = sorted(spark_rel.columns)
            spark_rows = sorted(con.sql(
                f"SELECT {', '.join(scols)} FROM spark_rel").fetchall(),
                key=lambda r: tuple((x is None, str(x)) for x in r))
            duck_rel = con.sql(sql)
            dcols = sorted(duck_rel.columns)
            duck_rows = sorted(con.sql(
                f"SELECT {', '.join(dcols)} FROM duck_rel").fetchall(),
                key=lambda r: tuple((x is None, str(x)) for x in r))
            if scols != dcols:
                print(f"FAIL {name}: columns spark={scols} duck={dcols}")
                return False
            # Replicate the driver's pandas-side typing: a DuckDB HUGEINT
            # (e.g. windowed SUM over INTEGER) lands as float64 in pandas
            # while the Spark parquet is int64 — stringifies differently,
            # so the driver's hash fails even when fetchall values match.
            # LIMIT 0: the pandas dtype is decided by the DuckDB column
            # TYPE (HUGEINT→float64 etc.), so no rows need materializing
            skinds = [d.kind for d in con.sql(
                f"SELECT {', '.join(scols)} FROM spark_rel LIMIT 0").df().dtypes]
            dkinds = [d.kind for d in con.sql(
                f"SELECT {', '.join(dcols)} FROM duck_rel LIMIT 0").df().dtypes]
            if skinds != dkinds:
                print(f"FAIL {name}: pandas dtype kinds spark={skinds} duck={dkinds}")
                return False
            if len(spark_rows) != len(duck_rows):
                print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
                return False
            bad = None
            for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                if tuple(map(norm, a)) != tuple(map(norm, b)):
                    bad = (i, a, b); break
            if bad:
                print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
                return False
            print(f"OK   {name} ({len(spark_rows)} rows)")
            return True
        except Exception as e:
            if "OutOfMemory" in type(e).__name__ or "Out of Memory" in str(e):
                if retry_oom and attempt == 1:
                    print(f"RETRY {name}: transient duckdb OOM")
                    return "oom"
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            return False

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stress = None
    if "--stress" in sys.argv:
        stress = sys.argv[sys.argv.index("--stress") + 1]
        args = [a for a in args if a != stress]
    sys.exit(main(args[0], args[1], stress))
