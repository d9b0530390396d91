#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views
over <sf_dir>/*.parquet), and compares: columns sorted by name, rows
sorted by all columns, exact value equality (floats compared exactly —
the queries are designed to be bit-deterministic).

An optional third argument sets a per-query ORACLE timeout in seconds
(default: none). A replay that exceeds it reports SKIP, not FAIL: at
large scale factors some oracle SQL is inherently super-linear even
though the engine side is not (the gram-join replays materialize all
doc pairs per gram, quadratic in docs-per-gram over this corpus's
fixed ~40-word vocabulary), so the oracle — single-node DuckDB —
becomes the bottleneck long before the Spark side does. SKIPs count
toward neither pass nor fail and are listed in the summary.
"""
import json
import math
import sys
import threading

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(v)
            elif hasattr(v, "isoformat"):
                r.append(v.isoformat())
            else:
                r.append(v)
        out.append(tuple(r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def run_with_timeout(con, sql, timeout):
    """Execute sql; on timeout interrupt DuckDB and raise TimeoutError.

    A prior query's watchdog can fire in the gap between its query
    finishing and the timer being cancelled; that interrupt then lands
    on THIS query (shared connection) even though it is healthy. Such a
    stale interrupt is recognizable because this call's own timed_out
    flag is still clear — retry once on a clean timer instead of
    mis-reporting a SKIP.
    """
    if not timeout:
        cur = con.execute(sql)
        return cur, cur.fetchall()
    for attempt in (0, 1):
        timed_out = threading.Event()

        def watchdog():
            timed_out.set()
            con.interrupt()

        t = threading.Timer(timeout, watchdog)
        t.start()
        try:
            cur = con.execute(sql)
            return cur, cur.fetchall()
        except duckdb.InterruptException:
            if timed_out.is_set():
                raise TimeoutError(f"oracle exceeded {timeout}s")
            if attempt == 1:
                # second interrupt with OUR timer still clear: not a
                # timeout — surface the real interrupt as a failure
                # rather than mislabeling it a SKIP
                raise
            # stale interrupt from the previous query's watchdog
        except duckdb.Error:
            if timed_out.is_set():
                raise TimeoutError(f"oracle exceeded {timeout}s")
            raise
        finally:
            t.cancel()


def first_diff(cols, a, b):
    """Name the exact cell where two normalized rows diverge."""
    for c, x, y in zip(cols, a, b):
        if x != y:
            return (f"col '{c}': spark={x!r} ({type(x).__name__}) "
                    f"!= duck={y!r} ({type(y).__name__})")
    return "rows equal after zip (length mismatch?)"


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    print(f"duckdb {duckdb.__version__}", flush=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    skipped = []
    for name, sql in sorted(oracles.items()):
        try:
            spark_tbl = ds.dataset(f"{outdir}/{name}").to_table()
            spark_cols = sorted(spark_tbl.column_names)
            spark_rows = norm(
                zip(*[spark_tbl.column(c).to_pylist() for c in spark_cols]))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            cur, duck_all = run_with_timeout(con, sql, timeout)
            duck_cols_raw = [d[0] for d in cur.description]
            order = sorted(range(len(duck_cols_raw)),
                           key=lambda i: duck_cols_raw[i])
            duck_cols = [duck_cols_raw[i] for i in order]
            duck_rows = norm([tuple(row[i] for i in order)
                              for row in duck_all])
        except TimeoutError as e:
            print(f"SKIP {name}: {e}", flush=True)
            skipped.append(name)
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} != {duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} != "
                  f"{len(duck_rows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(spark_rows, duck_rows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: "
                  f"spark={bad[0][0]} duck={bad[0][1]}; "
                  f"{first_diff(spark_cols, bad[0][0], bad[0][1])}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)", flush=True)
            n_pass += 1
    skip_note = (f" / {len(skipped)} oracle-timeout skipped "
                 f"({','.join(skipped)})" if skipped else "")
    print(f"== {n_pass} pass / {n_fail} fail =={skip_note}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
