"""Emulate the driver's correctness gate: run every ``queries()`` entry via
Spark and its ``oracle_sql()`` via DuckDB on the same parquet tables, then
compare row count, column names and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.9g}"
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(normalize(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("set TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(rows)} rows ({dt_spark:.1f}s) [no oracle]")
            if len(rows) == 0:
                failures.append(name)
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:140]}")
            failures.append(name)
            continue
        dt_duck = time.time() - t0
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"columns {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            hs = value_hash(rows, cols)
            ho = value_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a sample difference
                sset = set(
                    "\x01".join(
                        normalize(r[i])
                        for i in sorted(range(len(cols)), key=lambda i: cols[i])
                    )
                    for r in rows
                )
                oset = set(
                    "\x01".join(
                        normalize(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                only_s = list(sset - oset)[:2]
                only_o = list(oset - sset)[:2]
                for x in only_s:
                    print(f"        spark-only: {x[:160]}")
                for x in only_o:
                    print(f"        duck-only:  {x[:160]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} "
                  f"(spark {dt_spark:.1f}s, duck {dt_duck:.1f}s)")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(rows)} rows match "
                  f"(spark {dt_spark:.1f}s, duck {dt_duck:.1f}s)")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
