"""Strict mimic of the driver's correctness canonicalizer.

Unlike tests/oracle_check.py (which normalizes Decimal->float and is
therefore blind to output-dtype mismatches), this harness reproduces the
dtype-sensitive comparison the driver applies: Spark results via
``toPandas()``, DuckDB results via ``.df()``, cells stringified as-is, so
a ``decimal.Decimal('10.00')`` on one side vs ``10.0`` float64 on the
other hashes differently — exactly the class of failure recorded as
``hash_match: false`` in CORRECTNESS_r0{2,3}.json.

Usage: python tests/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(pdf):
    """Sort columns by name, rows by stringified values; return
    (nrows, schema, hash, rows)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = ["|".join(str(v) for v in rec) for rec in pdf.itertuples(index=False)]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), ",".join(cols), h, rows


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {str(exc)[:300]}")
            failures += 1
            continue
        try:
            sn, ss, sh, srows = canon(spdf)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: canonicalizer: {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: rows={sn} ({dt:.1f}s)")
            continue
        try:
            dpdf = con.execute(sql).df()
            dn, ds, dh, drows = canon(dpdf)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {str(exc)[:300]}")
            failures += 1
            continue
        if (sn, ss, sh) == (dn, ds, dh):
            print(f"MATCH     {name}: rows={sn} hash={sh} ({dt:.1f}s)")
        else:
            failures += 1
            print(f"MISMATCH  {name}:")
            print(f"   spark rows={sn} cols={ss} hash={sh}")
            print(f"   duck  rows={dn} cols={ds} hash={dh}")
            print(f"   spark dtypes: {dict(spdf.dtypes.astype(str))}")
            print(f"   duck  dtypes: {dict(dpdf.dtypes.astype(str))}")
            if sn == dn and ss == ds:
                shown = 0
                for a, b in zip(srows, drows):
                    if a != b:
                        print(f"    spark: {a[:200]}")
                        print(f"    duck : {b[:200]}")
                        shown += 1
                        if shown >= 3:
                            break
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
