"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 through Spark AND its
``oracle_sql()`` through DuckDB over the same parquet, then compares
row count, sorted-column-name schema, and an order-insensitive value hash.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
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


def norm_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(cols: dict[str, list]) -> tuple[int, str, str]:
    names = sorted(cols.keys())
    nrows = len(next(iter(cols.values()))) if cols else 0
    rows = [
        "|".join(norm_cell(cols[c][i]) for c in names) for i in range(nrows)
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return nrows, ",".join(names), h


def _utc_wall(v):
    """Spark collect() materializes TimestampType as naive datetimes in
    the PROCESS-LOCAL timezone (fromInternal), while DuckDB yields the
    stored UTC wall value — on a non-UTC host the two render the same
    instant differently and hash-mismatch even though the engines
    agree.  Normalize Spark's values back to UTC wall (fromInternal
    sets ``fold``, so DST-ambiguous walls convert exactly)."""
    import datetime

    if isinstance(v, datetime.datetime):
        # naive = local wall (astimezone attaches local); aware = as-is
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return [_utc_wall(x) for x in v]
    return v


def spark_result(df) -> dict[str, list]:
    rows = df.collect()
    cols: dict[str, list] = {c: [] for c in df.columns}
    for r in rows:
        d = r.asDict()
        for c in df.columns:
            cols[c].append(_utc_wall(d[c]))
    return cols


def duck_result(sql: str) -> dict[str, list]:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    data = res.fetchall()
    return {n: [row[i] for row in data] for i, n in enumerate(names)}


def main() -> int:
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            scols = spark_result(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {str(exc)[:300]}")
            failures += 1
            continue
        sn, ss, sh = table_hash(scols)
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            status = "ROWS-ONLY" if sn >= 0 else "EMPTY"
            print(f"{status:9} {name}: rows={sn} ({dt:.1f}s)")
            continue
        try:
            dcols = duck_result(sql)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {str(exc)[:300]}")
            failures += 1
            continue
        dn, ds, dh = table_hash(dcols)
        if (sn, ss, sh) == (dn, ds, dh):
            print(f"MATCH     {name}: rows={sn} hash={sh} ({dt:.1f}s)")
        else:
            failures += 1
            print(f"MISMATCH  {name}:")
            print(f"   spark rows={sn} cols={ss} hash={sh}")
            print(f"   duck  rows={dn} cols={ds} hash={dh}")
            if sn == dn and ss == ds:
                names = sorted(scols.keys())
                srows = sorted(
                    "|".join(norm_cell(scols[c][i]) for c in names) for i in range(sn)
                )
                drows = sorted(
                    "|".join(norm_cell(dcols[c][i]) for c in names) for i in range(dn)
                )
                shown = 0
                for a, b in zip(srows, drows):
                    if a != b:
                        print(f"    spark: {a[:160]}")
                        print(f"    duck : {b[:160]}")
                        shown += 1
                        if shown >= 3:
                            break
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
