"""Partition-spec evolution (ops.maintenance.respec_partitions) and
metadata-only column RENAME (ops.maintenance.rename_column +
olive_datasource's per-file name mapping)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from olive_spark import register_olive

    register_olive(s)
    yield s


def _dirs(path, prefix):
    return sorted(
        d for d in os.listdir(path)
        if d.startswith(prefix) and "=" in d
    )


def _mk_days_table(spark, path, ndays=4):
    df = spark.range(ndays * 50).selectExpr(
        "id AS k",
        f"timestamp_micros(cast(1700000000000000 + (id % {ndays}) "
        "* 86400000000 as long)) AS ts",
        "cast(id % 16 as long) AS uid",
    )
    df.coalesce(1).write.format("olive") \
        .option("partitionBy", "days(ts)").mode("append").save(path)
    return df


def test_respec_days_to_bucket(spark, tmp_path):
    from olive_spark.format.partition import read_sidecar
    from olive_spark.ops.maintenance import respec_partitions

    path = str(tmp_path / "t")
    _mk_days_table(spark, path)
    assert _dirs(path, "ts_day=")
    pre_rows = sorted(
        tuple(r) for r in spark.read.format("olive").load(path).collect()
    )

    out = respec_partitions(spark, path, "bucket(4, uid)")
    assert out["rows"] == 200
    # new layout on disk, old dirs gone from the live tree
    assert _dirs(path, "uid_bucket4=") == [
        f"uid_bucket4={i}" for i in range(4)
    ]
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for f in files:
            if f.endswith(".olive"):
                assert "uid_bucket4=" in root
    # sidecar repointed
    side = read_sidecar(path)
    assert side == [
        {"kind": "bucket", "col": "uid", "n": 4, "dir": "uid_bucket4"},
    ]
    # content identical
    post = sorted(
        tuple(r) for r in spark.read.format("olive").load(path).collect()
    )
    assert post == pre_rows

    # bucket pruning works on the new layout
    from olive_spark.datasource.olive_datasource import OlivePushdownReader

    sch = spark.read.format("olive").load(path).schema
    r = OlivePushdownReader({"path": path, "pushdown": "true"}, sch)
    r.predicates = [("uid", "=", 5)]
    kept = [
        fp for p in r.partitions() for fp in p.files
        if not (p.predicates and p.predicates[0][0] == "__none__")
    ]
    assert kept and all("uid_bucket4=1" in fp for fp in kept)


def test_respec_time_travel_across_spec_change(spark, tmp_path):
    from olive_spark.ops.maintenance import respec_partitions

    path = str(tmp_path / "t")
    df = _mk_days_table(spark, path)
    want = sorted(tuple(r) for r in df.collect())
    respec_partitions(spark, path, "bucket(4, uid)")
    # v1 (pre-respec) still reads exactly, THROUGH the new spec
    v1 = spark.read.format("olive").option("snapshot", 1).load(path)
    assert sorted(tuple(r) for r in v1.collect()) == want


def test_respec_to_identity_removes_sidecar(spark, tmp_path):
    from olive_spark.format.partition import read_sidecar
    from olive_spark.ops.maintenance import respec_partitions

    path = str(tmp_path / "t")
    _mk_days_table(spark, path)
    respec_partitions(spark, path, "uid")
    assert read_sidecar(path) is None
    assert _dirs(path, "uid=")
    assert spark.read.format("olive").load(path).count() == 200
    # classic hive mutations keep working post-respec
    from olive_spark.ops.maintenance import delete_where

    out = delete_where(spark, path, "k < 10")
    assert out["rows_deleted"] == 10


def test_respec_validates_columns(spark, tmp_path):
    from olive_spark.ops.maintenance import respec_partitions

    path = str(tmp_path / "t")
    _mk_days_table(spark, path)
    with pytest.raises(ValueError, match="not in table"):
        respec_partitions(spark, path, "days(nope)")


def test_rename_column_reads_old_files(spark, tmp_path):
    from olive_spark.ops.maintenance import rename_column

    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v") \
        .coalesce(2).write.format("olive").mode("append").save(path)
    out = rename_column(path, "v", "val")
    assert out["renamed"] == {"v": "val"}

    got = spark.read.format("olive").load(path)
    assert sorted(got.columns) == ["k", "val"]
    rows = sorted((r["k"], r["val"]) for r in got.collect())
    assert rows == [(i, i * 2) for i in range(100)]

    # filters + column pruning through the mapping
    assert got.filter("val = 50").count() == 1
    assert got.select("val").count() == 100

    # appends under the NEW name mix with old files transparently
    spark.range(100, 120).selectExpr("id AS k", "id * 2 AS val") \
        .coalesce(1).write.format("olive").mode("append").save(path)
    got2 = spark.read.format("olive").load(path)
    assert sorted((r["k"], r["val"]) for r in got2.collect()) == [
        (i, i * 2) for i in range(120)
    ]

    # the OLD name is FREE again (r11 column mapping): an append
    # carrying it lands as a FRESH column id — pre-append rows read
    # NULL under it, and the renamed column's values never leak into it
    spark.range(500, 505).selectExpr("id AS k", "id AS v") \
        .write.format("olive").mode("append").save(path)
    got3 = spark.read.format("olive").load(path)
    assert sorted(got3.columns) == ["k", "v", "val"]
    assert got3.filter("k < 120 AND v IS NOT NULL").count() == 0
    assert got3.filter("k >= 500 AND v = k").count() == 5
    # old files still resolve the renamed column by id
    assert got3.filter("k = 10 AND val = 20").count() == 1


def test_rename_chain_and_validation(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import rename_column

    path = str(tmp_path / "t")
    spark.range(50).selectExpr("id AS k", "id * 3 AS a") \
        .coalesce(1).write.format("olive").mode("append").save(path)
    rename_column(path, "a", "b")
    # mid-chain files carry 'b'
    spark.range(50, 80).selectExpr("id AS k", "id * 3 AS b") \
        .coalesce(1).write.format("olive").mode("append").save(path)
    rename_column(path, "b", "c")
    got = spark.read.format("olive").load(path)
    assert sorted(got.columns) == ["c", "k"]
    assert sorted((r["k"], r["c"]) for r in got.collect()) == [
        (i, i * 3) for i in range(80)
    ]

    with pytest.raises(ValidationError, match="not a column"):
        rename_column(path, "nope", "x")
    with pytest.raises(ValidationError, match="taken"):
        rename_column(path, "c", "k")
    with pytest.raises(ValidationError, match="reserved"):
        rename_column(path, "c", "__x")
    # renaming BACK to a previously-used name works under column
    # mapping: the id follows the column; old stored 'a' data (the
    # same id, pre-rename files) still resolves to it correctly
    rename_column(path, "c", "a")
    got = spark.read.format("olive").load(path)
    assert sorted(got.columns) == ["a", "k"]
    assert sorted((r["k"], r["a"]) for r in got.collect()) == [
        (i, i * 3) for i in range(80)
    ]


def test_rename_survives_merge_rewrite(spark, tmp_path):
    """A MERGE after a rename rewrites affected old files under the new
    name; untouched old files keep mapping at read."""
    from olive_spark.ops.maintenance import merge_upsert, rename_column

    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v") \
        .repartition(4).write.format("olive").mode("append").save(path)
    rename_column(path, "v", "val")
    src = spark.createDataFrame(
        [(5, 999), (200, 400)], "k long, val long"
    )
    merge_upsert(spark, path, src, ["k"])
    got = spark.read.format("olive").load(path)
    rows = dict((r["k"], r["val"]) for r in got.collect())
    assert rows[5] == 999 and rows[200] == 400 and rows[7] == 14
    assert len(rows) == 101


def test_rename_partition_column_refused(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import rename_column

    path = str(tmp_path / "t")
    _mk_days_table(spark, path)
    with pytest.raises(ValidationError, match="directory layout"):
        rename_column(path, "ts", "event_ts")


def test_register_table_named_sql(spark, tmp_path):
    from olive_spark import register_table
    from olive_spark.table import OliveTable

    path = str(tmp_path / "t")
    spark.range(60).selectExpr("id AS k", "id * 2 AS v") \
        .write.format("olive").mode("append").save(path)
    register_table(spark, "r9_named", path)
    got = spark.sql(
        "SELECT count(*) AS n, sum(v) AS s FROM r9_named"
    ).first()
    assert (got["n"], got["s"]) == (60, sum(i * 2 for i in range(60)))

    # the view pins the file list at registration (documented DSv2
    # boundary); re-registering picks up later writes
    spark.range(60, 80).selectExpr("id AS k", "id * 2 AS v") \
        .write.format("olive").mode("append").save(path)
    register_table(spark, "r9_named", path)
    assert spark.sql("SELECT count(*) AS n FROM r9_named").first()["n"] == 80

    # facade spelling + reader options pass through
    OliveTable(spark, path).register("r9_named2")
    assert spark.sql("SELECT count(*) FROM r9_named2").first()[0] == 80
    register_table(spark, "r9_named_v1", path, snapshot="1")
    assert spark.sql(
        "SELECT count(*) FROM r9_named_v1"
    ).first()[0] == 60

    with pytest.raises(ValueError, match="invalid view name"):
        register_table(spark, "bad-name", path)


def test_rename_to_hidden_dir_key_refused(spark, tmp_path):
    """A data column renamed to a transform DIR KEY (e.g. 'ts_day')
    would collide with directory pruning's string-equality match and
    silently prune on real-data predicates — refused (r9 review)."""
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import rename_column

    path = str(tmp_path / "t")
    _mk_days_table(spark, path, ndays=2)
    with pytest.raises(ValidationError, match="dir key"):
        rename_column(path, "uid", "ts_day")


def test_respec_with_sort_by_clusters_within_dirs(spark, tmp_path):
    """respec(sort_by=...) buys within-dir clustering in the SAME
    rewrite: post-migration files' page stats on the sort column are
    tight enough that a point lookup prunes pages."""
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _read_header_bytes,
    )
    from olive_spark.ops.maintenance import respec_partitions

    path = str(tmp_path / "t")
    # scrambled k within each future bucket
    spark.range(4000).selectExpr(
        "((id * 2654435761) % 4096) AS k",
        "cast(id % 4 as long) AS uid",
        f"timestamp_micros(cast(1700000000000000 + (id % 4) "
        "* 86400000000 as long)) AS ts",
    ).coalesce(1).write.format("olive") \
        .option("partitionBy", "days(ts)").mode("append").save(path)

    out = respec_partitions(
        spark, path, "bucket(4, uid)", sort_by="k", target_rows=500,
    )
    assert out["rows"] == 4000
    # within every file, k is contiguous-ish: min/max spans are
    # disjoint enough that each file covers << the full k range
    spans = []
    for fp in _list_chunk_files(path):
        header, _ = _read_header_bytes(fp)
        th = header.tables[0]
        st = th.fields[th.field_names.index("k")].stats
        spans.append(max(st["max"]) - min(st["min"]))
    full = 4096
    tight = sum(1 for s in spans if s < full * 0.8)
    assert tight >= len(spans) // 2, spans


def test_rename_time_travel_reads_through_current_names(spark, tmp_path):
    """Latest-schema-wins: a pre-rename snapshot reads THROUGH the
    current (renamed) column names, with values mapped out of the old
    files — same model as add/drop evolution."""
    from olive_spark.ops.maintenance import merge_upsert, rename_column

    path = str(tmp_path / "t")
    spark.range(50).selectExpr("id AS k", "id * 2 AS v") \
        .coalesce(1).write.format("olive").mode("append").save(path)
    rename_column(path, "v", "val")
    merge_upsert(
        spark, path,
        spark.createDataFrame([(1, 111)], "k long, val long"), ["k"],
    )
    v1 = spark.read.format("olive").option("snapshot", 1).load(path)
    assert sorted(v1.columns) == ["k", "val"]
    rows = dict((r["k"], r["val"]) for r in v1.collect())
    assert rows[1] == 2 and len(rows) == 50  # pre-merge values, new name


# ---- type widening (r10) ----------------------------------------------


def test_widen_int_column_metadata_only(spark, tmp_path):
    """int32→int64 widening: no data rewrite, old files cast at read,
    new appends write the wide type natively, filters/joins see long."""
    import glob
    import os

    from olive_spark.ops.maintenance import widen_column

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr(
        "cast(id AS int) AS k", "id * 10 AS v"
    )
    df.coalesce(1).write.format("olive").mode("append").save(path)
    before = {f: os.path.getsize(f)
              for f in glob.glob(os.path.join(path, "*.olive"))}
    out = widen_column(path, "k", "bigint")
    assert out["from"] == "int32" and out["to"] == "int64"
    # zero data churn
    assert {f: os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "*.olive"))} == before
    got = spark.read.format("olive").load(path)
    assert dict(got.dtypes)["k"] == "bigint"
    assert got.count() == 100
    # append values that only fit the wide type
    spark.createDataFrame(
        [(2**40, 1), (2**41, 2)], "k long, v long"
    ).write.format("olive").mode("append").save(path)
    got = spark.read.format("olive").load(path)
    assert got.count() == 102
    assert got.filter("k > 2000000000").count() == 2
    assert got.agg({"k": "sum"}).first()[0] == sum(range(100)) + 2**40 + 2**41


def test_widen_decimal_precision_and_float(spark, tmp_path):
    from olive_spark.ops.maintenance import widen_column

    path = str(tmp_path / "t")
    spark.sql(
        "SELECT CAST(1.25 AS DECIMAL(6,2)) AS d, CAST(1.5 AS FLOAT) AS f"
    ).write.format("olive").mode("append").save(path)
    widen_column(path, "d", "decimal(20,2)")
    widen_column(path, "f", "double")
    got = spark.read.format("olive").load(path)
    assert dict(got.dtypes) == {"d": "decimal(20,2)", "f": "double"}
    row = got.first()
    assert float(row["d"]) == 1.25 and row["f"] == 1.5


def test_widen_refusals(spark, tmp_path):
    import pytest as _pytest

    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import widen_column

    path = str(tmp_path / "t")
    spark.sql(
        "SELECT CAST(1 AS BIGINT) AS k, CAST(1.0 AS DOUBLE) AS x, "
        "CAST(2.5 AS DECIMAL(10,2)) AS d, 's' AS s"
    ).write.format("olive").mode("append").save(path)
    with _pytest.raises(ValidationError, match="legal targets"):
        widen_column(path, "k", "int")          # narrowing
    with _pytest.raises(ValidationError, match="legal targets"):
        widen_column(path, "x", "float")        # narrowing
    with _pytest.raises(ValidationError):
        widen_column(path, "s", "bigint")       # cross-kind
    with _pytest.raises(ValidationError, match="scale"):
        widen_column(path, "d", "decimal(20,4)")  # scale change
    with _pytest.raises(ValidationError, match="precision"):
        widen_column(path, "d", "decimal(40,2)")  # beyond Spark cap
    with _pytest.raises(ValidationError, match="no column"):
        widen_column(path, "zzz", "bigint")


def test_widen_refuses_transform_source(spark, tmp_path):
    import pytest as _pytest

    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import widen_column

    path = str(tmp_path / "t")
    df = spark.range(50).selectExpr("cast(id AS int) AS k", "id AS v")
    df.coalesce(1).write.format("olive") \
        .option("partitionBy", "bucket(4,k)").mode("append").save(path)
    with _pytest.raises(ValidationError, match="partition"):
        widen_column(path, "k", "bigint")


def test_widen_then_merge_and_time_travel(spark, tmp_path):
    """Widening composes with MERGE (source must carry the widened
    type) and time travel reads pre-widening data through the new
    schema."""
    from olive_spark.ops.maintenance import merge_upsert, widen_column

    path = str(tmp_path / "t")
    spark.range(50).selectExpr("cast(id AS int) AS k", "id AS v") \
        .coalesce(1).write.format("olive").mode("append").save(path)
    widen_column(path, "k", "bigint")
    src = spark.createDataFrame([(3, 999), (2**40, 1)], "k long, v long")
    merge_upsert(spark, path, src, key_cols=["k"])
    got = spark.read.format("olive").load(path)
    assert got.count() == 51
    assert got.filter("k = 3 AND v = 999").count() == 1
    old = spark.read.format("olive").option("snapshot", "1").load(path)
    assert dict(old.dtypes)["k"] == "bigint"   # latest-schema-wins
    assert old.count() == 50


def test_add_column_metadata_only(spark, tmp_path):
    """ADD COLUMN: sidecar-only; old files null-fill, appends may carry
    it, refusals loud (existing/dropped/reserved/unsupported)."""
    import pytest as _pytest

    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import add_column, drop_column

    path = str(tmp_path / "t")
    spark.range(20).selectExpr("id AS k", "id AS v").coalesce(1) \
        .write.format("olive").mode("append").save(path)
    out = add_column(path, "label", "string")
    assert out["type"] == "utf8"
    add_column(path, "score", "double")
    df = spark.read.format("olive").load(path)
    assert df.columns == ["k", "v", "label", "score"]
    assert df.filter("label IS NULL").count() == 20
    # appends carrying the column land; older files keep null-filling
    spark.createDataFrame(
        [(100, 1, "x", 0.5)], "k long, v long, label string, score double"
    ).write.format("olive").mode("append").save(path)
    df = spark.read.format("olive").load(path)
    assert df.count() == 21
    assert df.filter("label = 'x'").count() == 1
    assert df.filter("label IS NULL").count() == 20
    # refusals
    with _pytest.raises(ValidationError, match="already exists"):
        add_column(path, "v", "bigint")
    with _pytest.raises(ValidationError, match="reserved"):
        add_column(path, "__x", "bigint")
    with _pytest.raises(ValidationError, match="unsupported"):
        add_column(path, "m", "map<string,int>")
    drop_column(path, "label")
    # re-adding the dropped name is a FRESH column id (r11 column
    # mapping): the old 'x' value stays invisible
    add_column(path, "label", "string")
    df = spark.read.format("olive").load(path)
    assert df.filter("label IS NOT NULL").count() == 0


def test_register_table_version_fresh(spark, tmp_path):
    """r14 (VERDICT r13 task #5): a named view re-resolves after ANY
    same-process commit to its table — plain df.write appends (save
    hook: the DSv2 commit runs in the plan worker, invisible to the
    commit listener), facade mutations (commit listener), and merge.
    Snapshot-pinned views stay frozen; refresh_table covers the
    cross-process boundary."""
    from olive_spark import refresh_table, register_table
    from olive_spark.ops.maintenance import delete_where, merge_upsert

    path = str(tmp_path / "fresh")
    spark.range(10).write.format("olive").mode("append").save(path)
    register_table(spark, "r14_fresh", path)
    q = "SELECT count(*) AS c, coalesce(sum(id), 0) AS s FROM r14_fresh"
    assert spark.sql(q).collect()[0]["c"] == 10
    # plain writer append AFTER registration
    spark.range(10, 15).write.format("olive").mode("append").save(path)
    assert spark.sql(q).collect()[0]["c"] == 15
    # facade delete (merge-on-read or rewrite — either way a commit)
    delete_where(spark, path, "id >= 12")
    row = spark.sql(q).collect()[0]
    assert (row["c"], row["s"]) == (12, sum(range(12)))
    # merge inserts through the facade
    merge_upsert(spark, path, spark.range(20, 23), ["id"])
    assert spark.sql(q).collect()[0]["c"] == 15
    # snapshot-pinned view is deliberately frozen across commits
    register_table(spark, "r14_fresh_v1", path, snapshot="1")
    pinned = spark.sql("SELECT count(*) AS c FROM r14_fresh_v1") \
        .collect()[0]["c"]
    spark.range(100, 102).write.format("olive").mode("append").save(path)
    assert spark.sql("SELECT count(*) AS c FROM r14_fresh_v1") \
        .collect()[0]["c"] == pinned
    assert spark.sql(q).collect()[0]["c"] == 17
    # refresh_table: explicit re-resolve (the cross-process recourse)
    refresh_table(spark, "r14_fresh")
    assert spark.sql(q).collect()[0]["c"] == 17
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not registered"):
        refresh_table(spark, "never_registered_view")
