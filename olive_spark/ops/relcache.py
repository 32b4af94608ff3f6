"""Memoized Python-DSv2 index relations (r12 verdict task #4).

Creating a Python data source relation (``spark.read.format("olive")
.load(...)``) costs a fixed pair of plan-side Python worker round
trips — irrelevant on a data-bound scan, but the dominant term when a
persisted-index SERVE touches two or three small index tables per
call (the r11 bench drift on ``llm_similarity_ivf_persisted`` /
``llm_neardup_incremental`` / ``llm_dedup_index_update`` was exactly
this fixed tax, re-paid every call).

The cached object is an immutable LAZY DataFrame — per-serve filters
and projections layer on top without mutating it — but its FILE LIST
is frozen at load time, so the cache key is the directory's snapshot
VERSION: every olive write (append, merge, compact) bumps it
atomically with the data, making stale serving impossible — a probe
after any index mutation keys a fresh relation.  Reading the version
is one local JSON read per serve, ~10⁴× cheaper than the relation it
avoids rebuilding.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_relation(
    spark, path: str, table: "str | None" = None,
    options: "dict | None" = None,
):
    from olive_spark.format.snapshots import current_version

    try:
        version = current_version(path)
    except Exception:
        # unreadable/corrupt log: never cache (every call re-loads), and
        # let the relation load itself surface the real error loudly
        version = None
    if version is None:
        r = spark.read.format("olive")
        if table is not None:
            r = r.option("table", table)
        for k, v in (options or {}).items():
            r = r.option(k, v)
        return r.load(path)
    opt_key = tuple(sorted((options or {}).items()))
    key = (spark.sparkContext.applicationId, path, table, version, opt_key)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    r = spark.read.format("olive")
    if table is not None:
        r = r.option("table", table)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    df = r.load(path)
    if len(_CACHE) > 128:
        _CACHE.clear()
    _CACHE[key] = df
    return df
