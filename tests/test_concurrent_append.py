"""Optimistic concurrency for plain appends (r10, SURVEY §8.1 lift):
chunk files never conflict (uuid names); every metadata
read-modify-write — snapshot log, stats manifest, schema sidecar —
runs under the short blocking metadata commit lock
(format/lock.metadata_commit_lock), so concurrent appenders from REAL
separate processes all land their commits.  Mutation-vs-mutation stays
loud via the long table lock."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One appender process: writes `rounds` single-row olive appends with a
# process-distinct payload, no Spark (the DSv2 commit path is exercised
# by every other suite; what concurrency must protect is the metadata
# commit, driven here exactly as the writer drives it).
_APPENDER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import pyarrow as pa
from olive_spark.format.writer import write_chunk
from olive_spark.format.manifest import merge_manifest, table_summary
from olive_spark.format.snapshots import append_entry

path, who, rounds = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.makedirs(path, exist_ok=True)
for i in range(rounds):
    tbl = pa.table({{"who": pa.array([who], pa.int64()),
                     "i": pa.array([i], pa.int64())}})
    blob = write_chunk({{"data": tbl}})
    name = f"part-{{time.time_ns():020d}}-w{{who}}-{{i:04d}}.olive"
    with open(os.path.join(path, name), "wb") as f:
        f.write(blob)
    ent = table_summary(tbl); ent["size"] = len(blob)
    merge_manifest(path, {{name: ent}})
    append_entry(path, add=[name])
print("done", who)
"""


def test_two_processes_append_concurrently_all_land(tmp_path):
    path = str(tmp_path / "t")
    script = tmp_path / "appender.py"
    script.write_text(_APPENDER.format(repo=REPO))
    rounds = 12
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), path, str(who), str(rounds)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for who in (1, 2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    from olive_spark.format.manifest import load_manifest
    from olive_spark.format.snapshots import (
        current_version,
        files_at,
        list_live_files,
    )

    live = list_live_files(path)
    assert len(live) == 2 * rounds
    # EVERY commit landed in the log: the head snapshot lists every
    # file (a lost RMW would silently omit one), one version per append
    head = current_version(path)
    assert head == 2 * rounds
    assert sorted(files_at(path, head)) == sorted(live)
    # and every stats-manifest entry survived the concurrent merges
    man = load_manifest(path)
    assert sorted(man) == sorted(live)
    # no leftover commit-lock file
    assert not os.path.exists(os.path.join(path, "_olive_commit_lock.json"))


def test_append_during_held_table_lock_lands(tmp_path):
    """An append's metadata commit must NOT wait for a long mutation:
    the table lock (held for a mutation's duration) and the commit
    micro-lock are different locks."""
    from olive_spark.format.lock import table_write_lock
    from olive_spark.format.snapshots import append_entry, current_version

    path = str(tmp_path / "t")
    os.makedirs(path)
    done = {}

    def appender():
        v = append_entry(path, add=["part-x.olive"])
        done["v"] = v

    with table_write_lock(path):
        t = threading.Thread(target=appender)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive(), "append blocked behind the table lock"
    assert done["v"] == 1
    assert current_version(path) == 1


def test_commit_lock_contention_blocks_then_proceeds(tmp_path):
    from olive_spark.format.lock import metadata_commit_lock

    path = str(tmp_path / "t")
    os.makedirs(path)
    order = []

    def worker(tag, hold):
        with metadata_commit_lock(path):
            order.append(("in", tag))
            time.sleep(hold)
            order.append(("out", tag))

    t1 = threading.Thread(target=worker, args=("a", 0.3))
    t1.start()
    time.sleep(0.05)
    t2 = threading.Thread(target=worker, args=("b", 0.0))
    t2.start()
    t1.join(); t2.join()
    assert order == [("in", "a"), ("out", "a"), ("in", "b"), ("out", "b")]


def test_commit_lock_steals_stale_and_times_out_on_live(tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.format.lock import COMMIT_LOCK_NAME, metadata_commit_lock

    path = str(tmp_path / "t")
    os.makedirs(path)
    lp = os.path.join(path, COMMIT_LOCK_NAME)
    # stale (dead pid, expired ttl): stolen silently
    with open(lp, "w") as f:
        json.dump({"pid": 999999999, "host": "elsewhere",
                   "token": "x", "ts": time.time() - 3600, "ttl": 1.0}, f)
    with metadata_commit_lock(path):
        pass
    # live foreign holder (future ts): bounded wait then loud error
    with open(lp, "w") as f:
        json.dump({"pid": 1, "host": "elsewhere", "token": "y",
                   "ts": time.time() + 3600, "ttl": 3600.0}, f)
    with pytest.raises(ValidationError, match="commit lock"):
        with metadata_commit_lock(path, timeout=0.5):
            pass
    os.remove(lp)


def test_mutations_still_fail_loud_on_contention(tmp_path):
    """Mutation-vs-mutation stays the loud table-lock error naming the
    holder — optimistic appends did not weaken it."""
    from olive_spark.format.errors import ValidationError
    from olive_spark.format.lock import LOCK_NAME

    path = str(tmp_path / "t")
    os.makedirs(path)
    # a live foreign mutation holder
    with open(os.path.join(path, LOCK_NAME), "w") as f:
        json.dump({"pid": 1, "host": "elsewhere", "token": "z",
                   "ts": time.time(), "ttl": 3600.0}, f)
    from olive_spark.format.lock import table_write_lock

    with pytest.raises(ValidationError, match="write-locked by"):
        with table_write_lock(path):
            pass
    os.remove(os.path.join(path, LOCK_NAME))


_BRANCH_APPENDER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import pyarrow as pa
from olive_spark.format.writer import write_chunk
from olive_spark.ops.branch import _bdir, _record_branch_files

path, who, rounds = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
bdir = _bdir(path, "race")
for i in range(rounds):
    tbl = pa.table({{"who": pa.array([who], pa.int64()),
                     "i": pa.array([i], pa.int64())}})
    blob = write_chunk({{"data": tbl}})
    rel = f"b-w{{who}}-{{i:04d}}.olive"
    with open(os.path.join(bdir, rel), "wb") as f:
        f.write(blob)
    _record_branch_files(path, "race", [rel], {{}})
print("done", who)
"""


def test_concurrent_branch_appends_all_land(tmp_path):
    """Two separate PROCESSES staging onto the same branch: the ref
    read-modify-write runs under the metadata commit lock, so every
    staged file is listed — a lost RMW would silently drop files from
    the eventual publish."""
    import pyarrow as pa

    path = str(tmp_path / "t")
    os.makedirs(path)
    from olive_spark.format.writer import write_chunk
    from olive_spark.ops.branch import _load_ref, create_branch

    with open(os.path.join(path, "seed.olive"), "wb") as f:
        f.write(write_chunk({"data": pa.table({
            "who": pa.array([0], pa.int64()),
            "i": pa.array([0], pa.int64()),
        })}))
    create_branch(path, "race")
    script = tmp_path / "branch_appender.py"
    script.write_text(_BRANCH_APPENDER.format(repo=REPO))
    rounds = 15
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), path, str(who), str(rounds)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for who in (1, 2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    ref = _load_ref(path, "race")
    assert len(ref["files"]) == 2 * rounds
    assert len(set(ref["files"])) == 2 * rounds
