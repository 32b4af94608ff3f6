"""Advisory single-writer lock (format/lock.py): loud concurrent-mutator
refusal, TTL staleness steal, reentrancy, release-on-exception."""

from __future__ import annotations

import json
import os
import time

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from olive_spark import register_olive

    register_olive(s)
    yield s


def test_lock_blocks_foreign_holder_and_steals_stale(tmp_path):
    from olive_spark.format import lock
    from olive_spark.format.errors import ValidationError

    d = str(tmp_path / "t")
    os.makedirs(d)
    # a live foreign holder (other pid): loud refusal naming it
    with open(os.path.join(d, lock.LOCK_NAME), "w") as f:
        json.dump({"pid": 99999999, "host": "elsewhere",
                   "ts": time.time(), "ttl": 600}, f)
    with pytest.raises(ValidationError, match="write-locked by pid 99999999"):
        lock.acquire(d)
    # a stale one (ttl passed): stolen silently
    with open(os.path.join(d, lock.LOCK_NAME), "w") as f:
        json.dump({"pid": 99999999, "host": "elsewhere",
                   "ts": time.time() - 1000, "ttl": 600}, f)
    lock.acquire(d)
    doc = json.load(open(os.path.join(d, lock.LOCK_NAME)))
    assert doc["pid"] == os.getpid()
    lock.release(d)
    assert not os.path.exists(os.path.join(d, lock.LOCK_NAME))


def test_lock_is_reentrant(tmp_path):
    from olive_spark.format import lock

    d = str(tmp_path / "t")
    with lock.table_write_lock(d):
        with lock.table_write_lock(d):  # composed ops re-enter
            assert os.path.exists(os.path.join(d, lock.LOCK_NAME))
        assert os.path.exists(os.path.join(d, lock.LOCK_NAME))
    assert not os.path.exists(os.path.join(d, lock.LOCK_NAME))


def test_mutations_hold_and_release_the_lock(spark, tmp_path):
    """Ops refuse while a foreign writer holds the table; the lock is
    gone after a successful op AND after one that raised."""
    from olive_spark.format import lock
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import delete_where, drop_column

    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id AS k", "id*2 AS v").coalesce(2) \
        .write.format("olive").mode("append").save(path)

    with open(os.path.join(path, lock.LOCK_NAME), "w") as f:
        json.dump({"pid": 99999999, "host": "elsewhere",
                   "ts": time.time(), "ttl": 600}, f)
    with pytest.raises(ValidationError, match="write-locked"):
        delete_where(spark, path, "k < 10")
    os.remove(os.path.join(path, lock.LOCK_NAME))

    delete_where(spark, path, "k < 10")
    assert not os.path.exists(os.path.join(path, lock.LOCK_NAME))
    assert spark.read.format("olive").load(path).count() == 90

    # an op that raises still releases
    with pytest.raises(ValidationError):
        drop_column(path, "nope")
    assert not os.path.exists(os.path.join(path, lock.LOCK_NAME))


def test_facade_lock_spans_multi_op_sequence(spark, tmp_path):
    import os as _os

    from olive_spark import OliveTable
    from olive_spark.format import lock

    path = str(tmp_path / "t")
    spark.range(50).selectExpr("id AS k", "id AS v").coalesce(1) \
        .write.format("olive").mode("append").save(path)
    t = OliveTable(spark, path)
    with t.lock():
        t.delete_where("k < 5")
        t.update_where({"v": "v + 1"}, "k >= 45")
        assert _os.path.exists(_os.path.join(path, lock.LOCK_NAME))
    assert not _os.path.exists(_os.path.join(path, lock.LOCK_NAME))
    assert t.df().count() == 45


def test_corrupt_lock_goes_stale_by_mtime(tmp_path):
    """A zero-byte/garbage lock (crash mid-write) must not block the
    table forever: it ages by file mtime under the default TTL."""
    import os
    import time

    from olive_spark.format import lock

    d = str(tmp_path / "t")
    os.makedirs(d)
    p = os.path.join(d, lock.LOCK_NAME)
    open(p, "w").close()  # zero-byte
    old = time.time() - lock.DEFAULT_TTL - 100
    os.utime(p, (old, old))
    lock.acquire(d)  # stolen via mtime staleness
    lock.release(d)
    assert not os.path.exists(p)
    # fresh garbage is NOT stale: blocks loud
    open(p, "w").write("{broken")
    import pytest as _pytest

    from olive_spark.format.errors import ValidationError

    with _pytest.raises(ValidationError, match="write-locked"):
        lock.acquire(d)


def test_live_same_host_holder_never_stolen(tmp_path):
    """TTL passing does NOT steal from a live same-host pid (a long
    mutation outrunning its TTL is alive, not crashed) — and a live
    lock with OUR pid but a foreign token (pid reuse) is not reclaimed."""
    import json
    import os
    import socket
    import time

    import pytest as _pytest

    from olive_spark.format import lock
    from olive_spark.format.errors import ValidationError

    d = str(tmp_path / "t")
    os.makedirs(d)
    with open(os.path.join(d, lock.LOCK_NAME), "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "token": "someone-elses", "ts": time.time() - 99999,
                   "ttl": 60}, f)
    with _pytest.raises(ValidationError, match="write-locked"):
        lock.acquire(d)


def test_second_thread_is_refused(tmp_path):
    """Reentrancy is per-thread: a second thread mutating the same
    table is the corruption case and must be refused loudly."""
    import os
    import threading

    from olive_spark.format import lock
    from olive_spark.format.errors import ValidationError

    d = str(tmp_path / "t")
    os.makedirs(d)
    got = []

    def other():
        try:
            lock.acquire(d, ttl=60)
            got.append("acquired")
        except ValidationError:
            got.append("refused")

    with lock.table_write_lock(d, ttl=60):
        t = threading.Thread(target=other)
        t.start()
        t.join()
    assert got == ["refused"]


def test_release_never_deletes_a_stealers_fresh_lock(tmp_path):
    """r8 advice: release() was read-token-then-remove — a stealer
    taking over a TTL-expired lock between the read and the remove had
    its FRESH lock deleted, opening the table to a third concurrent
    writer.  After the rename-based release, a lock whose on-disk token
    no longer matches ours must survive our release untouched."""
    import json
    import os

    from olive_spark.format import lock

    d = str(tmp_path / "t")
    lock.acquire(d, ttl=60)
    # simulate a stealer replacing our (TTL-expired, in its view) lock
    # with its own fresh one just before our release runs
    p = os.path.join(d, lock.LOCK_NAME)
    stolen = {"pid": 99999, "host": "other-host",
              "token": "stealer-token", "ts": 9e12, "ttl": 60}
    with open(p, "w") as f:
        json.dump(stolen, f)
    lock.release(d)
    # the stealer's lock must still be there, byte-meaningful
    with open(p) as f:
        cur = json.load(f)
    assert cur["token"] == "stealer-token"
    # and no rel-* debris left behind
    assert not [n for n in os.listdir(d) if ".rel-" in n]


def test_release_happy_path_removes_lock(tmp_path):
    import os

    from olive_spark.format import lock

    d = str(tmp_path / "t")
    lock.acquire(d, ttl=60)
    assert os.path.exists(os.path.join(d, lock.LOCK_NAME))
    lock.release(d)
    assert not os.path.exists(os.path.join(d, lock.LOCK_NAME))
    assert not [n for n in os.listdir(d) if ".rel-" in n]
    # re-acquire works after release
    lock.acquire(d, ttl=60)
    lock.release(d)


def test_tag_and_expire_respect_the_table_lock(tmp_path):
    """r8 advice: tag_version/delete_version_tag/expire are full
    snapshot-log read-modify-writes — under a FOREIGN holder they must
    refuse (not silently write back a pre-op entry list), while a
    same-thread holder composes reentrantly."""
    import json
    import os
    import socket
    import time

    import pytest as _pytest

    from olive_spark.format import lock, snapshots
    from olive_spark.format.errors import ValidationError

    d = str(tmp_path / "t")
    os.makedirs(d)
    snapshots.append_entry(d, add=["a.olive"])

    # foreign live holder: all three mutations refuse loudly
    with open(os.path.join(d, lock.LOCK_NAME), "w") as f:
        json.dump({"pid": 1, "host": "other-host",
                   "token": "foreign", "ts": time.time(), "ttl": 600}, f)
    with _pytest.raises(ValidationError, match="write-locked"):
        snapshots.tag_version(d, "x")
    with _pytest.raises(ValidationError, match="write-locked"):
        snapshots.delete_version_tag(d, "x")
    with _pytest.raises(ValidationError, match="write-locked"):
        snapshots.expire(d, 1)
    os.remove(os.path.join(d, lock.LOCK_NAME))

    # reentrant composition: tagging inside a held lock works
    with lock.table_write_lock(d):
        v = snapshots.tag_version(d, "baseline")
    assert v == 1
    assert snapshots.list_version_tags(d) == {"baseline": 1}
    assert snapshots.delete_version_tag(d, "baseline") is True
    out = snapshots.expire(d, 1)
    assert out["retained"] == 1
    # no lock debris left behind
    assert not os.path.exists(os.path.join(d, lock.LOCK_NAME))


def test_lock_wait_blocks_until_release_subprocess(spark, tmp_path):
    """r14 (VERDICT r13 task #8): with ``lock_wait`` a second mutation
    QUEUES behind a live holder in another PROCESS and succeeds once it
    releases; without it the historic fail-fast contract holds."""
    import subprocess
    import sys

    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import delete_where

    d = str(tmp_path / "t")
    spark.range(20).write.format("olive").mode("append").save(d)

    holder = subprocess.Popen(
        [sys.executable, "-c", (
            "import sys, time; sys.path.insert(0, %r); "
            "from olive_spark.format import lock; "
            "lock.acquire(%r); print('HELD', flush=True); "
            "time.sleep(4.0); lock.release(%r); print('RELEASED')"
        ) % (os.path.join(os.path.dirname(__file__), ".."), d, d)],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "HELD"
        # fail-fast default: loud refusal naming the live holder
        with pytest.raises(ValidationError, match="write-locked"):
            delete_where(spark, d, "id >= 15")
        # opted-in wait: queues behind the ~4s hold, then mutates
        t0 = time.time()
        out = delete_where(spark, d, "id >= 15", lock_wait=30.0)
        waited = time.time() - t0
        assert out["rows_deleted"] == 5
        assert waited < 29.0  # released long before the wait budget
        assert spark.read.format("olive").load(d).count() == 15
    finally:
        holder.wait(timeout=30)
    # wait budget EXHAUSTED against a still-live holder: loud refusal
    holder2 = subprocess.Popen(
        [sys.executable, "-c", (
            "import sys, time; sys.path.insert(0, %r); "
            "from olive_spark.format import lock; "
            "lock.acquire(%r); print('HELD', flush=True); "
            "time.sleep(8.0); lock.release(%r)"
        ) % (os.path.join(os.path.dirname(__file__), ".."), d, d)],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert holder2.stdout.readline().strip() == "HELD"
        with pytest.raises(ValidationError, match="write-locked"):
            delete_where(spark, d, "id >= 10", lock_wait=1.0)
    finally:
        holder2.wait(timeout=30)


def test_lock_wait_blocks_same_process_other_thread(tmp_path):
    """ADVICE r14: ``wait=`` must also queue behind a live holder that
    is ANOTHER THREAD of this process (in-process threaded pipelines
    queuing two maintenance jobs), not just a foreign process; the
    fail-fast corruption guard applies only once the wait budget is
    exhausted."""
    import threading
    import time

    from olive_spark.format import lock as L
    from olive_spark.format.errors import ValidationError

    d = str(tmp_path / "t")
    released = threading.Event()
    holding = threading.Event()

    def holder():
        L.acquire(d)
        holding.set()
        time.sleep(1.5)
        L.release(d)
        released.set()

    th = threading.Thread(target=holder)
    th.start()
    assert holding.wait(timeout=10)
    # no wait: historic fail-fast contract, names the same process
    import pytest

    with pytest.raises(ValidationError, match="another thread"):
        L.acquire(d)
    # opted-in wait: queues until the holder thread releases
    t0 = time.time()
    L.acquire(d, wait=30.0)
    waited = time.time() - t0
    try:
        assert released.is_set()
        assert waited < 29.0
    finally:
        L.release(d)
        th.join(timeout=10)
    # wait budget exhausted against a still-held lock: loud refusal
    th2 = threading.Thread(target=lambda: (L.acquire(d), time.sleep(3.0), L.release(d)))
    th2.start()
    time.sleep(0.3)
    with pytest.raises(ValidationError, match="another thread"):
        L.acquire(d, wait=0.5)
    th2.join(timeout=10)
