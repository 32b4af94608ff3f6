"""Advisory single-writer lock for olive table directories.

Every mutation op (merge/delete/update/compact/restore/vacuum/
drop_column) documents a single-writer contract; this module upgrades
"coordinating writers is the caller's job" to engine-enforced for the
maintenance surface: each op takes the table lock for its duration, so
two concurrent mutators fail LOUD (naming the holder) instead of
interleaving snapshot-log rewrites into silent corruption.

Mechanics: ``_olive_lock.json`` created with O_EXCL (atomic on POSIX
filesystems — the NFS/object-store caveat is documented, not hidden:
advisory means a byzantine writer that skips the API can still race).
The lock carries owner pid/host/a random instance token/ts/ttl.

Staleness: a holder that crashed leaves a lock which later acquirers
steal once its TTL passes — BY ATOMIC RENAME to a unique name, never
by deleting the live path (two stealers racing a remove could delete
the winner's brand-new lock; a rename can only move the stale file
once).  An unreadable/zero-byte lock (crash mid-write) goes stale by
file MTIME.  A same-host holder whose pid is still alive is NEVER
stolen regardless of TTL (liveness probe); cross-host staleness is
TTL-only, so set ``ttl`` above your longest mutation — there is no
heartbeat, and a live cross-host holder that outruns its TTL can be
stolen (documented limit of any heartbeat-less advisory lock).

Reentrancy is per (process, thread) and token-checked: composed ops on
the SAME thread re-acquire freely (restore → recovery, facade → op,
``with t.lock():`` blocks), while a second thread in the same process
is refused like any foreign writer — two threads mutating one table is
exactly the corruption case.  Pid-reuse and shared-hostname clusters
can't false-reclaim: reclaim requires the on-disk token to be one this
process wrote.

Plain DSv2 appends do NOT take this long table lock.  Since r10 they
are safe to run concurrently anyway: chunk files never collide (uuid
names) and every metadata read-modify-write — snapshot log, stats
manifest, schema sidecar — runs under the short blocking
:class:`metadata_commit_lock` below, so concurrent appenders both land
their commits (optimistic concurrency, Delta-style: the micro-lock IS
the compare-and-swap a filesystem lacks).  Mutation-vs-mutation — the
corruption case — stays enforced by this table lock; an append landing
mid-mutation interleaves safely in the log (a mutation only removes
files it discovered, never the append's new ones).
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time
import uuid

from olive_spark.format.errors import ValidationError

LOCK_NAME = "_olive_lock.json"
DEFAULT_TTL = 3600.0

# (thread_id, abspath) -> depth; abspath -> token written by this process
_guard = threading.Lock()
_depth: dict = {}
_tokens: dict = {}


def _lock_path(dirpath: str) -> str:
    return os.path.join(dirpath, LOCK_NAME)


def _read_lock_file(p: str) -> "dict | None":
    """None = no lock file; {} = unreadable (crash mid-write)."""
    try:
        with open(p) as f:
            doc = json.load(f)
        return doc if isinstance(doc, dict) else {}
    except FileNotFoundError:
        return None
    except (OSError, ValueError):
        return {}


def _read(dirpath: str) -> "dict | None":
    return _read_lock_file(_lock_path(dirpath))


def _lock_file_stale(p: str, cur: dict) -> bool:
    ts = cur.get("ts")
    ttl = cur.get("ttl", DEFAULT_TTL)
    if not isinstance(ts, (int, float)) or not isinstance(
        ttl, (int, float)
    ):
        # unreadable/garbage content: age by file mtime under the
        # default TTL — a crash between create and flush must not
        # block the table forever
        try:
            ts = os.path.getmtime(p)
        except OSError:
            return False  # vanished: the acquire loop re-reads
        ttl = DEFAULT_TTL
    if time.time() - float(ts) <= float(ttl):
        return False
    # TTL passed — but never steal from a live same-host process: a
    # long mutation outrunning its TTL is alive, not crashed
    if cur.get("host") == socket.gethostname() and isinstance(
        cur.get("pid"), int
    ):
        try:
            os.kill(cur["pid"], 0)
            return False  # alive
        except ProcessLookupError:
            return True
        except PermissionError:
            return False  # exists under another uid: alive
    return True


def _is_stale(dirpath: str, cur: dict) -> bool:
    return _lock_file_stale(_lock_path(dirpath), cur)


def _steal_lock_file(p: str) -> None:
    """Move the stale lock aside ATOMICALLY: rename can only succeed
    for one stealer (the loser gets FileNotFoundError and re-enters the
    acquire loop, now seeing the winner's fresh lock)."""
    aside = p + f".stale-{uuid.uuid4().hex[:8]}"
    try:
        os.rename(p, aside)
    except FileNotFoundError:
        return
    try:
        os.remove(aside)
    except OSError:
        pass


def _steal(dirpath: str) -> None:
    _steal_lock_file(_lock_path(dirpath))


def acquire(dirpath: str, ttl: float = DEFAULT_TTL,
            wait: float = 0.0) -> None:
    """Take (or re-enter, same thread) the table write lock; raises
    ValidationError naming the holder when another live writer has it.

    ``wait`` (r14, VERDICT r13 task #8): seconds to BLOCK for a live
    holder before failing loud — the opt-in for pipelines running two
    maintenance jobs against one table (compact racing a scheduled
    vacuum wants to queue, not crash).  Default 0.0 keeps the historic
    fail-fast contract; TTL-stale locks are stolen on the same rules
    either way."""
    os.makedirs(dirpath, exist_ok=True)
    key = (threading.get_ident(), os.path.abspath(dirpath))
    tkey = os.path.abspath(dirpath)
    with _guard:
        if _depth.get(key, 0) > 0:
            _depth[key] += 1
            return
    p = _lock_path(dirpath)
    me_host = socket.gethostname()
    deadline = time.time() + max(0.0, float(wait))
    delay = 0.02
    races = 0
    while True:
        token = uuid.uuid4().hex
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({
                    "pid": os.getpid(), "host": me_host, "token": token,
                    "ts": time.time(), "ttl": float(ttl),
                }, f)
                f.flush()
                os.fsync(f.fileno())
            with _guard:
                _depth[key] = 1
                _tokens[tkey] = token
            return
        except FileExistsError:
            cur = _read(dirpath)
            if cur is None:
                races += 1
                if races > 16 and time.time() >= deadline:
                    break  # pathological churn: fail via the loop exit
                continue  # released between exists and read — retry
            with _guard:
                ours = _tokens.get(tkey)
                held_by_other_thread = any(
                    k[1] == tkey and d > 0 and k != key
                    for k, d in _depth.items()
                )
            if ours is not None and cur.get("token") == ours:
                if held_by_other_thread:
                    if time.time() < deadline:
                        # opted-in blocking applies to SAME-PROCESS
                        # holders too (ADVICE r14): an in-process
                        # threaded pipeline queuing two maintenance
                        # jobs is exactly the advertised wait= use
                        # case — back off and re-probe until the other
                        # thread releases or the wait runs out
                        time.sleep(delay)
                        delay = min(delay * 1.6, 0.5)
                        continue
                    # ANOTHER thread of this process is mid-mutation:
                    # that is the corruption case, not a reclaim
                    raise ValidationError(
                        f"table at {dirpath} is write-locked by another "
                        f"thread of this process (pid {os.getpid()}) — "
                        "two in-process mutators corrupt the snapshot "
                        "log; serialize them"
                    )
                # this process wrote the lock but lost its depth entry
                # (an exception escaped release) — reclaim on THIS
                # thread; token match means no pid-reuse or
                # hostname-twin can hit this branch
                with _guard:
                    _depth[key] = 1
                return
            if _is_stale(dirpath, cur):
                _steal(dirpath)
                races += 1
                if races > 16 and time.time() >= deadline:
                    break
                continue
            if time.time() < deadline:
                # opted-in blocking: the holder is live — back off and
                # re-probe until it releases or the wait runs out
                time.sleep(delay)
                delay = min(delay * 1.6, 0.5)
                continue
            age = time.time() - float(cur.get("ts") or time.time())
            raise ValidationError(
                f"table at {dirpath} is write-locked by "
                f"pid {cur.get('pid')} on {cur.get('host')} "
                f"(age {age:.0f}s, ttl {cur.get('ttl', DEFAULT_TTL)}s) — "
                "concurrent mutations corrupt the snapshot log; wait "
                "(pass lock wait= on the verb), or remove "
                "_olive_lock.json if the holder is known dead"
            )
    raise ValidationError(
        f"could not acquire write lock at {dirpath} (lost {races} steal "
        "races) — retry"
    )


def release(dirpath: str) -> None:
    key = (threading.get_ident(), os.path.abspath(dirpath))
    tkey = os.path.abspath(dirpath)
    with _guard:
        n = _depth.get(key, 0)
        if n > 1:
            _depth[key] = n - 1
            return
        _depth.pop(key, None)
        ours = _tokens.get(tkey)
    cur = _read(dirpath)
    if cur and ours is not None and cur.get("token") == ours:
        # Release by RENAME-then-unlink, mirroring _steal: a plain
        # os.remove after the token read is non-atomic — a cross-host
        # stealer taking over a TTL-expired lock between the read and
        # the remove would have ITS fresh lock deleted, letting a third
        # writer acquire concurrently.  rename can only move the live
        # path once; we re-verify the token on the moved file and
        # restore (non-clobbering os.link) if we displaced a stealer.
        p = _lock_path(dirpath)
        aside = p + f".rel-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(p, aside)
        except FileNotFoundError:
            with _guard:
                _tokens.pop(tkey, None)
            return
        moved_ours = True
        try:
            with open(aside) as f:
                moved_ours = json.load(f).get("token") == ours
        except (OSError, ValueError):
            pass  # unreadable: treat as ours (we matched pre-rename)
        if not moved_ours:
            # we displaced a stealer's fresh lock — put it back without
            # clobbering anything a third writer created meanwhile
            try:
                os.link(aside, p)
            except OSError:
                pass
        try:
            os.remove(aside)
        except OSError:
            pass
        with _guard:
            _tokens.pop(tkey, None)


class table_write_lock:
    """``with table_write_lock(path):`` — reentrant (same thread)
    advisory lock.  ``wait`` blocks up to that many seconds for a live
    holder before failing loud (default: fail fast)."""

    def __init__(self, dirpath: str, ttl: float = DEFAULT_TTL,
                 wait: float = 0.0) -> None:
        self.dirpath = dirpath
        self.ttl = ttl
        self.wait = wait

    def __enter__(self) -> "table_write_lock":
        acquire(self.dirpath, self.ttl, wait=self.wait)
        return self

    def __exit__(self, *exc) -> None:
        release(self.dirpath)


COMMIT_LOCK_NAME = "_olive_commit_lock.json"
COMMIT_TTL = 30.0
COMMIT_TIMEOUT = 120.0


class metadata_commit_lock:
    """Short BLOCKING lock serializing only metadata read-modify-writes
    (snapshot log, stats manifest, schema sidecar) — the optimistic-
    concurrency primitive that lets plain APPENDS run concurrently:

    - chunk files never conflict (uuid names), so an append's only
      shared state is its metadata commit — a millisecond-scale JSON
      read-merge-replace;
    - every metadata RMW (from appenders AND from mutations, whose
      table lock stays held for the op's duration) takes this lock for
      just that window, so two processes appending at once BOTH land
      their snapshot entries instead of last-write-wins losing one —
      Delta's commit-retry, realized as a bounded wait on a micro-lock
      (a filesystem has no atomic compare-and-swap to retry against;
      the O_EXCL create IS the CAS);
    - contention blocks with backoff up to ``timeout`` (default 120 s
      — generous: the critical section is one small-file rewrite),
      then fails loud naming the holder; crashed holders are stolen by
      TTL with the same same-host-liveness rules as the table lock.

    Reentrant WITHIN a thread (r11): a serializable mutation commit
    holds it across the file swap + snapshot entry, and the manifest
    refresh inside that window takes it again — the nested acquire
    just bumps a depth counter; only the outermost release touches the
    lock file.  Never held across a Spark job — acquire, rewrite one
    JSON file (or, serializable-commit only, a handful of renames),
    release.  Lock ordering: table lock (long) → commit lock (micro);
    nothing acquires the table lock while holding this one, so there
    is no deadlock cycle.
    """

    #: per-process reentrancy registry: {abspath: {"thread": id,
    #: "depth": n}} — guarded by the GIL-atomic dict ops plus the fact
    #: that only the holding thread mutates its own entry
    _ACTIVE: dict = {}

    def __init__(
        self, dirpath: str, ttl: float = COMMIT_TTL,
        timeout: float = COMMIT_TIMEOUT,
    ) -> None:
        self.path = os.path.join(dirpath, COMMIT_LOCK_NAME)
        self.dirpath = dirpath
        self.ttl = float(ttl)
        self.timeout = float(timeout)
        self.token: "str | None" = None
        self._nested = False

    def __enter__(self) -> "metadata_commit_lock":
        key = os.path.abspath(self.path)
        cur = metadata_commit_lock._ACTIVE.get(key)
        if cur is not None and cur["thread"] == threading.get_ident():
            cur["depth"] += 1
            self._nested = True
            return self
        os.makedirs(self.dirpath, exist_ok=True)
        deadline = time.time() + self.timeout
        delay = 0.005
        while True:
            token = uuid.uuid4().hex
            try:
                fd = os.open(
                    self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                with os.fdopen(fd, "w") as f:
                    json.dump({
                        "pid": os.getpid(),
                        "host": socket.gethostname(),
                        "token": token,
                        "ts": time.time(),
                        "ttl": self.ttl,
                    }, f)
                self.token = token
                metadata_commit_lock._ACTIVE[key] = {
                    "thread": threading.get_ident(), "depth": 1,
                }
                return self
            except FileExistsError:
                cur = _read_lock_file(self.path)
                if cur is None:
                    continue  # released between exists and read
                if _lock_file_stale(self.path, cur):
                    _steal_lock_file(self.path)
                    continue
                if time.time() >= deadline:
                    raise ValidationError(
                        f"metadata commit lock at {self.dirpath} held "
                        f"by pid {cur.get('pid')} on {cur.get('host')} "
                        f"for over {self.timeout:.0f}s — the holder is "
                        "alive but wedged mid-commit; investigate, or "
                        f"remove {COMMIT_LOCK_NAME} if it is known dead"
                    )
                time.sleep(delay)
                delay = min(delay * 2, 0.25)

    def __exit__(self, *exc) -> None:
        key = os.path.abspath(self.path)
        if self._nested:
            cur = metadata_commit_lock._ACTIVE.get(key)
            if cur is not None:
                cur["depth"] -= 1
            self._nested = False
            return
        cur = metadata_commit_lock._ACTIVE.get(key)
        if cur is not None and cur["thread"] == threading.get_ident():
            if cur["depth"] > 1:  # outermost exited before a nested one?
                cur["depth"] -= 1
                return
            del metadata_commit_lock._ACTIVE[key]
        if self.token is None:
            return
        # Check-then-rename-then-verify: read the lock file FIRST and
        # only displace it when the token is ours.  If our lock was
        # TTL-stolen (this commit stalled past the TTL) a new holder's
        # lock is live — unconditionally renaming it aside would open a
        # window where a third process acquires and the restore link
        # fails, leaving TWO believers (r10 advice).  The remaining
        # read→rename race is a steal landing in between; the post-
        # rename re-verify below restores the stolen holder's file.
        cur = _read_lock_file(self.path)
        if cur is not None and cur.get("token") != self.token:
            self.token = None  # stolen — the new holder owns the file
            return
        aside = self.path + f".rel-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(self.path, aside)
        except FileNotFoundError:
            self.token = None
            return
        moved_ours = True
        try:
            with open(aside) as f:
                moved_ours = json.load(f).get("token") == self.token
        except (OSError, ValueError):
            pass
        if not moved_ours:
            try:
                os.link(aside, self.path)
            except OSError:
                pass
        try:
            os.remove(aside)
        except OSError:
            pass
        self.token = None
