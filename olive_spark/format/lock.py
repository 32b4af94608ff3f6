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
The lock carries owner/pid/host/ts/ttl; a holder that crashed leaves a
STALE lock which later acquirers steal once the TTL passes.  Reentrant
within a process (same pid+host re-acquires freely, with a depth
count), because ops compose — restore() calls _recover_pending(),
OliveTable.lock() callers call ops that lock.

Plain DSv2 appends do NOT take the lock: append commits are the hot
path and their snapshot-log append is last-entry-wins monotone; the
documented contract for concurrent APPENDERS stays "coordinate
externally", while mutation-vs-mutation — the corruption case — is
enforced here.
"""

from __future__ import annotations

import json
import os
import socket
import time

from olive_spark.format.errors import ValidationError

LOCK_NAME = "_olive_lock.json"
DEFAULT_TTL = 600.0

# pid -> {path: depth} reentrancy bookkeeping for this process
_held: dict = {}


def _lock_path(dirpath: str) -> str:
    return os.path.join(dirpath, LOCK_NAME)


def _read(dirpath: str) -> "dict | None":
    try:
        with open(_lock_path(dirpath)) as f:
            doc = json.load(f)
        return doc if isinstance(doc, dict) else {}
    except FileNotFoundError:
        return None
    except (OSError, ValueError):
        return {}  # unreadable → treat as foreign, steal only via TTL


def acquire(dirpath: str, ttl: float = DEFAULT_TTL) -> None:
    """Take (or re-enter) the table write lock; raises ValidationError
    naming the holder when another live writer has it."""
    os.makedirs(dirpath, exist_ok=True)
    me = (os.getpid(), socket.gethostname())
    key = os.path.abspath(dirpath)
    depth = _held.setdefault(me, {})
    if depth.get(key, 0) > 0:
        depth[key] += 1
        return
    p = _lock_path(dirpath)
    for _ in range(2):  # second pass after a stale steal
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({
                    "pid": me[0], "host": me[1],
                    "ts": time.time(), "ttl": float(ttl),
                }, f)
            depth[key] = 1
            return
        except FileExistsError:
            cur = _read(dirpath)
            if cur is None:
                continue  # released between exists and read — retry
            if (
                cur.get("pid") == me[0]
                and cur.get("host") == me[1]
            ):
                # our pid wrote it but this process lost the in-memory
                # depth (e.g. a prior crash-in-op within the same
                # process after an exception escaped release) — reclaim
                depth[key] = 1
                return
            ts = cur.get("ts")
            cur_ttl = cur.get("ttl", DEFAULT_TTL)
            if (
                isinstance(ts, (int, float))
                and time.time() - float(ts) > float(cur_ttl)
            ):
                # stale: holder crashed; remove and retry the O_EXCL
                # create (two stealers can both remove — only one wins
                # the create)
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
                continue
            raise ValidationError(
                f"table at {dirpath} is write-locked by "
                f"pid {cur.get('pid')} on {cur.get('host')} "
                f"(age {time.time() - float(ts or 0):.0f}s, "
                f"ttl {cur_ttl}s) — concurrent mutations corrupt the "
                "snapshot log; wait, or remove _olive_lock.json if the "
                "holder is known dead"
            )
    raise ValidationError(
        f"could not acquire write lock at {dirpath} (lost two steal "
        "races) — retry"
    )


def release(dirpath: str) -> None:
    me = (os.getpid(), socket.gethostname())
    key = os.path.abspath(dirpath)
    depth = _held.get(me, {})
    n = depth.get(key, 0)
    if n > 1:
        depth[key] = n - 1
        return
    depth.pop(key, None)
    cur = _read(dirpath)
    if cur and cur.get("pid") == me[0] and cur.get("host") == me[1]:
        try:
            os.remove(_lock_path(dirpath))
        except FileNotFoundError:
            pass


class table_write_lock:
    """``with table_write_lock(path):`` — reentrant advisory lock."""

    def __init__(self, dirpath: str, ttl: float = DEFAULT_TTL) -> None:
        self.dirpath = dirpath
        self.ttl = ttl

    def __enter__(self) -> "table_write_lock":
        acquire(self.dirpath, self.ttl)
        return self

    def __exit__(self, *exc) -> None:
        release(self.dirpath)
