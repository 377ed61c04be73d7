"""Scoped cache cleanup for direct library consumers.

Query functions persist bounded intermediates (per-key count tables,
shared scan bases) that their returned DataFrame references lazily —
they cannot unpersist inside the function without re-executing the
branch, so harness callers (the driver, bench.py, the sweeps) call
``spark.catalog.clearCache()`` between queries. That left a footgun
for a DIRECT library consumer running many queries in one session
(r8/r9 advice): persisted blocks accumulate MEMORY_AND_DISK spill
until Spark's LRU starts evicting.

``cache_scope()`` closes it: every ``DataFrame.persist()`` issued
while the scope is active is recorded, and on exit each recorded
DataFrame is unpersisted (non-blocking). Unpersist drops only the
materialized blocks — plans stay valid and a later action simply
recomputes the branch — so the idiom is::

    from filemapreduce_spark import cache_scope

    with cache_scope():
        df = registry["neardup_minhash_lsh"].fn(spark, sf_dir)
        result = df.collect()          # action INSIDE the scope
    # session now holds zero pinned blocks from this query

Scopes nest: an inner scope's persists are unpersisted at the inner
exit only (double-unpersist is harmless if an outer scope also saw
them, but registration goes to the innermost scope). Tracking is by
patching ``persist`` on the concrete DataFrame class(es) while at
least one scope is active — PySpark 4 instances are
``pyspark.sql.classic.dataframe.DataFrame``, which OVERRIDES the
``pyspark.sql.DataFrame`` parent's ``persist``, so the patch targets
every class in the hierarchy that owns one.

Thread safety (r10 advice): the scope STACK is thread-local — a
persist is registered into the innermost scope of the thread that
issued it, so a scope exiting in one thread never unpersists another
thread's blocks, and scopes in different threads may overlap without
nesting. Only the patch install/remove is global, refcounted across
threads: the originals are restored when the LAST live scope in the
process exits. A thread with no active scope persists untracked, as
without the patch.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Callable

_lock = threading.RLock()
_tls = threading.local()
_active_scopes = 0  # across ALL threads; guarded by _lock
_originals: dict[type, Callable] = {}


def _stack() -> list:
    """This thread's scope stack (innermost last)."""
    s = getattr(_tls, "stack", None)
    if s is None:
        s = _tls.stack = []
    return s


def _persist_owners() -> list[type]:
    """Every DataFrame class that defines its own ``persist``.

    PySpark 4 split the API: ``pyspark.sql.DataFrame`` is the abstract
    parent and the classic (non-Connect) session instantiates
    ``pyspark.sql.classic.dataframe.DataFrame``, which overrides
    ``persist``. Patching only the parent would intercept nothing.
    """
    classes: list[type] = []
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

        classes.append(_ClassicDF)
    except ImportError:  # pragma: no cover - older/newer pyspark layout
        pass
    from pyspark.sql import DataFrame as _DF

    if _DF not in classes:
        classes.append(_DF)
    return [c for c in classes if "persist" in c.__dict__]


def _make_tracking(orig: Callable) -> Callable:
    def tracking_persist(self, *args, **kwargs):
        out = orig(self, *args, **kwargs)
        # register into the CALLING thread's innermost scope —
        # thread-local, so no cross-thread capture and no lock
        stack = _stack()
        if stack:
            stack[-1].append(out)
        return out

    tracking_persist._fmr_tracking = True  # type: ignore[attr-defined]
    return tracking_persist


@contextmanager
def cache_scope():
    """Unpersist every DataFrame persisted inside the scope at exit."""
    global _active_scopes
    mine: list = []
    with _lock:
        if _active_scopes == 0:
            for cls in _persist_owners():
                _originals[cls] = cls.persist
                cls.persist = _make_tracking(cls.persist)
        _active_scopes += 1
    _stack().append(mine)
    try:
        yield
    finally:
        _stack().remove(mine)
        with _lock:
            _active_scopes -= 1
            if _active_scopes == 0:
                for cls, orig in _originals.items():
                    cls.persist = orig
                _originals.clear()
        for df in mine:
            try:
                df.unpersist(blocking=False)
            except Exception:
                # a stopped session / already-freed block is fine:
                # the scope's contract is "no blocks left pinned"
                pass
