"""Session-bounded persisted-intermediate slots (r13).

Several operators materialize a multi-consumer intermediate with
``persist(StorageLevel.DISK_ONLY)`` — the lineage-safe posture for
frames that are corpus-sized at the 100 TB target (``localCheckpoint``
stores MEMORY_AND_DISK on executors AND severs lineage, so an executor
loss mid-query is unrecoverable and the blocks fight execution memory;
persist keeps the lineage recomputable and stays off-heap-pressure).

Persisted relations live in the CacheManager and are NOT GC-reclaimed
(unlike localCheckpoint RDDs, which the ContextCleaner frees once
unreferenced), and an operator returning a LAZY result cannot unpersist
before its caller materializes it. So each call site EVICTS the
previous call's relation under a named slot — disk held is bounded by
one relation per slot per session — and :func:`release_slot` frees
even that (bench rep boundaries, test teardown). This is exactly the
:data:`~.similarity._KNN_JOIN_CACHED` contract, shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def swap_persisted(slot: str, df: DataFrame) -> DataFrame:
    """persist(DISK_ONLY) ``df`` under ``slot``, evicting the slot's
    previous relation (if any). The fill stays LAZY — callers that can
    race two cold consumers must run one cheap action themselves."""
    from pyspark import StorageLevel

    prev = _SLOTS.get(slot)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    df = df.persist(StorageLevel.DISK_ONLY)
    _SLOTS[slot] = df
    return df


def release_slot(slot: str | None = None) -> None:
    """Unpersist one slot (or all slots with ``None``) early."""
    names = [slot] if slot is not None else list(_SLOTS)
    for name in names:
        df = _SLOTS.pop(name, None)
        if df is not None:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
