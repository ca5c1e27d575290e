"""Tracked persist() for relations whose cache must outlive their
builder function.

The capped candidate generators (operators/dedup.py: LSH bands, SimHash
bands, CC edges) and the LR trainer persist an intermediate relation so
two consumer branches (count-filter + collect, or an iterative loop)
share one computation. Because the builders return LAZY DataFrames, the
cache cannot be unpersisted inside the builder — it must stay alive
until the caller materializes the result. Left untracked, those caches
accumulate for the life of the session (ADVICE r7: the leak forced a
clearCache() workaround in scripts/gen_plans.py).

This registry makes the lifetime explicit and centrally releasable:
builders call :func:`persist_tracked`, and long-lived drivers (bench.py
between queries, scripts/gen_plans.py between plan snapshots, any
service embedding the operators) call :func:`release_caches` at their
natural checkpoint. Spark's LRU eviction remains the backstop in
between — the registry bounds the steady state, it does not change
query semantics or plans.
"""

from __future__ import annotations

import atexit
import logging
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)
#: guards _LIVE: persist_tracked can run on a streaming foreachBatch
#: thread while the driver thread calls release_caches (ADVICE r8 —
#: unsynchronized, a registration could be lost or unpersisted early)
_LOCK = threading.Lock()
_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for a later :func:`release_caches`."""
    out = df.persist()
    with _LOCK:
        _LIVE.append(out)
    return out


def tracked_mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` + ``atexit``-registered ``rmtree``.

    The ONLY sanctioned way for a query path to mint a scratch
    directory (stream sinks, file-source staging, upsert/SCD2 state
    roots): a raw ``mkdtemp`` leaks one tree per invocation across
    repeated bench/pytest runs (ADVICE r10, regressed and re-flagged
    ADVICE r11 — ``tests/test_plan_shape.py`` greps that no query
    module calls ``tempfile.mkdtemp`` directly anymore). Removal at
    interpreter exit keeps the dir alive for the whole session, which
    the lazily-read stream sinks require.
    """
    base = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


def release_caches() -> int:
    """Unpersist every tracked relation; returns how many were live.

    Safe to call at any point where no tracked query is mid-flight
    (between bench queries, between plan snapshots, after a batch of
    dedup work). Unpersisting is non-blocking and idempotent. A
    stopped/unreachable session is expected here (end-of-run
    teardown) and skipped silently; anything else is logged — never
    raised, a cleanup path must not fail the caller.
    """
    with _LOCK:
        live, _LIVE[:] = _LIVE[:], []
    n = len(live)
    for df in live:
        try:
            df.unpersist()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if not (
                "stopped" in msg.lower()
                or "cancelled" in msg.lower()
                or "shutdown" in msg.lower()
            ):
                _LOG.warning("release_caches: unpersist failed: %s", e)
    return n
