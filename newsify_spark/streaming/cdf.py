"""Streaming change-data-feed source over the transaction log — commit
versions as stream offsets (Delta's CDF streaming source / Iceberg's
incremental read, public designs).

The batch side already exists: ``operators.txnlog.read_changes`` turns a
commit range into (_change_type, _commit_version, row) rows whose cost
is the range's copy-on-write blast radius, never table size. This
module is the INCREMENTAL delivery loop around it: a reader tracks the
last commit version it has processed (its offset), and each micro-batch
is ``read_changes(last+1, head)`` — so downstream consumers (the BM25
index sync ``operators.bm25.sync_bm25_from_changes``, the curation
pipeline ``operators.curation``) follow a living table commit by commit
instead of rebuilding.

Exactly-once composes from parts that already exist: the feed's batch
ids ARE commit versions (replays re-deliver the same rows — read_changes
is a pure function of the log), and a consumer that lands results in
another txnlog table via ``idempotent_append(app_id, batch_id=hi)``
de-duplicates replays with the transactional marker
(``operators/txnlog.py`` txn actions). That is the same contract
Spark's own foreachBatch + Delta txn sink pair gives.

Why not a custom StructuredStreaming Source class: PySpark has no
stable public API for third-party sources; the sanctioned pattern for
"stream from something Spark can't natively offset-track" is a driver
poll loop handing micro-batch DataFrames to a foreachBatch-shaped
consumer — which is exactly what Spark itself does internally, with the
offsets here being durable log versions instead of a checkpoint file.

Scale: each poll reads O(new commits' blast radius) data and the offset
state is one integer; a 1000-executor cluster runs the same loop with
the driver doing only log-listing I/O.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from newsify_spark.operators.txnlog import _read_log, _versions, read_changes


def stream_changes(
    spark: SparkSession,
    path: str,
    from_version: int = 1,
    to_version: int | None = None,
    batch_commits: int = 1,
) -> Iterator[tuple[int, int, DataFrame]]:
    """Yield the change feed as (lo, hi, changes) micro-batches of at
    most ``batch_commits`` commits each — the offsets a resumable
    consumer persists. Commits that touched no files (no-op deletes)
    are skipped, mirroring an empty micro-batch. ``to_version=None``
    snapshots the log head at call time (a tailing consumer calls again
    with ``from_version = last_hi + 1``)."""
    if batch_commits < 1:
        raise ValueError("batch_commits must be >= 1")
    head = to_version if to_version is not None else max(_versions(path), default=-1)
    vs = [v for v in _versions(path) if from_version <= v <= head]
    # No-op chunks (commits whose add AND remove lists are empty and
    # that attach no deletion vector) are detected STRUCTURALLY from the
    # log entries, one log read for the whole range — never by
    # swallowing read_changes' ValueError, which would silently drop a
    # micro-batch on any other raise path (the footer-probe cap, a
    # future validation) and lose data the consumer cannot detect
    # (ADVICE r11 #4). A DV-only commit has empty add/remove but very
    # much changes rows — its delete images must be delivered.
    touched = {
        e["version"]: bool(e["add"] or e["remove"] or e.get("dv"))
        for e in _read_log(path, upto=head, since=from_version)
    }
    for i in range(0, len(vs), batch_commits):
        chunk = vs[i : i + batch_commits]
        lo, hi = chunk[0], chunk[-1]
        if not any(touched.get(v, False) for v in chunk):
            continue  # structurally a no-op chunk: nothing to deliver
        yield lo, hi, read_changes(spark, path, lo, hi)


def run_cdf_feed(
    spark: SparkSession,
    path: str,
    consumer: Callable[[DataFrame, int], None],
    from_version: int = 1,
    to_version: int | None = None,
    batch_commits: int = 1,
) -> int | None:
    """foreachBatch-shaped delivery: call ``consumer(batch_df,
    batch_id)`` for each micro-batch, batch_id = the chunk's high
    commit version (so a consumer writing through
    ``txnlog.idempotent_append(app_id=..., batch_id=batch_id)`` is
    exactly-once across crashes and replays). Returns the last
    delivered version — the offset to resume from — or None if the
    range held no deliverable batch."""
    last: int | None = None
    for _, hi, df in stream_changes(
        spark, path, from_version, to_version, batch_commits
    ):
        consumer(df, hi)
        last = hi
    return last


def follow_matview(
    spark: SparkSession,
    mv_path: str,
    to_version: int | None = None,
    batch_commits: int = 1,
) -> list[int]:
    """Tail the view's SOURCE table and refresh the materialized view
    once per commit chunk — streaming incremental view maintenance
    (the Delta Live Tables shape: a continuous pipeline keeping a
    derived aggregate fresh off the change feed). Each chunk advances
    the view to that chunk's high commit via
    ``refresh_matview(to_version=hi)``, so every intermediate view
    version is itself a consistent snapshot of the source AT a commit
    boundary (time travel over the VIEW replays the source's history in
    chunk-sized steps).

    Resumable and exactly-once for free: the view's txn marker IS the
    offset (``last_refreshed_source_version``), persisted atomically
    with each refresh's rows, so a crashed/replayed tailer re-runs
    no-op refreshes and a concurrent tailer loses the version CAS.
    Returns the view commit versions produced (empty when already
    current). Per-chunk cost is the chunk's copy-on-write blast radius
    plus the view files holding affected groups — a tailing view over a
    100 TB source does O(commit delta) work per wake-up, never
    O(table)."""
    from newsify_spark.operators.matview import (
        _load_config,
        last_refreshed_source_version,
        refresh_matview,
    )

    cfg = _load_config(mv_path)
    src = cfg["source_path"]
    applied = last_refreshed_source_version(mv_path)
    out: list[int] = []
    head = to_version if to_version is not None else max(
        _versions(src), default=-1
    )
    vs = [v for v in _versions(src) if applied + 1 <= v <= head]
    for i in range(0, len(vs), batch_commits):
        chunk = vs[i : i + batch_commits]
        v = refresh_matview(spark, mv_path, to_version=chunk[-1])
        if v is not None:
            out.append(v)
    return out
