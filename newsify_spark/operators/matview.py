"""Incrementally maintained materialized views over the transaction
log's change-data feed — O(changes) refresh, never O(table).

The reference keeps derived aggregates fresh by re-running the full
aggregation against MongoDB on a poll loop (batch-cluster-service.py's
rollup queries re-scan the collections each cycle). At 100 TB a
re-aggregation per refresh is the dominant cost of the whole pipeline;
every warehouse solves it with incremental view maintenance (public
designs: Delta Live Tables' incremental computation, Materialize /
DBSP's delta queries, the classic counting algorithm of Gupta &
Mumick, SIGMOD '93). This module implements IVM for the aggregate
shapes that are SELF-MAINTAINABLE under inserts AND deletes — COUNT and
SUM (and anything derivable from them: AVG = SUM/COUNT) — on top of two
primitives the transaction log already provides:

- :func:`~newsify_spark.operators.txnlog.read_changes` supplies the
  exact delta stream (insert/delete row images per commit, cost bounded
  by the commits' copy-on-write blast radius);
- the ``txn`` high-water marker makes refresh EXACTLY-ONCE: the source
  version a refresh consumed through is committed ATOMICALLY with the
  refreshed rows (same commit entry), so a crashed/replayed refresh can
  never double-apply a delta — the same transactional-marker contract
  the streaming sink uses.

Refresh plan shape: one ``read_changes`` scan (blast radius), one
groupBy over the delta rows (map-side combinable — a billion-row delta
collapses to |affected groups| partials), one file-granular COW merge
into the view (only view files holding an affected group are
rewritten, located by the same stats-pruned semi-join every MERGE
uses). A group whose incremental count reaches zero is DELETED from the
view, so the view equals the full re-aggregation row-for-row.

Limits (documented, not silent): MIN/MAX are not self-maintainable
under deletes (a retracted maximum needs the base table to find the
runner-up) and are rejected at create time; measure columns follow
additive semantics — a group whose measures are partly null tracks
``SUM(coalesce(x, 0))`` (exact SQL NULL-sum semantics are preserved
only while a group's measure set stays entirely null or entirely
non-null). Group keys must be non-null-safe join-stable; null group
keys are supported via null-safe equality.

Scale notes (100 TB): refresh cost is O(blast radius of the consumed
commits) + O(view files holding affected groups) — independent of both
source and view size for point-y workloads. The view itself is a
transaction-log table: snapshot-isolated reads, time travel, its OWN
change feed (so views chain), OPTIMIZE/vacuum all apply.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T

_CONFIG = "_matview.json"
_APP_PREFIX = "_matview::"


def _config_path(mv_path: str) -> str:
    return os.path.join(T._log_path(mv_path), _CONFIG)


def _load_config(mv_path: str) -> dict:
    p = _config_path(mv_path)
    if not os.path.isfile(p):
        raise ValueError(f"no materialized-view config at {mv_path}")
    with open(p) as fh:
        return json.load(fh)


def _aggregate(
    df: DataFrame, group_cols: list[str], sums: dict[str, str], count_col: str
) -> DataFrame:
    """The view's defining aggregation, used for the initial
    materialization (and by tests as the full-recompute oracle)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[
            F.sum(F.coalesce(F.col(src), F.lit(0))).alias(out)
            for out, src in sums.items()
        ],
    )


def create_matview(
    spark: SparkSession,
    mv_path: str,
    source_path: str,
    group_cols: list[str],
    sums: dict[str, str] | None = None,
    count_col: str = "n_rows",
) -> int:
    """Materialize ``SELECT group_cols, count(*) AS count_col,
    sum(src) AS out... FROM source GROUP BY group_cols`` as a
    transaction-log table that :func:`refresh_matview` maintains
    incrementally. ``sums`` maps output column -> source measure column
    (additive only — see module docstring for the MIN/MAX rejection).

    The source snapshot version the view reflects is pinned BEFORE the
    aggregation reads it and committed atomically with the data via the
    txn marker, so the first refresh consumes exactly the commits the
    create did not see."""
    sums = dict(sums or {})
    for out in sums:
        if out == count_col:
            raise ValueError(f"sum output {out!r} collides with count_col")
    src_head = T._next_version(source_path) - 1
    if src_head < 0:
        raise ValueError(f"no source table at {source_path}")
    base = T.read_table(spark, source_path, version=src_head)
    agg = _aggregate(base, group_cols, sums, count_col)
    v = T.create_table(
        spark,
        mv_path,
        agg,
        txn={"app_id": _APP_PREFIX + "source", "batch_id": src_head},
    )
    cfg = {
        "source_path": os.path.abspath(source_path),
        "group_cols": list(group_cols),
        "sums": sums,
        "count_col": count_col,
    }
    with open(_config_path(mv_path), "w") as fh:
        json.dump(cfg, fh)
    return v


def last_refreshed_source_version(mv_path: str) -> int:
    """The source commit version the view provably reflects — read from
    the txn high-water marker, O(CHECKPOINT_EVERY) log entries."""
    mark = T.last_committed_batch(mv_path, _APP_PREFIX + "source")
    if mark is None:
        raise ValueError(f"{mv_path} carries no materialized-view marker")
    return mark


def refresh_matview(
    spark: SparkSession,
    mv_path: str,
    source_path: str | None = None,
    to_version: int | None = None,
) -> int | None:
    """Advance the view to the source's current head by applying ONLY
    the change feed since the last refresh (Gupta-Mumick counting):
    per affected group, delta_count = Σ sign and delta_sum = Σ sign·x
    with sign = +1 for insert / -1 for delete images, merged into the
    view file-granularly; groups whose count reaches zero are removed.
    Returns the view's new commit version, or None when the view is
    already current. Exactly-once: the consumed source version rides
    the SAME commit as the merged rows, so replays are no-ops and a
    concurrent refresh loses the version CAS (ConcurrentWriteError).

    ``to_version`` bounds the refresh at a specific source commit
    (instead of the head) — the streaming cadence
    :func:`newsify_spark.streaming.cdf.follow_matview` uses to advance
    the view one commit chunk at a time."""
    cfg = _load_config(mv_path)
    src = source_path or cfg["source_path"]
    group_cols = cfg["group_cols"]
    sums: dict[str, str] = cfg["sums"]
    count_col = cfg["count_col"]
    applied = last_refreshed_source_version(mv_path)
    src_head = T._next_version(src) - 1
    if to_version is not None:
        if to_version > src_head:
            raise ValueError(
                f"to_version={to_version} is beyond the source head "
                f"{src_head}"
            )
        src_head = to_version
    if src_head <= applied:
        return None  # already current
    # Pin the view's target version BEFORE reading its snapshot (the
    # same lost-update guard every txnlog mutation uses).
    v = T._next_version(mv_path)
    marker = {"app_id": _APP_PREFIX + "source", "batch_id": src_head}
    entries = T._read_log(src, upto=src_head, since=applied + 1)
    if not any(e["add"] or e["remove"] or e.get("dv") for e in entries):
        # structurally a no-op range: advance the marker, move no data
        state = T._snapshot_state(mv_path, upto=v - 1)
        T._commit(mv_path, v, "mv_refresh", [], [], state["columns"],
                  txn=marker)
        return v
    changes = T.read_changes(spark, src, applied + 1, src_head)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = changes.groupBy(*group_cols).agg(
        F.sum(sign).alias(f"_d_{count_col}"),
        *[
            F.sum(F.coalesce(F.col(s), F.lit(0)) * sign).alias(f"_d_{out}")
            for out, s in sums.items()
        ],
    )
    delta = delta.localCheckpoint(eager=True)  # sever lineage from source
    victims = T._affected_files(spark, mv_path, delta, group_cols,
                                version=v - 1)
    state = T._snapshot_state(mv_path, upto=v - 1)
    cols = state["columns"]
    if victims:
        # Null-safe full-outer merge: bystander groups in victim files
        # pass through (delta side null => +0), brand-new groups enter
        # from the delta side, zero-count groups drop out (the
        # incremental DELETE).
        old = T._read_files_aligned(
            spark, mv_path, victims, cols, dvs=state["dvs"]
        )
        cond = None
        for g in group_cols:
            c = old[g].eqNullSafe(delta[g])
            cond = c if cond is None else cond & c
        merged = old.join(delta, cond, "full_outer").select(
            *[F.coalesce(old[g], delta[g]).alias(g) for g in group_cols],
            (
                F.coalesce(old[count_col], F.lit(0))
                + F.coalesce(delta[f"_d_{count_col}"], F.lit(0))
            ).alias(count_col),
            *[
                (
                    F.coalesce(old[out], F.lit(0))
                    + F.coalesce(delta[f"_d_{out}"], F.lit(0))
                ).alias(out)
                for out in sums
            ],
        ).filter(F.col(count_col) > 0)
    else:
        # no view file holds an affected group (all-new groups, or the
        # view is empty): the merge degenerates to the delta itself —
        # sum(coalesce(x,0)*sign) and sum(sign) carry exactly the types
        # the create-time sum(coalesce(x,0)) and count(*) produced
        merged = delta.select(
            *group_cols,
            F.col(f"_d_{count_col}").alias(count_col),
            *[F.col(f"_d_{out}").alias(out) for out in sums],
        ).filter(F.col(count_col) > 0)
    files, stats = T._write_data(spark, mv_path, merged.select(*cols), v)
    T._commit(mv_path, v, "mv_refresh", files, victims, cols, txn=marker,
              stats=stats)
    return v
