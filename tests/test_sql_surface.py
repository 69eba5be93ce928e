"""The SQL front door: users can run plain ANSI SQL over the registered
fixture views and get the same answers as the DataFrame queries."""

from __future__ import annotations

from tests.conftest import SF_DIR, _canon

from newsify_spark.queries import REGISTRY
from newsify_spark.tables import register_views


def test_sql_matches_dataframe_query(spark):
    register_views(spark, SF_DIR)
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               CAST(count(*) AS BIGINT)  AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = REGISTRY["rel_pricing_summary"].fn(spark, SF_DIR).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    got, want = _canon(sql_df.toPandas()), _canon(df.toPandas())
    assert got.equals(want)


def test_sql_over_events_view_normalized_ts(spark):
    """The events view carries the micros-normalized ts (not raw nanos)."""
    register_views(spark, SF_DIR)
    row = spark.sql("SELECT min(ts) AS mn, max(ts) AS mx FROM events").first()
    assert row["mn"].year >= 1990 and row["mx"].year <= 2100
