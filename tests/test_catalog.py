"""Catalog surface: register_views makes every table addressable by bare
name from spark.sql — the engine-facing model DuckDB's oracle side uses.
"""

from __future__ import annotations

from piper_spark.session import TABLE_NAMES, register_views, table
from tests.conftest import SF_SMOKE


def test_register_views_all_tables_queryable(spark):
    register_views(spark, SF_SMOKE)
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT count(*) AS c FROM {name}").collect()[0].c > 0


def test_registered_views_join_by_sql(spark):
    register_views(spark, SF_SMOKE)
    rows = spark.sql(
        """
        SELECT r_name, count(*) AS nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name
        """
    ).collect()
    assert sum(r.nations for r in rows) == 25  # all nations accounted for


def test_row_count_footer_path_matches_spark_count(spark):
    """session.row_count's parquet-footer fast path must agree with a
    real Spark count for every table, and memoize (round-5 VERDICT
    item 5: corpus-size derivation without a driver-side job)."""
    from piper_spark.session import _ROW_COUNT_MEMO, row_count

    for name in TABLE_NAMES:
        n = row_count(spark, SF_SMOKE, name)
        assert n == table(spark, SF_SMOKE, name).count()
        assert _ROW_COUNT_MEMO[(SF_SMOKE, name)] == n
