"""NULL-join-key differential sweep: the join/subquery family must
agree with DuckDB when join keys, grouping keys, and compared measures
carry NULLs — inner joins drop them, outer joins keep them unmatched,
NOT IN / anti joins hit three-valued logic, and the null-safe join is
the only shape that matches NULL to NULL.

Probed when first written: all shapes already agree (the engine leans
on standard SQL null semantics everywhere); kept as the permanent
regression net for the three-valued-logic surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.corpus_utils import SRC, make_sf_dir, sweep_queries

JOIN_QUERIES = (
    "join_revenue_by_nation",
    "left_join_order_counts",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "theta_join_acctbal",
    "full_outer_join_daily",
    "cross_join_region_pairs",
    "nullsafe_join_lang_buckets",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q18_large_order_customers",
    "q22_sales_opportunity",
    "merge_upsert_customer_balance",
    "exists_high_value_customers",
    "not_exists_urgent_order_customers",
    "scalar_subquery_above_avg_price",
    "tuple_in_subquery",
    "in_subquery_supplier_nations",
)


@pytest.fixture(scope="module")
def nullkeys_sf_dir(tmp_path_factory) -> str:
    src = pq.ParquetFile(f"{SRC}/customer.parquet").read().to_pydict()
    n = len(src["c_custkey"])
    for i in range(0, n, 7):
        src["c_custkey"][i] = None
    for i in range(0, n, 5):
        src["c_nationkey"][i] = None
    for i in range(0, n, 3):
        src["c_acctbal"][i] = None
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_nullkeys")), {"customer": pa.table(src)}
    )


def test_join_family_agrees_on_null_keys(spark, nullkeys_sf_dir):
    failures = sweep_queries(spark, nullkeys_sf_dir, JOIN_QUERIES)
    assert not failures, failures
