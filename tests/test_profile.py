"""Column profiling — oracle + null/empty-edge tests."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_profile_orders_matches_duckdb():
    from go_datax_ray.stages.profile import profile_columns

    got = (
        profile_columns(rd.read_parquet(f"{SF}/orders.parquet"))
        .to_pandas().sort_values("col").reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH o AS (SELECT * FROM '{SF}/orders.parquet')
        SELECT 'o_orderkey' AS col, COUNT(*) AS n,
               COUNT(*) - COUNT(o_orderkey) AS nulls,
               MIN(o_orderkey) AS min_v, MAX(o_orderkey) AS max_v FROM o
        UNION ALL
        SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
               MIN(o_custkey), MAX(o_custkey) FROM o
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
               MIN(LENGTH(o_orderstatus)), MAX(LENGTH(o_orderstatus)) FROM o
        UNION ALL
        SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
               MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)),
               MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) FROM o
        UNION ALL
        SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
               MIN(epoch_us(o_orderdate)), MAX(epoch_us(o_orderdate)) FROM o
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
               MIN(LENGTH(o_orderpriority)), MAX(LENGTH(o_orderpriority)) FROM o
        """
    ).df().sort_values("col").reset_index(drop=True)
    assert got["col"].tolist() == want["col"].tolist()
    for c in ("n", "nulls", "min_v", "max_v"):
        assert got[c].tolist() == want[c].astype("int64").tolist(), c


def test_profile_nulls_and_all_null_column():
    from go_datax_ray.stages.profile import profile_columns

    t = pa.table(
        {
            "a": pa.array([1, None, 3], pa.int64()),
            "b": pa.array([None, None, None], pa.int64()),
            "s": pa.array(["xy", None, "zzzz"], pa.string()),
        }
    )
    out = (
        profile_columns(rd.from_arrow(t))
        .to_pandas().set_index("col")
    )
    assert out.loc["a", "nulls"] == 1 and out.loc["a", "min_v"] == 1
    assert out.loc["a", "max_v"] == 3
    assert out.loc["b", "nulls"] == 3  # all-null: min/max stay null
    assert pd.isna(out.loc["b", "min_v"]) or out.loc["b", "min_v"] is None
    assert out.loc["s", "min_v"] == 2 and out.loc["s", "max_v"] == 4
