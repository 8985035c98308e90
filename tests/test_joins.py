"""Broadcast / bucketed hash / semi / anti joins + partial aggregation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_broadcast_join_matches_sql():
    from go_datax_ray.stages.joins import broadcast_join

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename_columns(["o_custkey", "c_mktsegment"])
    got = broadcast_join(orders, cust, on="o_custkey").to_pandas()
    want = duckdb.sql(
        f"""SELECT o_orderkey, c_mktsegment FROM '{SF}/orders.parquet'
            JOIN '{SF}/customer.parquet' ON o_custkey = c_custkey"""
    ).df()
    assert len(got) == len(want)
    g = got.sort_values("o_orderkey").reset_index(drop=True)
    w = want.sort_values("o_orderkey").reset_index(drop=True)
    assert (g["c_mktsegment"] == w["c_mktsegment"]).all()


def test_broadcast_left_join_keeps_unmatched():
    from go_datax_ray.stages.joins import broadcast_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    small = pd.DataFrame({"k": [1, 3], "b": ["B1", "B3"]})
    out = broadcast_join(left, small, on="k", how="left").to_pandas().sort_values("k")
    assert out["b"].isna().tolist() == [False, True, False]


def test_bucket_hash_join_inner_and_left():
    from go_datax_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "a": ["w", "x", "y", "z"]}))
    right = rd.from_arrow(pa.table({"k": [2, 4, 5], "b": ["B2", "B4", "B5"]}))
    inner = bucket_hash_join(left, right, on="k", n_buckets=4).to_pandas().sort_values("k")
    assert inner["k"].tolist() == [2, 4]
    assert inner["b"].tolist() == ["B2", "B4"]
    lj = bucket_hash_join(left, right, on="k", n_buckets=4, how="left").to_pandas().sort_values("k")
    assert lj["k"].tolist() == [1, 2, 3, 4]
    assert lj["b"].isna().tolist() == [True, False, True, False]


def test_bucket_hash_join_string_key_duplicates():
    from go_datax_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({"k": ["a", "a", "b"], "n": [1, 2, 3]}))
    right = rd.from_arrow(pa.table({"k": ["a", "b", "b"], "m": [10, 20, 30]}))
    out = bucket_hash_join(left, right, on="k", n_buckets=3).to_pandas()
    # cross product within key groups: a:2x1 + b:1x2 = 4 rows
    assert len(out) == 4


def test_semi_anti_partition():
    from go_datax_ray.stages.joins import semi_join

    ds = rd.from_arrow(pa.table({"k": [1, 2, 3, 4, 5]}))
    s = semi_join(ds, [2, 4], on="k").to_pandas()["k"].tolist()
    a = semi_join(ds, [2, 4], on="k", anti=True).to_pandas()["k"].tolist()
    assert sorted(s) == [2, 4] and sorted(a) == [1, 3, 5]


def test_partial_agg_matches_full():
    from go_datax_ray.stages.joins import partial_agg_sum
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    out = partial_agg_sum(
        ds, key="l_returnflag",
        value_expr=lambda t: pc.cast(t.column("l_quantity"), pa.int64()),
        out_col="sum_qty",
    ).to_pandas().sort_values("l_returnflag")
    want = duckdb.sql(
        f"""SELECT l_returnflag, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
            FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert out["sum_qty"].tolist() == want["sum_qty"].tolist()


def test_salted_join_equals_unsalted():
    from go_datax_ray.stages.joins import bucket_hash_join

    rng = np.random.default_rng(5)
    # hot key: 60% of left rows share key 7
    lk = np.where(rng.random(2000) < 0.6, 7, rng.integers(0, 50, 2000))
    left = rd.from_arrow(pa.table({"k": pa.array(lk, pa.int64()),
                                   "n": pa.array(np.arange(2000), pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array(np.arange(50), pa.int64()),
                                    "m": pa.array(np.arange(50) * 10, pa.int64())}))
    plain = bucket_hash_join(left, right, on="k", n_buckets=8).to_pandas()
    salted = bucket_hash_join(left, right, on="k", n_buckets=8, n_salts=4).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "n", "m"]].values.tolist()))
    assert key(salted) == key(plain)
    lj_salt = bucket_hash_join(left, right, on="k", n_buckets=8, n_salts=4, how="left").to_pandas()
    assert len(lj_salt) == 2000


def test_hot_key_salted_join_equals_unsalted():
    """salt_keys: fan out ONLY the hot keys — explicit list and 'auto'
    detection both produce exactly the unsalted result, including left
    joins with unmatched rows and semi/anti."""
    from go_datax_ray.stages.joins import bucket_hash_join, detect_hot_keys

    rng = np.random.default_rng(9)
    # key 7 carries ~60% of 3000 left rows; keys 0..49 exist on the right
    lk = np.where(rng.random(3000) < 0.6, 7, rng.integers(0, 60, 3000))
    left = rd.from_arrow(pa.table({"k": pa.array(lk, pa.int64()),
                                   "n": pa.array(np.arange(3000), pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array(np.arange(50), pa.int64()),
                                    "m": pa.array(np.arange(50) * 10, pa.int64())}))
    hot = detect_hot_keys(left, "k", threshold=500)
    assert len(hot) == 1  # only key 7 crosses the threshold
    plain = bucket_hash_join(left, right, on="k", n_buckets=8).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "n", "m"]].values.tolist()))
    for sk in ([7], "auto"):
        salted = bucket_hash_join(left, right, on="k", n_buckets=8,
                                  n_salts=4, salt_keys=sk,
                                  hot_threshold=500).to_pandas()
        assert key(salted) == key(plain)
    # left join: unmatched keys (50..59) survive exactly once
    lj = bucket_hash_join(left, right, on="k", n_buckets=8, n_salts=4,
                          salt_keys=[7], how="left").to_pandas()
    assert len(lj) == 3000
    # semi/anti under selective salting
    semi = bucket_hash_join(left, right, on="k", n_buckets=8, n_salts=4,
                            salt_keys=[7], how="semi").to_pandas()
    assert len(semi) == int((lk < 50).sum())
    anti = bucket_hash_join(left, right, on="k", n_buckets=8, n_salts=4,
                            salt_keys=[7], how="anti").to_pandas()
    assert len(anti) == int((lk >= 50).sum())
    # empty hot set degrades to the unsalted plan, same output
    none_hot = bucket_hash_join(left, right, on="k", n_buckets=8, n_salts=4,
                                salt_keys=[], how="inner").to_pandas()
    assert key(none_hot) == key(plain)


def test_bucket_hash_join_preserves_int_dtypes():
    """VERDICT r1 #1: union null-fill must not leak float64 into int columns,
    and int64 values > 2^53 must survive a left join exactly."""
    from go_datax_ray.stages.joins import bucket_hash_join

    big = 2**53 + 1  # not representable in float64
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "n32": pa.array([10, 20, 30], pa.int32()),
                "big": pa.array([big, big + 2, big + 4], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 3], pa.int64()), "r64": pa.array([7, 9], pa.int64())})
    )
    inner = bucket_hash_join(left, right, on="k", n_buckets=4)
    sch = inner.schema().base_schema
    assert sch.field("n32").type == pa.int32()
    assert sch.field("big").type == pa.int64()
    assert sch.field("r64").type == pa.int64()
    df = inner.to_pandas().sort_values("k")
    assert df["big"].tolist() == [big, big + 4]
    # left join: unmatched right int column is NULL, dtype stays integral
    lj = bucket_hash_join(left, right, on="k", n_buckets=4, how="left")
    assert lj.schema().base_schema.field("r64").type == pa.int64()
    ldf = lj.to_pandas().sort_values("k")
    assert ldf["big"].tolist() == [big, big + 2, big + 4]
    assert ldf["r64"].isna().tolist() == [False, True, False]


def test_bucket_hash_join_overlapping_column_suffix():
    from go_datax_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
    right = rd.from_arrow(pa.table({"k": [1, 2], "v": [100, 200]}))
    out = bucket_hash_join(left, right, on="k", n_buckets=2).to_pandas().sort_values("k")
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert out["v"].tolist() == [10, 20]
    assert out["v_r"].tolist() == [100, 200]


def test_asof_join_semantics():
    from go_datax_ray.stages.joins import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([5, 15, 25, 10, 10], pa.int64()),
        "n": pa.array([0, 1, 2, 3, 4], pa.int32()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([10, 20, 10], pa.int64()),
        "px": pa.array([100, 200, 300], pa.int64()),
    }))
    out = asof_join(left, right, by="k", on="ts", n_buckets=4).to_pandas()
    out = out.sort_values("n").reset_index(drop=True)
    # k=1: ts=5 -> no match; ts=15 -> 100; ts=25 -> 200
    # k=2: ts=10 -> exact match 300; k=3: key absent -> null
    assert out["px"].isna().tolist() == [True, False, False, False, True]
    assert out["px"].dropna().tolist() == [100.0, 200.0, 300.0] or \
        out["px"].dropna().tolist() == [100, 200, 300]
    # int dtype preserved despite null-fill
    sch = asof_join(left, right, by="k", on="ts", n_buckets=4).schema().base_schema
    assert sch.field("px").type == pa.int64()
    assert sch.field("n").type == pa.int32()


def test_range_join_bins_and_bounds():
    from go_datax_ray.stages.joins import range_join

    left = rd.from_arrow(pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "v": pa.array([0.0, 9.999, 10.0, 35.0], pa.float64()),
    }))
    # interval spanning several bins + exclusive-hi boundary checks
    right = rd.from_arrow(pa.table({
        "band": pa.array([0, 1], pa.int64()),
        "lo": pa.array([0.0, 5.0], pa.float64()),
        "hi": pa.array([10.0, 40.0], pa.float64()),
    }))
    out = range_join(left, right, value_col="v", lo_col="lo", hi_col="hi",
                     bin_width=10.0).to_pandas()
    pairs = set(zip(out["id"], out["band"]))
    # v=0.0 in [0,10) and not [5,40)? 0<5 -> band 0 only
    # v=9.999 in both; v=10.0 excluded from [0,10) (hi exclusive), in [5,40)
    # v=35.0 only in [5,40)
    assert pairs == {(0, 0), (1, 0), (1, 1), (2, 1), (3, 1)}


def test_bucket_hash_join_right_and_full_outer():
    from go_datax_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                   "a": pa.array([10, 20], pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([2, 3], pa.int64()),
                                    "b": pa.array([200, 300], pa.int64())}))
    rj = bucket_hash_join(left, right, on="k", n_buckets=4, how="right").to_pandas()
    rj = rj.sort_values("k").reset_index(drop=True)
    assert rj["k"].tolist() == [2, 3]
    assert rj["a"].isna().tolist() == [False, True]
    fj = bucket_hash_join(left, right, on="k", n_buckets=4, how="full").to_pandas()
    fj = fj.sort_values("k").reset_index(drop=True)
    assert fj["k"].tolist() == [1, 2, 3]
    assert fj["a"].isna().tolist() == [False, False, True]
    assert fj["b"].isna().tolist() == [True, False, False]
    # dtype preserved through the outer null-fills
    sch = bucket_hash_join(left, right, on="k", n_buckets=4, how="full").schema().base_schema
    assert sch.field("a").type == pa.int64() and sch.field("b").type == pa.int64()
    import pytest as _pt

    with _pt.raises(ValueError, match="n_salts"):
        bucket_hash_join(left, right, on="k", how="full", n_salts=2)


def test_bucket_join_semi_anti_and_remove_keys():
    """In-cluster EXISTS/NOT EXISTS (VERDICT r2 finding #1): bucket
    semi/anti joins keep only left columns, never duplicate left rows on
    right multiplicity, and remove_keys' two paths (broadcast refs vs
    bucketed anti-join) agree."""
    from go_datax_ray.stages.joins import bucket_hash_join, remove_keys

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array(["a", "b", "c", "d"]),
    }))
    # duplicate right key 2: semi must not duplicate left row 2
    right = rd.from_arrow(pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())}))
    semi = bucket_hash_join(left, right, on="k", n_buckets=4, how="semi").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert list(semi.columns) == ["k", "payload"]
    anti = bucket_hash_join(left, right, on="k", n_buckets=4, how="anti").to_pandas()
    assert sorted(anti["k"]) == [1, 3]
    # dtype intact through the filter
    sch = bucket_hash_join(left, right, on="k", n_buckets=4, how="anti").schema().base_schema
    assert sch.field("k").type == pa.int64()

    # remove_keys: broadcast path vs forced anti-join path agree
    keys = rd.from_arrow(pa.table({"k": pa.array([2, 4], pa.int64())}))
    a = remove_keys(left, keys, on="k").to_pandas()
    b = remove_keys(left, keys, on="k", broadcast_limit=0).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"]) == [1, 3]
    # empty key set is the identity
    none = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert remove_keys(left, none, on="k").count() == 4


def test_exact_dedup_anti_join_path_matches_broadcast():
    """exact_dedup output is identical whether losers are removed via
    the broadcast-refs path or the bucketed anti-join (broadcast_limit=0
    forces the big-loser-set code path)."""
    from go_datax_ray.stages.dedup import exact_dedup

    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"doc {i % 10}" for i in range(40)]),
    })
    a = exact_dedup(rd.from_arrow(docs)).to_pandas().sort_values("doc_id")
    b = exact_dedup(rd.from_arrow(docs), broadcast_limit=0).to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist() == list(range(10))


def test_composite_key_bucket_join_left_with_nulls():
    """Multi-column key: LEFT join with unmatched rows keeps exact int64
    dtype (null, not NaN-float) on the right columns."""
    from go_datax_ray.stages.joins import bucket_hash_join

    left = pa.table({
        "u": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "t": ["a", "b", "a", "c", "a"],
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })
    right = pa.table({
        "u": pa.array([1, 2, 9], pa.int64()),
        "t": ["a", "c", "a"],
        "n": pa.array([100, 200, 900], pa.int64()),
    })
    joined = bucket_hash_join(
        rd.from_arrow(left), rd.from_arrow(right), on=["u", "t"],
        how="left", n_buckets=4,
    )
    assert str(joined.schema().base_schema.field("n").type) == "int64"
    out = joined.to_pandas().sort_values("event_id").reset_index(drop=True)
    # (1,a)->100, (2,c)->200, the other three rows unmatched -> null
    assert out.loc[out.event_id == 10, "n"].iloc[0] == 100
    assert out.loc[out.event_id == 13, "n"].iloc[0] == 200
    assert out["n"].isna().sum() == 3


def test_composite_key_semi_anti_exact():
    """Composite semi/anti use real-key membership (indicator merge),
    not hash equality — verified against DuckDB EXISTS/NOT EXISTS."""
    import duckdb

    from go_datax_ray.stages.joins import bucket_hash_join

    left = pa.table({
        "u": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "t": ["a", "b", "a", "c", "a", "b"],
        "v": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    })
    right = pa.table({
        "u": pa.array([1, 2, 3], pa.int64()),
        "t": ["a", "c", "zzz"],
    })
    left_pd, right_pd = left.to_pandas(), right.to_pandas()
    for how, neg in (("semi", ""), ("anti", "NOT")):
        out = (
            bucket_hash_join(
                rd.from_arrow(left), rd.from_arrow(right), on=["u", "t"],
                how=how, n_buckets=4,
            )
            .to_pandas().sort_values("v").reset_index(drop=True)
        )
        want = duckdb.sql(f"""
            SELECT u, t, v FROM left_pd l
            WHERE {neg} EXISTS (SELECT 1 FROM right_pd r
                                WHERE r.u = l.u AND r.t = l.t)
            ORDER BY v
        """).df()
        assert out["v"].tolist() == want["v"].tolist(), (how, out, want)


def test_composite_key_broadcast_join():
    from go_datax_ray.stages.joins import broadcast_join

    left = pa.table({
        "u": pa.array([1, 2, 3], pa.int64()),
        "t": ["a", "b", "a"],
    })
    small = pa.table({
        "u": pa.array([1, 3], pa.int64()),
        "t": ["a", "a"],
        "tag": ["x", "y"],
    })
    out = (
        broadcast_join(rd.from_arrow(left), small, on=["u", "t"], how="left")
        .to_pandas().sort_values("u")
    )
    assert out["tag"].tolist() == ["x", None, "y"]
