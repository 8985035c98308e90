"""Hash sampling, per-group top-k, HLL sketch."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.01"


def test_hash_sample_matches_duckdb_and_is_stable():
    from go_datax_ray.stages.sampling import hash_sample

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    got = sorted(hash_sample(ds, key="o_orderkey", rate=0.1).to_pandas()["o_orderkey"])
    want = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT o_orderkey FROM '{SF}/orders.parquet'
                WHERE md5_number_lower(CAST(o_orderkey AS VARCHAR)) % 1000000 < 100000
                ORDER BY o_orderkey"""
        ).fetchall()
    ]
    assert got == want
    assert 0.05 < len(got) / 15000 < 0.15
    # rerun identical (deterministic, unlike seeded RNG order-dependence)
    got2 = sorted(hash_sample(ds, key="o_orderkey", rate=0.1).to_pandas()["o_orderkey"])
    assert got2 == got
    # different salt -> different sample
    got3 = sorted(hash_sample(ds, key="o_orderkey", rate=0.1, salt="x").to_pandas()["o_orderkey"])
    assert got3 != got


def test_top_k_per_group_matches_sql():
    from go_datax_ray.stages.sampling import top_k_per_group

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    got = (
        top_k_per_group(ds, group="o_custkey", order="o_totalprice", k=2, tiebreak="o_orderkey")
        .to_pandas()
        .sort_values(["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rn
          FROM '{SF}/orders.parquet') WHERE rn <= 2
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        """
    ).df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()


def test_hll_accuracy_and_merge():
    from go_datax_ray.stages.sampling import HllSketch, approx_distinct
    from go_datax_ray.hashing import md5_lower64_array

    vals = [f"key-{i}" for i in range(10000)]
    h = md5_lower64_array(vals)
    sk = HllSketch(12)
    sk.add_hashes(h)
    est = sk.estimate()
    assert abs(est - 10000) / 10000 < 0.05
    # merge of halves == whole
    a, b = HllSketch(12), HllSketch(12)
    a.add_hashes(h[:5000]); b.add_hashes(h[5000:])
    assert a.merge(b).estimate() == est
    # duplicates don't inflate
    sk2 = HllSketch(12)
    sk2.add_hashes(np.concatenate([h, h, h]))
    assert sk2.estimate() == est
    # small-n linear counting regime
    small = HllSketch(12)
    small.add_hashes(md5_lower64_array([f"s{i}" for i in range(100)]))
    assert abs(small.estimate() - 100) < 5


def test_approx_distinct_dataset():
    from go_datax_ray.stages.sampling import approx_distinct

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, column="user_id")
    exact = duckdb.sql(f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'").fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_stratified_sample_matches_duckdb():
    from go_datax_ray.stages.sampling import stratified_sample

    ds = rd.read_parquet(f"{SF}/events.parquet")
    got = stratified_sample(
        ds, key="event_id", stratum="event_type",
        rates={"click": 0.5, "view": 0.1, "purchase": 1.0}, default_rate=0.05,
    ).to_pandas()
    want = duckdb.sql(f"""
        SELECT * FROM '{SF}/events.parquet'
        WHERE md5_number_lower(CAST(event_id AS VARCHAR)) % 1000000 <
          CASE event_type WHEN 'click' THEN 500000 WHEN 'view' THEN 100000
                          WHEN 'purchase' THEN 1000000 ELSE 50000 END
    """).df()
    assert sorted(got["event_id"]) == sorted(want["event_id"])
    # every stratum sampled at ~its own rate (tolerance for hash noise)
    n_by = got.groupby("event_type").size()
    tot = rd.read_parquet(f"{SF}/events.parquet").to_pandas().groupby("event_type").size()
    assert n_by["view"] / tot["view"] < n_by["click"] / tot["click"]
    assert n_by.get("purchase", 0) == tot["purchase"]  # rate 1.0 keeps all


def test_grouped_quantiles_exact_vs_sorted_reference():
    from go_datax_ray.stages.sampling import grouped_quantiles

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    got = grouped_quantiles(ds, group="event_type", value_col="value").to_pandas()
    raw = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"]).to_pandas()
    cents = np.floor(np.abs(raw["value"] * 100) + 0.5).astype("int64") * np.sign(
        raw["value"]
    ).astype("int64")  # half_towards_infinity
    raw = raw.assign(cents=cents)
    for _, row in got.iterrows():
        vals = np.sort(raw.loc[raw["event_type"] == row["event_type"], "cents"].to_numpy())
        n = len(vals)
        assert row["n"] == n
        for q, col in [(0.5, "p50_cents"), (0.9, "p90_cents"), (0.99, "p99_cents")]:
            assert row[col] == vals[int(np.ceil(q * n)) - 1]


def test_grouped_quantiles_tiny_groups():
    from go_datax_ray.stages.sampling import grouped_quantiles

    t = pa.table({"g": ["a", "a", "b"], "value": [1.0, 3.0, 2.5]})
    out = grouped_quantiles(rd.from_arrow(t), group="g", value_col="value").to_pandas()
    a = out[out["g"] == "a"].iloc[0]
    assert (a["p50_cents"], a["p90_cents"], a["p99_cents"]) == (100, 300, 300)
    b = out[out["g"] == "b"].iloc[0]
    assert b["p50_cents"] == 250 and b["n"] == 1


def test_group_sample_deterministic_and_consistent():
    """Same keys -> same sample across reruns and across differently
    partitioned inputs; each group yields min(k, group size) rows."""
    from go_datax_ray.stages.sampling import group_sample

    t = pa.table({
        "g": pa.array([1] * 10 + [2] * 3 + [3], pa.int64()),
        "k": pa.array(list(range(10)) + [100, 101, 102] + [7], pa.int64()),
    })
    a = group_sample(rd.from_arrow(t), group="g", key="k", k=2).to_pandas()
    b = group_sample(
        rd.from_arrow(t).repartition(5), group="g", key="k", k=2
    ).to_pandas()
    sa = sorted(map(tuple, a[["g", "k"]].itertuples(index=False)))
    sb = sorted(map(tuple, b[["g", "k"]].itertuples(index=False)))
    assert sa == sb
    counts = a.groupby("g").size().to_dict()
    assert counts == {1: 2, 2: 2, 3: 1}


def test_grouped_outliers_flags_extreme_value():
    from go_datax_ray.stages.analytic import grouped_outliers

    vals = [10.0] * 20 + [1000.0] + [10.0, 10.01]  # u1 spike; u2 calm
    t = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "user_id": pa.array([1] * 21 + [2, 2], pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })
    out = grouped_outliers(rd.from_arrow(t)).to_pandas()
    flagged = set(out.loc[out.is_outlier, "event_id"])
    assert flagged == {20}  # only the 1000.0 spike


def test_exact_quantiles_disc_matches_duckdb():
    """Random integers with heavy duplication: the histogram path must
    reproduce quantile_disc exactly (index = ceil(n*q)-1, 0-based)."""
    import numpy as np

    from go_datax_ray.stages.sampling import exact_quantiles_disc

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=2_003)  # dup-heavy, odd n
    t = pa.table({"x": pa.array(vals, pa.int64())})
    qs = (0.01, 0.25, 0.5, 0.55, 0.75, 0.99, 1.0)
    got = exact_quantiles_disc(rd.from_arrow(t), col="x", qs=qs).to_pandas()
    got = dict(zip(got["q"], got["value"]))
    for q in qs:
        want = duckdb.query_df(
            t.to_pandas(), "t", f"SELECT quantile_disc(x, {q}) v FROM t"
        ).fetchone()[0]
        assert got[q] == want, (q, got[q], want)
