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
