"""Bloom filter / bloom semi-join / heavy-hitter bigrams."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_bloom_filter_no_false_negatives_and_low_fpr():
    from go_datax_ray.stages.bloom import BloomFilter

    rng = np.random.default_rng(7)
    members = rng.choice(2**62, size=20_000, replace=False).astype(np.uint64)
    f = BloomFilter(len(members))
    f.add(members)
    assert f.contains(members).all()  # no false negatives, ever
    others = (members + np.uint64(1)) ^ np.uint64(0xDEADBEEF)
    fpr = f.contains(others).mean()
    assert fpr < 0.03, fpr  # ~1% design point


def test_bloom_merge_equivalent_to_single():
    from go_datax_ray.stages.bloom import BloomFilter

    h = np.arange(1, 5001, dtype=np.uint64) * np.uint64(2654435761)
    whole = BloomFilter(5000)
    whole.add(h)
    a, b = BloomFilter(5000), BloomFilter(5000)
    a.add(h[:2500])
    b.add(h[2500:])
    np.bitwise_or(a.words, b.words, out=a.words)
    assert np.array_equal(a.words, whole.words)


def test_bloom_semi_join_exact_vs_duckdb():
    from go_datax_ray.stages.bloom import bloom_semi_join

    cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(expr="c_acctbal > 5000").map_batches(
        lambda t: pa.table({"user_id": t.column("c_custkey")}),
        batch_format="pyarrow",
    )
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    got = (
        bloom_semi_join(ev, keys, on="user_id", force_bloom=True)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""SELECT event_id, user_id FROM '{SF}/events.parquet'
        WHERE user_id IN (SELECT c_custkey FROM '{SF}/customer.parquet'
                          WHERE c_acctbal > 5000) ORDER BY event_id"""
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["user_id"].tolist() == want["user_id"].tolist()


def test_bloom_semi_join_string_keys_and_empty():
    from go_datax_ray.stages.bloom import bloom_semi_join

    big = rd.from_arrow(pa.table({"k": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]}))
    keys = rd.from_arrow(pa.table({"k": ["b", "d"]}))
    got = bloom_semi_join(big, keys, on="k", force_bloom=True).to_pandas()
    assert sorted(got["k"]) == ["b", "d"]
    none = bloom_semi_join(big, rd.from_arrow(pa.table({"k": pa.array([], pa.string())})), on="k")
    assert none.count() == 0


def test_bigram_extraction_edges():
    from go_datax_ray.stages.sampling import _bigram_array

    t = pa.table({"text": ["a b c", "solo", "", "  x   y  "]})
    got = sorted(_bigram_array(t, "text").to_pylist())
    # no cross-document bigrams ("c solo", "solo x" must not appear)
    assert got == ["a b", "b c", "x y"]


def test_heavy_hitters_matches_exact_topk():
    from go_datax_ray.stages.sampling import heavy_hitters_bigrams

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = heavy_hitters_bigrams(docs, k=20).to_pandas()
    want = duckdb.sql(
        rf"""
        WITH toks AS (
          SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS arr
          FROM '{SF}/documents.parquet'),
        pairs AS (
          SELECT unnest(list_transform(range(1, len(arr)),
                                       i -> arr[i] || ' ' || arr[i+1])) AS bigram
          FROM toks WHERE len(arr) >= 2)
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """
    ).df()
    assert got["bigram"].tolist() == want["bigram"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_heavy_hitters_small_candidate_budget():
    """Tiny candidates_per_block still yields exact counts for whatever
    survives candidacy (the re-count is exact by construction)."""
    from go_datax_ray.stages.sampling import heavy_hitters_bigrams

    t = pa.table({"text": ["the cat sat"] * 50 + ["a dog ran"] * 10})
    out = heavy_hitters_bigrams(rd.from_arrow(t), k=2, candidates_per_block=8).to_pandas()
    assert out.iloc[0]["bigram"] in ("cat sat", "the cat")
    assert out.iloc[0]["n"] == 50
