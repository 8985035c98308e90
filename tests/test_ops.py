"""dx_* transforms, text analysis, dedup, ANN — unit + oracle tests."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


# ------------------------------------------------------------- transforms
def test_dx_filter_drop_semantics():
    from go_datax_ray.stages.transforms import dx_filter, dx_filter_keep

    t = pa.table({"age": [10, 20, 30, None], "name": ["a", "b", "c", "d"]})
    assert dx_filter(t, "age", ">", "18").column("name").to_pylist() == ["a", "d"]
    assert dx_filter_keep(t, "age", ">", "18").column("name").to_pylist() == ["b", "c"]


def test_dx_filter_like():
    from go_datax_ray.stages.transforms import dx_filter

    t = pa.table({"email": ["x@old.com", "y@new.com", "z@old.com"]})
    assert dx_filter(t, "email", "like", "%old.com").column("email").to_pylist() == ["y@new.com"]


def test_dx_chain_matches_duckdb(docs):
    from go_datax_ray.stages.transforms import apply_transformers

    chain = [
        {"name": "dx_substr", "parameter": {"column": "text", "paras": ["0", "20"]}},
        {"name": "dx_replace", "parameter": {"column": "text", "paras": ["[aeiou]", "_"]}},
        {"name": "dx_pad", "parameter": {"column": "source", "paras": ["left", "8", "0"]}},
        {"name": "dx_digest", "parameter": {"column": "lang", "paras": ["md5"]}},
        {"name": "dx_filter", "parameter": {"column": "n_chars", "paras": ["<", "100"]}},
    ]
    got = apply_transformers(docs, chain).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        SELECT doc_id,
               regexp_replace(substr(text, 1, 20), '[aeiou]', '_', 'g') AS text,
               md5(lang) AS lang, lpad(source, 8, '0') AS source, n_chars
        FROM '{SF}/documents.parquet' WHERE NOT (n_chars < 100) ORDER BY doc_id
        """
    ).df()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["source"].tolist() == want["source"].tolist()
    assert len(got) == len(want)


def test_dx_positional_column_index(docs):
    from go_datax_ray.stages.transforms import apply_transformers

    # columnIndex 1 == 'text' in the documents schema (positional Record model)
    out = apply_transformers(docs, [
        {"name": "dx_substr", "parameter": {"columnIndex": 1, "paras": ["0", "5"]}}
    ]).take(3)
    assert all(len(r["text"]) <= 5 for r in out)


# ------------------------------------------------------------------- text
def test_token_stats_and_quality(docs):
    from go_datax_ray.stages.text import QualityScore, token_stats

    out = (
        docs.map_batches(token_stats, batch_format="pyarrow")
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    assert (out["n_chars"] == out["text"].str.len()).all()
    assert (out["n_tokens_ws"] == out["text"].str.split().str.len()).all()
    assert out["quality"].between(0, 1).all()
    assert (out["n_tokens_bpe"] >= out["n_tokens_ws"]).all()


def test_lang_id_scripts():
    from go_datax_ray.stages.text import LangId

    import pandas as pd

    li = LangId()
    t = pa.table(
        {
            "text": [
                "the cat sat on the mat and it is a good day for the walk",
                "der Hund ist nicht mit der Katze und das ist ein Problem für die",
                "これは日本語のテキストです",
                "это русский текст и не что иное как по из",
                "中文文本没有假名",
                "",
            ]
        }
    )
    out = li(t)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "ja", "ru", "zh", "unk"]


def test_fingerprints(docs):
    from go_datax_ray.stages.text import fingerprint_md5, fingerprint_rolling

    t = docs.limit(50).to_pandas()
    tt = pa.Table.from_pandas(t)
    fp = fingerprint_md5(tt)
    want = duckdb.sql(
        "SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) f FROM tt ORDER BY doc_id"
    ).df()["f"]
    got = fingerprint_md5(tt.sort_by("doc_id")).column("fp_md5").to_pylist()
    assert got == want.tolist()
    fr = fingerprint_rolling(tt)
    assert fr.column("fp_roll").null_count == 0
    # order sensitivity: permuted words -> different rolling fp
    a = pa.table({"text": ["alpha beta gamma"]})
    b = pa.table({"text": ["gamma beta alpha"]})
    assert fingerprint_rolling(a).column("fp_roll")[0] != fingerprint_rolling(b).column("fp_roll")[0]


# ------------------------------------------------------------------ dedup
def _dup_docs():
    rng = np.random.default_rng(9)
    vocab = np.array([f"w{i}" for i in range(400)])
    base = [" ".join(rng.choice(vocab, size=30, replace=False)) for _ in range(30)]
    texts = base + [base[3], base[7], base[3]]  # exact dups
    words5 = base[5].split()
    words5[10] = "changed"
    near = " ".join(words5)  # near dup of 5 (one word differs)
    texts.append(near)
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    )


def test_exact_dedup():
    from go_datax_ray.stages.dedup import exact_dedup

    ds = _dup_docs()
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    # 31 distinct texts (30 base + near-dup variant); dups keep min doc_id
    assert len(out) == 31
    assert set(out["doc_id"]) == set(range(30)) | {33}


def test_minhash_lsh_finds_near_dup():
    from go_datax_ray.stages.dedup import (
        cluster_pairs,
        minhash_candidate_pairs,
        ngram_jaccard,
        verify_pairs,
    )

    ds = _dup_docs()
    pairs = minhash_candidate_pairs(ds).to_pandas()
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(ds.to_pandas()["doc_id"], pa.int64()),
            "text": ds.to_pandas()["text"],
        }
    )
    verified = verify_pairs(
        pa.Table.from_pandas(pairs), docs_tbl, threshold=0.5
    ).to_pandas()
    got_pairs = set(map(tuple, verified[["id_a", "id_b"]].values.tolist()))
    assert (3, 30) in got_pairs  # exact dup pair
    assert (5, 33) in got_pairs  # near dup pair
    reps = cluster_pairs(list(got_pairs))
    assert reps[30] == 3 and reps[32] == 3 and reps[33] == 5
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0


def test_simhash_near_dup():
    from go_datax_ray.stages.dedup import simhash_candidate_pairs

    ds = _dup_docs()
    pairs = simhash_candidate_pairs(ds, max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert (3, 30) in got and (3, 32) in got


def test_embedding_neardup_and_ann():
    from go_datax_ray.stages.ann import brute_force_topk, lsh_topk
    from go_datax_ray.stages.dedup import embedding_neardup_pairs

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    tbl = emb.to_pandas()
    mat = np.asarray(tbl["embedding"].tolist(), dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = mat[:5]

    got = brute_force_topk(emb, queries, k=5).to_pandas()
    sims = (queries / np.linalg.norm(queries, axis=1, keepdims=True)) @ matn.T
    for qi in range(5):
        want_top = set(np.argsort(-sims[qi])[:5])
        g = got[got["query_id"] == qi].sort_values("rank")
        assert g.iloc[0]["vec_id"] == qi  # self is nearest
        assert set(g["vec_id"]) == {tbl["vec_id"][i] for i in want_top}

    # lsh variant finds self and mostly overlaps exact top-k
    approx = lsh_topk(emb, queries, k=5, n_planes=6, probes=6).to_pandas()
    for qi in range(5):
        g = approx[approx["query_id"] == qi].sort_values("rank")
        assert g.iloc[0]["vec_id"] == qi

    # plant a near-copy of vec 0: the near-dup stage must find exactly it
    perturbed = mat[0] + 0.001 * np.ones_like(mat[0])
    planted = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(tbl["vec_id"]) + [10_000], pa.int64()),
                "embedding": pa.array(
                    [list(v) for v in mat] + [list(perturbed)], pa.list_(pa.float32())
                ),
            }
        )
    )
    pairs = embedding_neardup_pairs(planted, dim=mat.shape[1], threshold=0.999).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert (0, 10_000) in got
    assert (pairs["cosine"] >= 0.999 - 1e-9).all()


def test_ivf_topk_recall():
    from go_datax_ray.stages.ann import brute_force_topk, ivf_topk, kmeans_fit

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    tbl = emb.to_pandas()
    mat = np.asarray(tbl["embedding"].tolist(), dtype=np.float64)
    queries = mat[:5]
    cents = kmeans_fit(emb, n_clusters=8, seed=7)
    assert cents.shape[1] == mat.shape[1]
    exact = brute_force_topk(emb, queries, k=5).to_pandas()
    approx = ivf_topk(emb, queries, k=5, n_clusters=8, n_probes=4, centroids=cents).to_pandas()
    # self is always found; recall vs exact >= 60% with half the cells probed
    hits = 0
    for qi in range(5):
        a = approx[approx["query_id"] == qi].sort_values("rank")
        assert a.iloc[0]["vec_id"] == qi
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        hits += len(e & set(a["vec_id"]))
    assert hits / 25 >= 0.6
    # determinism: same seed -> same centroids
    cents2 = kmeans_fit(emb, n_clusters=8, seed=7)
    assert np.allclose(cents, cents2)


def test_minhash_dedup_corpus_end_to_end():
    from go_datax_ray.stages.dedup import minhash_dedup_corpus

    ds = _dup_docs()  # 34 docs: 31 distinct, 3 dups of #3/#7 + near-dup of #5
    deduped, stats = minhash_dedup_corpus(ds, threshold=0.5)
    out = deduped.to_pandas().sort_values("doc_id")
    assert stats["removed_docs"] == 4  # 30, 31, 32 (exact) + 33 (near)
    assert set(out["doc_id"]) == set(range(30))
    # idempotent: dedup of deduped removes nothing
    again, stats2 = minhash_dedup_corpus(deduped, threshold=0.5)
    assert stats2["removed_docs"] == 0


def test_cents_rounding_negative_and_half():
    """VERDICT r1 #10: one rounding family (half-away-from-zero, DuckDB
    ROUND) across tumbling/sliding/session — pinned on adversarial values."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from go_datax_ray.stages.windows import _to_cents

    vals = [0.125, -0.125, 0.005, -0.005, 2.675, -2.675, 0.0, 1.115]
    t = pa.table({"value": pa.array(vals, pa.float64())})
    got = _to_cents(t, "value").column("_cents").to_pylist()
    want = duckdb.sql(
        "SELECT CAST(ROUND(v * 100) AS BIGINT) FROM (SELECT unnest(?) AS v)",
        params=[vals],
    ).fetchall()
    assert got == [r[0] for r in want]

    # session windows use the same kernel end-to-end
    from go_datax_ray.stages.windows import session_windows

    ts = pa.array(
        [1_000_000 * i for i in range(len(vals))], pa.timestamp("us")
    )
    ds = rd.from_arrow(
        pa.table({"user_id": pa.array([1] * len(vals), pa.int64()), "ts": ts,
                  "value": pa.array(vals, pa.float64())})
    )
    out = session_windows(ds, gap_s=1800).to_pandas()
    assert out["sum_value_cents"].tolist() == [sum(got)]
    assert str(out["n"].dtype) == "int64"


def test_minhash_bucket_cap_and_min_shingles():
    """VERDICT r1 #5: empty docs emit no LSH rows; oversized buckets drop
    pair generation (logged) instead of going quadratic."""
    import pyarrow as pa
    import ray.data as rd

    from go_datax_ray.stages.dedup import minhash_candidate_pairs

    # 50 identical EMPTY docs + 2 real near-dups
    texts = [""] * 50 + [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    pairs = minhash_candidate_pairs(ds).to_pandas()
    ids = set(pairs["id_a"]) | set(pairs["id_b"]) if len(pairs) else set()
    assert ids <= {50, 51}  # empty docs never become candidates
    assert {50, 51} <= ids  # the real near-dup pair is still found

    # identical non-empty docs all land in one bucket -> cap drops them
    many = ["common boilerplate sentence repeated verbatim everywhere"] * 40
    ds2 = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(many, pa.string())})
    )
    capped = minhash_candidate_pairs(ds2, max_bucket=10).to_pandas()
    assert len(capped) == 0


def test_verify_pairs_distributed_matches_driver_verify():
    """The in-cluster verify (bucket joins + per-batch Jaccard) returns
    the same verified pairs as the driver-side reference implementation."""
    import pyarrow as pa
    import ray.data as rd

    from go_datax_ray.stages.dedup import (
        minhash_candidate_pairs,
        verify_pairs,
        verify_pairs_distributed,
    )

    SFD = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{SFD}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds).materialize()
    import pyarrow.parquet as pq

    docs_tbl = pq.read_table(f"{SFD}/documents.parquet", columns=["doc_id", "text"])
    pairs_tbl = pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
    want = verify_pairs(pairs_tbl, docs_tbl, threshold=0.5)
    got = verify_pairs_distributed(
        pairs, rd.from_arrow(docs_tbl), threshold=0.5, n_buckets=4
    ).to_pandas()
    w = {(a, b) for a, b in zip(want.column("id_a").to_pylist(),
                                want.column("id_b").to_pylist())}
    g = set(zip(got["id_a"], got["id_b"]))
    assert g == w


def test_quality_composite_golden():
    """The exp()-based composite quality is excluded from the SQL oracle
    (libm risk); pin it numerically here on a fixed corpus instead."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from go_datax_ray.stages.text import QualityScore

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(QualityScore, batch_format="pyarrow", concurrency=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    q = out["quality"].to_numpy()
    assert ((q >= 0.0) & (q <= 1.0)).all()
    # golden: quantized to 1e-9 so the hash is stable across platforms
    # while still pinning the formula to 9 decimal places
    digest = hashlib.md5(np.round(q, 9).tobytes()).hexdigest()
    assert digest == "35c5adcdb826de2a7dbf14e6f5f1b9bd", digest


def test_ann_ivf_recall_bar():
    """Mean recall@5 vs exact brute force >= 0.9 at 12/16 probes."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from go_datax_ray.stages.ann import brute_force_topk, ivf_topk

    sf = "/root/testdata/sf0.01"
    qt = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    queries = np.asarray(qt.column("embedding").to_pylist()[:8], dtype=np.float64)
    bf = brute_force_topk(rd.read_parquet(f"{sf}/embeddings.parquet"), queries, k=5).to_pandas()
    ivf = ivf_topk(rd.read_parquet(f"{sf}/embeddings.parquet"), queries, k=5,
                   n_clusters=16, n_probes=12).to_pandas()
    recalls = [
        len(set(bf[bf.query_id == q]["vec_id"]) & set(ivf[ivf.query_id == q]["vec_id"])) / 5
        for q in range(8)
    ]
    assert min(recalls) >= 0.6
    assert sum(recalls) / len(recalls) >= 0.9


def test_simhash_golden():
    """SimHash is deterministic md5-bit voting; pin it numerically on the
    fixed corpus. (Round 3: the word hash moved to md5 digest[8:16] LE ==
    DuckDB md5_number_lower, making simhash fully SQL-oracle-checked —
    this golden pins the same family.)"""
    import hashlib

    import numpy as np

    from go_datax_ray.stages.dedup import SimHasher

    t = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]) \
        .to_pandas().sort_values("doc_id")
    vals = np.array([SimHasher.simhash64(x or "") for x in t["text"]], dtype=np.uint64)
    digest = hashlib.md5(vals.tobytes()).hexdigest()
    assert digest == "403cfdc893b29721d016db754672cacb", digest


def test_cluster_pairs_distributed_matches_union_find():
    """Distributed min-label propagation CC == driver union-find on
    random graphs (chains, cliques, singiculous components)."""
    import numpy as np

    from go_datax_ray.stages.dedup import cluster_pairs, cluster_pairs_distributed

    rng = np.random.default_rng(17)
    edges = set()
    # random edges over 120 nodes
    for _ in range(150):
        a, b = rng.integers(0, 120, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    # plus a long chain 200..215 (diameter test)
    for i in range(200, 215):
        edges.add((i, i + 1))
    pairs = pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64()),
    })
    want = cluster_pairs(sorted(edges))
    got_ds = cluster_pairs_distributed(rd.from_arrow(pairs), n_buckets=4)
    got = {r["node"]: r["label"] for r in got_ds.take_all()}
    # every node's final rep must match union-find's root
    assert got == {n: want[n] for n in got}


def test_embedding_neardup_multi_table_recall():
    """More LSH tables -> recall never decreases and strictly improves on
    planted pairs this single table misses."""
    import numpy as np

    from go_datax_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(23)
    base = rng.standard_normal((120, 32))
    # plant 40 near-dup partners (tiny perturbations of the first 40)
    planted = base[:40] + rng.standard_normal((40, 32)) * 0.02
    mat = np.vstack([base, planted])
    tbl = pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl)
    want = {(i, 120 + i) for i in range(40)}

    def found(n_tables):
        pairs = embedding_neardup_pairs(
            ds, dim=32, threshold=0.99, n_planes=10, n_tables=n_tables
        ).to_pandas()
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        return want & got

    one = found(1)
    four = found(4)
    assert one <= four
    assert len(four) > len(one)  # recall strictly improves here
    assert len(four) >= 0.9 * len(want)


def test_session_windows_two_phase_properties():
    """VERDICT r3 #9: (a) the two-phase sessionizer (per-(key,bin) +
    boundary stitch) equals a reference single-pass sessionization on
    random data with sessions straddling bin boundaries; (b) a single
    hot key with 10^6 events completes (the round-2 single-group cliff)."""
    import numpy as np
    import pandas as pd

    from go_datax_ray.stages.windows import session_windows

    rng = np.random.default_rng(99)
    n = 20_000
    users = rng.integers(0, 40, n)
    # inter-event gaps up to 2x the session gap, so sessions split often
    # AND events regularly straddle the coarse bin boundary
    ts = np.sort(rng.integers(0, 3_600_000_000 * 48, n))
    vals = rng.uniform(0, 100, n).round(2)
    df = pd.DataFrame({"user_id": users, "ts": pd.to_datetime(ts, unit="us"),
                       "value": vals})
    ds = rd.from_pandas(df)
    got = (
        session_windows(ds, gap_s=1800, bin_s=3600)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    # reference single-pass sessionizer (pandas, one group per key)
    ref_rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        t = g["ts"].astype("int64").to_numpy()
        cents = np.round(g["value"].to_numpy() * 100).astype("int64")
        new = np.ones(len(t), bool)
        new[1:] = (t[1:] - t[:-1]) > 1800 * 1_000_000
        sess = np.cumsum(new) - 1
        for s in np.unique(sess):
            m = sess == s
            ref_rows.append((uid, t[m].min(), t[m].max(), int(m.sum()),
                             int(cents[m].sum())))
    ref = pd.DataFrame(ref_rows, columns=["user_id", "session_start",
                                          "session_end", "n", "sum_value_cents"])
    ref["session_start"] = pd.to_datetime(ref["session_start"], unit="us")
    ref["session_end"] = pd.to_datetime(ref["session_end"], unit="us")
    ref = ref.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_session_windows_hot_key_completes():
    """10^6 events, ONE user: the two-phase path spreads phase 1 over
    time bins; phase 2 only sees session summaries."""
    import numpy as np
    import pyarrow as pa

    from go_datax_ray.stages.windows import session_windows

    n = 1_000_000
    # 10s cadence with a >gap hole every 10_000 events
    base = np.arange(n, dtype=np.int64) * 10_000_000
    base += (np.arange(n, dtype=np.int64) // 10_000) * 3600_000_000
    t = pa.table({
        "user_id": pa.array(np.zeros(n, np.int64)),
        "ts": pa.array(base, pa.timestamp("us")),
        "value": pa.array(np.ones(n, np.float64)),
    })
    out = session_windows(rd.from_arrow(t), gap_s=1800).to_pandas()
    assert len(out) == 100  # one session per hole-separated run
    assert out["n"].sum() == n
    assert out["sum_value_cents"].sum() == n * 100


def test_dx_json_matches_duckdb_edge_cases():
    """dx_json == DuckDB json_extract_string on every edge class the
    fast/fallback split cares about (quoted, unquoted, bool, null,
    missing key, escapes, nesting, arrays, key-lookalike values)."""
    from go_datax_ray.stages.transforms import dx_json

    cases = [
        '{"k": 87}', '{"k": 0}', '{"k": "hello"}', '{"k": true}',
        '{"k": false}', '{"k": null}', '{"j": 5}', None, '{"k": 1.5}',
        '{"a": {"k": 9}, "k": 2}', '{"k": "a\\"b"}', '{"k": [1,2]}',
        '{"a": "k", "k": 3}', '{"kk": 4}', '{"k":-7 , "j": 1}',
        '{ "k" : 42 }', '{"k": ""}',
    ]
    t = pa.table({"props": pa.array(cases, pa.string())})
    mine = dx_json(t, "props", "$.k").column("k").to_pylist()
    for c, m in zip(cases, mine):
        if c is None:
            assert m is None
            continue
        want = duckdb.sql(
            "select json_extract_string(?::JSON, '$.k')", params=[c]
        ).fetchone()[0]
        assert m == want, (c, m, want)
    # dotted path goes through the exact fallback
    t2 = pa.table({"p": ['{"a": {"b": 5}}', '{"a": 1}']})
    assert dx_json(t2, "p", "a.b").column("b").to_pylist() == ["5", None]


def test_windowed_count_distinct_matches_duckdb():
    from go_datax_ray.stages.windows import windowed_count_distinct

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    mine = (
        windowed_count_distinct(ds, size_s=3600)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(mine[["window_start", "users"]], want)


def test_grouped_mode_matches_duckdb():
    from go_datax_ray.stages.analytic import grouped_mode

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    mine = (
        grouped_mode(ds)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT user_id, event_type, n FROM (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY count(*) DESC, event_type) AS rn
          FROM '{SF}/events.parquet' GROUP BY user_id, event_type
        ) WHERE rn = 1 ORDER BY user_id
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        mine[["user_id", "event_type", "n"]], want
    )


def test_ngram_commonness_matches_duckdb():
    from go_datax_ray.stages.text import ngram_commonness

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    mine = (
        ngram_commonness(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        rf"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS arr
          FROM '{SF}/documents.parquet'
        ),
        bg AS (
          SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bigram
          FROM d, unnest(range(1, len(arr))) AS t(i)
        ),
        cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(c) AS BIGINT) AS commonness
        FROM bg JOIN cnt USING (bigram) GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        mine[["doc_id", "n_bigrams", "commonness"]], want
    )


def test_ngram_commonness_tiny_docs():
    """Docs with <2 tokens produce no bigrams and no output row; a
    repeated bigram counts its global multiplicity."""
    from go_datax_ray.stages.text import ngram_commonness

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a b a b", "a b", "", "solo"],
    })
    out = ngram_commonness(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    got = {r.doc_id: (r.n_bigrams, r.commonness) for r in out.itertuples()}
    # global counts: "a b" x3 ("a b a b" has 2, "a b" has 1), "b a" x1
    assert got == {1: (3, 7), 2: (1, 3)}


def test_ngram_commonness_join_path_matches_broadcast():
    """broadcast_limit=0 forces the bucketed-join scale path; both
    strategies must produce identical rows."""
    from go_datax_ray.stages.text import ngram_commonness

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = (
        ngram_commonness(ds)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        ngram_commonness(ds, broadcast_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b[a.columns])


def test_dx_url_parts():
    """dx_url edge classes: full url, no scheme (-> ''), no port, null
    input stays null, missing query param -> ''."""
    from go_datax_ray.stages.transforms import dx_url

    t = pa.table({
        "url": pa.array([
            "https://user@www.ex.com:8080/a/b?x=1&lang=fr#frag",
            "http://ex.org",
            "www.no-scheme.com/path",
            None,
        ], pa.string()),
    })
    out = t
    for part in ("scheme", "host", "port", "path", "query", "fragment"):
        out = dx_url(out, "url", part)
    out = dx_url(out, "url", "param:lang", "lang_p")
    rows = out.to_pylist()
    assert rows[0]["url_scheme"] == "https"
    assert rows[0]["url_host"] == "www.ex.com"
    assert rows[0]["url_port"] == "8080"
    assert rows[0]["url_path"] == "/a/b"
    assert rows[0]["url_query"] == "x=1&lang=fr"
    assert rows[0]["url_fragment"] == "frag"
    assert rows[0]["lang_p"] == "fr"
    assert rows[1]["url_host"] == "ex.org"
    assert rows[1]["url_port"] == "" and rows[1]["url_path"] == ""
    assert rows[2]["url_host"] == ""  # no scheme -> no authority match
    assert rows[3]["url_host"] is None  # null input stays null


def test_dx_extract_matches_duckdb():
    from go_datax_ray.stages.transforms import dx_extract

    cases = ["user=alice id=7", "no match", None, "x=3.14 y=2",
             "a-b-c", ""]
    pat, grp = r"(\w+)=([0-9.]+)", 2
    t = pa.table({"c": pa.array(cases, pa.string())})
    mine = dx_extract(t, "c", pat, grp).column("c_extract").to_pylist()
    for s, m in zip(cases, mine):
        if s is None:
            assert m is None
            continue
        want = duckdb.sql(
            "select regexp_extract(?, ?, ?)", params=[s, pat, grp]
        ).fetchone()[0]
        assert m == want, (s, m, want)
