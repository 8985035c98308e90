"""Inverted index + tf-idf top terms: oracle tests vs DuckDB and
synthetic edge cases (empty docs, duplicate-free docs, ties).

Reference parity: the reference has no search-index analogue (its
transforms are row-local, plugins/transformer/transformer.go); these
are corpus-wide operators the reference's users would reach a search
engine for, expressed as co-hashed exchanges (SURVEY §8.3).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_inverted_index_matches_duckdb():
    from go_datax_ray.stages.text import inverted_index

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = _canon(inverted_index(ds, min_df=3).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = _canon(con.sql("""
        WITH pairs AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) AS token
            FROM documents)
          WHERE token <> '')
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM pairs GROUP BY token HAVING COUNT(*) >= 3
    """).df())
    assert dict(got.dtypes) == dict(want.dtypes)
    assert got.equals(want)


def test_inverted_index_postings_sorted_and_distinct():
    from go_datax_ray.stages.text import inverted_index

    tbl = pa.table({
        "doc_id": [5, 1, 9, 3],
        "text": ["cat dog cat", "dog", "cat!", ""],
    })
    out = inverted_index(rd.from_arrow(tbl), min_df=1).to_pandas()
    by_tok = dict(zip(out["token"], out["postings"]))
    assert by_tok["cat"] == "5,9"  # dup within doc 5 collapsed, ids sorted
    assert by_tok["dog"] == "1,5"
    assert set(out.loc[out["token"] == "cat", "df"]) == {2}


def test_tfidf_matches_duckdb():
    from go_datax_ray.stages.text import tfidf_top_terms

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = _canon(tfidf_top_terms(ds, k=3).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = _canon(con.sql("""
        WITH pairs AS (
          SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) AS token
            FROM documents)
          WHERE token <> '' GROUP BY doc_id, token),
        dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM pairs GROUP BY token),
        scored AS (
          SELECT p.doc_id, p.token, p.tf, d.df,
                 ROW_NUMBER() OVER (PARTITION BY p.doc_id
                   ORDER BY p.tf * ln((SELECT COUNT(*) FROM documents)::DOUBLE / d.df)
                     DESC, p.token ASC) AS rn
          FROM pairs p JOIN dfs d USING (token))
        SELECT doc_id, token, tf, df FROM scored WHERE rn <= 3
    """).df())
    assert dict(got.dtypes) == dict(want.dtypes)
    assert got.equals(want)


def test_tfidf_rare_term_beats_common_term():
    from go_datax_ray.stages.text import tfidf_top_terms

    # 'common' is in every doc (idf=0 -> score 0); 'rare' only in doc 0.
    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "common common common rare",
            "common x",
            "common y",
            "common z",
        ],
    })
    out = tfidf_top_terms(rd.from_arrow(tbl), k=1).to_pandas()
    top0 = out.loc[out["doc_id"] == 0, "token"].iloc[0]
    assert top0 == "rare"  # tf=3*ln(1)=0 for 'common' < 1*ln(4) for 'rare'
