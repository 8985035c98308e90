"""Analytic window functions, rollup, pivot, explode — oracle + edge tests."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _cmp(ds, sql, sort_cols, con=None):
    mine = ds.to_pandas().sort_values(sort_cols).reset_index(drop=True)
    want = (con.sql(sql) if con else duckdb.sql(sql)).df()
    want = want.sort_values(sort_cols).reset_index(drop=True)
    mine, want = mine[sorted(mine.columns)], want[sorted(want.columns)]
    pd.testing.assert_frame_equal(mine, want, check_dtype=True)
    return len(mine)


def test_ranked_window_matches_duckdb():
    from go_datax_ray.stages.analytic import ranked_window

    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    n = _cmp(
        ranked_window(ds),
        f"""
        SELECT event_id, user_id, ts, value,
               CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS rn,
               CAST(RANK() OVER w1 AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w1 AS BIGINT) AS drnk,
               LAG(value) OVER w2 AS prev_value,
               LEAD(value) OVER w2 AS next_value,
               PERCENT_RANK() OVER w1 AS pct_rank,
               CUME_DIST() OVER w1 AS cume_dist
        FROM '{SF}/events.parquet'
        WINDOW w1 AS (PARTITION BY user_id ORDER BY ts),
               w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        ["event_id"],
    )
    assert n > 0


def test_ranked_window_ties_share_rank():
    """Duplicate order-values: RANK repeats, DENSE_RANK is gapless,
    ROW_NUMBER stays unique via the tiebreak."""
    from go_datax_ray.stages.analytic import ranked_window

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pa.array([100, 100, 100, 200, 200], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": [7, 7, 7, 7, 9],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = (
        ranked_window(rd.from_arrow(t))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["rn"].tolist() == [1, 2, 3, 4, 1]
    assert out["rnk"].tolist() == [1, 1, 1, 4, 1]
    assert out["drnk"].tolist() == [1, 1, 1, 2, 1]
    assert np.isnan(out["prev_value"][0]) and out["prev_value"][1] == 1.0
    assert out["next_value"][2] == 4.0 and np.isnan(out["next_value"][3])
    assert np.isnan(out["prev_value"][4]) and np.isnan(out["next_value"][4])


def test_rollup_matches_duckdb():
    from go_datax_ray.stages.analytic import rollup_aggregate

    li = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    n = _cmp(
        rollup_aggregate(
            li, keys=["l_returnflag", "l_linestatus"], value_col="l_extendedprice"
        ),
        f"""
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents
        FROM '{SF}/lineitem.parquet'
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        ["l_returnflag", "l_linestatus"],
    )
    # 6 combos + 3 flags + 1 total
    assert n == 10


def test_pivot_matches_duckdb():
    from go_datax_ray.stages.analytic import pivot_aggregate

    ev = rd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    cases = " ".join(
        f""", CAST(SUM(CASE WHEN event_type = '{v}' THEN
            CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT)
            AS {v}_cents"""
        for v in ("click", "error", "purchase", "signup", "view")
    )
    _cmp(
        pivot_aggregate(ev),
        f"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n {cases}
        FROM '{SF}/events.parquet' GROUP BY user_id
        """,
        ["user_id"],
    )


def test_pivot_sanitizes_value_names():
    from go_datax_ray.stages.analytic import pivot_aggregate

    t = pa.table(
        {
            "k": [1, 1, 2],
            "ev": ["a-b", "a-b", "c d"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = pivot_aggregate(
        rd.from_arrow(t), index="k", column="ev", value_col="value"
    ).to_pandas()
    assert set(out.columns) == {"k", "n", "a_b_cents", "c_d_cents"}
    row = out.set_index("k").loc[1]
    assert row["a_b_cents"] == 300 and row["c_d_cents"] == 0


def test_explode_tokens_matches_duckdb():
    from go_datax_ray.stages.analytic import explode_tokens

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    _cmp(
        explode_tokens(docs),
        rf"""
        SELECT doc_id, token FROM (
          SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
          FROM '{SF}/documents.parquet'
        ) WHERE token <> ''
        """,
        ["doc_id", "token"],
    )


def test_explode_edge_whitespace():
    from go_datax_ray.stages.analytic import explode_tokens

    t = pa.table(
        {"doc_id": [1, 2, 3], "text": ["  lead and trail  ", "", "one"]}
    )
    out = explode_tokens(rd.from_arrow(t)).to_pandas()
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == [(1, "and"), (1, "lead"), (1, "trail"), (3, "one")]


def test_funnel_ordering_matters():
    """A click BEFORE a user's first signup must not count; a user who
    purchases before clicking must not reach the purchase step."""
    from go_datax_ray.stages.analytic import funnel_counts

    us = pa.timestamp("us")
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 3, 3, 4], pa.int64()),
        "ts": pa.array(
            [100, 200, 300,       # u1: signup->click->purchase (full)
             200, 100,            # u2: signup at 200, click EARLIER at 100
             100, 200, 150,       # u3: signup, click, purchase BEFORE click
             100],                # u4: signup only
            pa.int64()).cast(us),
        "event_type": pa.array(
            ["signup", "click", "purchase",
             "signup", "click",
             "signup", "click", "purchase",
             "signup"], pa.string()),
    })
    out = funnel_counts(rd.from_arrow(t)).to_pandas()
    got = dict(zip(out["step"], out["users"]))
    assert got == {"signup": 4, "click": 2, "purchase": 1}


def test_funnel_matches_duckdb_chained_ctes():
    from go_datax_ray.stages.analytic import funnel_counts

    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    _cmp(
        funnel_counts(ds),
        f"""
        WITH ev AS (SELECT * FROM '{SF}/events.parquet'),
        s0 AS (SELECT user_id, min(ts) AS t FROM ev
               WHERE event_type = 'signup' GROUP BY user_id),
        s1 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
               JOIN s0 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > s0.t
               GROUP BY e.user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
               JOIN s1 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > s1.t
               GROUP BY e.user_id)
        SELECT 'signup' AS step,
               (SELECT CAST(count(*) AS BIGINT) FROM s0) AS users
        UNION ALL SELECT 'click',
               (SELECT CAST(count(*) AS BIGINT) FROM s1)
        UNION ALL SELECT 'purchase',
               (SELECT CAST(count(*) AS BIGINT) FROM s2)
        """,
        ["step"],
    )


def test_cube_matches_duckdb():
    from go_datax_ray.stages.analytic import cube_aggregate

    li = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    _cmp(
        cube_aggregate(li, keys=["l_returnflag", "l_linestatus"],
                       value_col="l_extendedprice"),
        f"""
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS sum_value_cents
        FROM '{SF}/lineitem.parquet'
        GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        ["l_returnflag", "l_linestatus", "n"],
    )


def test_cube_three_keys_subset_count():
    """3 keys -> 8 grouping sets; spot-check totals per set count."""
    from go_datax_ray.stages.analytic import cube_aggregate

    t = pa.table({
        "a": ["x", "x", "y"],
        "b": ["p", "q", "p"],
        "c": ["1", "1", "2"],
        "value": [1.0, 2.0, 4.0],
    })
    out = cube_aggregate(
        rd.from_arrow(t), keys=["a", "b", "c"], value_col="value"
    ).to_pandas()
    # grand-total row: all keys null, n=3, sum=700 cents
    gt = out[out[["a", "b", "c"]].isna().all(axis=1)]
    assert len(gt) == 1 and gt["n"].iloc[0] == 3
    assert gt["sum_value_cents"].iloc[0] == 700
    # distinct grouping sets present = 8
    import numpy as np
    masks = {tuple(r) for r in out[["a", "b", "c"]].isna().itertuples(index=False)}
    assert len(masks) == 8


def test_global_ntile_matches_duckdb():
    from go_datax_ray.stages.analytic import global_ntile

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    _cmp(
        global_ntile(ds, k=7),  # k not dividing n exercises uneven buckets
        f"""
        SELECT event_id, value,
               CAST(NTILE(7) OVER (ORDER BY value, event_id) AS BIGINT)
                 AS bucket
        FROM '{SF}/events.parquet'
        """,
        ["event_id"],
    )


def test_global_ntile_heavy_ties():
    """One value shared by most rows: within-tie id order must decide
    buckets exactly as SQL does."""
    from go_datax_ray.stages.analytic import global_ntile

    import duckdb

    n = 1000
    vals = [5.0] * 900 + [float(i) for i in range(100)]
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })
    mine = (
        global_ntile(rd.from_arrow(t), k=3)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    tp = t.to_pandas()
    want = duckdb.sql("""
        SELECT event_id,
               CAST(NTILE(3) OVER (ORDER BY value, event_id) AS BIGINT)
                 AS bucket
        FROM tp ORDER BY event_id
    """).df()
    assert mine["bucket"].tolist() == want["bucket"].tolist()


def test_rolling_frame_matches_pandas():
    """Segment-clamped moving SUM/COUNT/AVG == pandas groupby.rolling
    on the same (key, order, tiebreak) sort — including windows shorter
    than the frame at each key's head."""
    from go_datax_ray.stages.analytic import rolling_frame

    rng = np.random.default_rng(4)
    n = 5000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "cents": pa.array(rng.integers(-1000, 1000, n), pa.int64()),
    })
    out = rolling_frame(rd.from_arrow(t), window=4).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    pdf = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    roll = pdf.groupby("user_id")["cents"].rolling(4, min_periods=1)
    pdf["want_sum"] = roll.sum().reset_index(level=0, drop=True)
    pdf["want_n"] = roll.count().reset_index(level=0, drop=True)
    pdf = pdf.sort_values("event_id").reset_index(drop=True)
    assert out["roll_sum_cents"].tolist() == pdf["want_sum"].astype(int).tolist()
    assert out["roll_n"].tolist() == pdf["want_n"].astype(int).tolist()
    assert np.allclose(out["roll_avg_cents"], pdf["want_sum"] / pdf["want_n"])
