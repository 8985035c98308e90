"""Set operations + approximate quantile sketch — oracle + property tests."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _sql_setop(op):
    return duckdb.sql(
        f"""
        SELECT user_id, date_trunc('day', ts) AS day
        FROM '{SF}/events.parquet' WHERE event_type = 'click'
        {op}
        SELECT user_id, date_trunc('day', ts)
        FROM '{SF}/events.parquet' WHERE event_type = 'purchase'
        """
    ).df()


def _run_setop(op):
    from go_datax_ray.stages.setops import set_op
    from go_datax_ray.stages.windows import add_tumbling_window

    ev = rd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).map_batches(
        add_tumbling_window,
        fn_kwargs=dict(ts_col="ts", size_s=86400, out_col="day"),
        batch_format="pyarrow",
    )
    a = ev.filter(expr="event_type == 'click'")
    b = ev.filter(expr="event_type == 'purchase'")
    return set_op(a, b, on=["user_id", "day"], op=op).to_pandas()


def _canon(df):
    return sorted(map(tuple, df[["user_id", "day"]].itertuples(index=False)))


def test_intersect_matches_duckdb():
    got, want = _canon(_run_setop("intersect")), _canon(_sql_setop("INTERSECT"))
    assert got == want and len(got) > 0


def test_except_matches_duckdb():
    got, want = _canon(_run_setop("except")), _canon(_sql_setop("EXCEPT"))
    assert got == want and len(got) > 0


def test_union_distinct_matches_duckdb():
    got, want = _canon(_run_setop("union")), _canon(_sql_setop("UNION"))
    assert got == want


def test_setop_duplicate_safety():
    """A key occurring many times on one side still yields ONE output row."""
    from go_datax_ray.stages.setops import set_op

    a = rd.from_arrow(pa.table({"k": [1] * 1000 + [2]}))
    b = rd.from_arrow(pa.table({"k": [1, 3]}))
    assert set_op(a, b, on=["k"], op="intersect").to_pandas()["k"].tolist() == [1]
    assert sorted(
        set_op(a, b, on=["k"], op="except").to_pandas()["k"]
    ) == [2]
    assert sorted(
        set_op(a, b, on=["k"], op="union").to_pandas()["k"]
    ) == [1, 2, 3]


def test_approx_quantiles_property():
    """Rank of each estimate within tolerance of the target quantile, and
    exact per-group counts."""
    from go_datax_ray.stages.sampling import approx_grouped_quantiles

    ev = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    out = (
        approx_grouped_quantiles(
            ev, group="event_type", value_col="value", id_col="event_id"
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want_n = (
        duckdb.sql(
            f"""SELECT event_type, COUNT(*) AS n FROM '{SF}/events.parquet'
            GROUP BY event_type ORDER BY event_type"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert out["event_type"].tolist() == want_n["event_type"].tolist()
    assert out["n"].tolist() == want_n["n"].astype("int64").tolist()
    assert out["p50_ok"].all() and out["p90_ok"].all() and out["p99_ok"].all()


def test_approx_quantiles_exact_when_small():
    """n <= k: the sample IS the data, so estimates are exact and the
    property trivially holds; also exercises a skewed heavy-dup group."""
    from go_datax_ray.stages.sampling import approx_grouped_quantiles

    n = 500
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "g": ["a"] * (n // 2) + ["b"] * (n // 2),
            "value": np.r_[
                np.linspace(0, 100, n // 2), np.full(n // 2, 7.0)
            ],
        }
    )
    out = approx_grouped_quantiles(
        rd.from_arrow(t), group="g", value_col="value", id_col="id", k=1024
    ).to_pandas()
    assert sorted(out["g"]) == ["a", "b"]
    assert out.set_index("g").loc["a", "n"] == n // 2
    # the two-sided bracket property must hold even on the all-dup group
    for c in ("p50_ok", "p90_ok", "p99_ok"):
        assert out[c].all(), c
