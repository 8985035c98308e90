"""Windowed aggregates over event streams.

Ray Data has no event-time windowing; per the streaming-shaped-workload
pattern the input is treated as a partitioned log: tumbling windows are
a vectorised ``floor(ts / size)`` column + groupby aggregate (pure
shuffle-once), sliding windows fan each event out to the windows that
contain it (flat map) before the same aggregate, session windows need
per-key ordered state -> ``groupby(key).map_groups`` over ts-sorted
groups. The reference has no windowing at all (SURVEY.md §2.7) — these
are the CDC-stream analytics layered on the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def add_tumbling_window(batch: pa.Table, *, ts_col: str = "ts", size_s: int = 3600,
                        out_col: str = "window_start") -> pa.Table:
    """window_start = ts floored to the window size (epoch-aligned)."""
    ts_us = batch.column(ts_col).cast(pa.int64())
    size_us = size_s * 1_000_000
    start = pc.multiply(pc.floor(pc.divide(ts_us, size_us)).cast(pa.int64()), size_us)
    return batch.append_column(out_col, start.cast(pa.timestamp("us")))


def _to_cents(t: pa.Table, value_col: str) -> pa.Table:
    """value -> exact integer cents BEFORE aggregation: per-row rounding is
    bit-stable across engines, so sums (and the driver's value hash) are
    exact regardless of summation order — unlike ROUND(SUM(double))."""
    cents = pc.cast(
        pc.round(pc.multiply(t.column(value_col), pa.scalar(100.0)),
                 options=pc.RoundOptions(round_mode="half_towards_infinity")),
        pa.int64(),
    )
    return t.append_column("_cents", cents)


def _pin_ts_us(ts_cols: list[str]):
    """Output normalizer: timestamps exactly timestamp[us] (matches DuckDB),
    regardless of what unit the groupby shuffle surfaced them in."""

    def fix(t: pa.Table) -> pa.Table:
        for c in ts_cols:
            i = t.column_names.index(c)
            t = t.set_column(i, c, t.column(c).cast(pa.timestamp("us")))
        return t

    return fix


def _window_reduce(ds, key: str):
    """Grouped count+sum per (key, window).

    NO explicit combiner stage: Ray's sort-based aggregate already
    partial-aggregates per block on the map side before the shuffle, so
    a user-level pre-aggregation is redundant — measured 2.4 s direct
    vs 11-19 s with an explicit combiner at sf0.1 (the combiner's
    coalesced single-block output starves the sort of parallelism, and
    window cardinality ~ event count gives it nothing to reduce)."""
    from ray.data.aggregate import Count, Sum

    from .partition import bounded_groupby

    out = bounded_groupby(ds, [key, "window_start"]).aggregate(
        Count(alias_name="n"), Sum("_cents", alias_name="sum_value_cents")
    )
    return out.map_batches(_pin_ts_us(["window_start"]), batch_format="pyarrow")


def tumbling_aggregate(ds, *, key: str = "user_id", ts_col: str = "ts", size_s: int = 3600,
                       value_col: str = "value"):
    """Tumbling-window count + sum (exact cents) per (key, window)."""
    ds = ds.map_batches(
        add_tumbling_window, fn_kwargs={"ts_col": ts_col, "size_s": size_s},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ds = ds.map_batches(_to_cents, fn_kwargs={"value_col": value_col}, batch_format="pyarrow")
    return _window_reduce(ds, key)


def sliding_explode(batch: pa.Table, *, ts_col: str = "ts", size_s: int, slide_s: int,
                    out_col: str = "window_start") -> pa.Table:
    """Fan each event out to every sliding window containing it
    (size/slide windows per event)."""
    ts_us = batch.column(ts_col).cast(pa.int64()).to_numpy()
    size_us, slide_us = size_s * 1_000_000, slide_s * 1_000_000
    k = size_s // slide_s
    n = len(ts_us)
    last = (ts_us // slide_us) * slide_us  # latest window start containing ts
    idx = np.repeat(np.arange(n), k)
    starts = np.repeat(last, k) - np.tile(np.arange(k) * slide_us, n)
    keep = starts + size_us > ts_us[idx]
    out = batch.take(pa.array(idx[keep]))
    return out.append_column(out_col, pa.array(starts[keep], pa.timestamp("us")))


def sliding_aggregate(ds, *, key: str = "user_id", ts_col: str = "ts", size_s: int,
                      slide_s: int, value_col: str = "value"):
    ds = ds.map_batches(
        sliding_explode, fn_kwargs={"ts_col": ts_col, "size_s": size_s, "slide_s": slide_s},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ds = ds.map_batches(_to_cents, fn_kwargs={"value_col": value_col}, batch_format="pyarrow")
    return _window_reduce(ds, key)


def session_windows(ds, *, key: str = "user_id", ts_col: str = "ts", gap_s: int = 1800,
                    value_col: str = "value"):
    """Session windows: per key, events sorted by ts; a gap > gap_s starts
    a new session. Ordered per-key state -> map_groups over sorted group
    (the documented partitioning assumption: one key's events fit one
    group). Cents are computed by the SAME Arrow ``_to_cents`` kernel as
    tumbling/sliding (half-away-from-zero, matching DuckDB ROUND) before
    the shuffle, so all three window ops share one rounding family."""
    gap_us = gap_s * 1_000_000

    ds = ds.map_batches(_to_cents, fn_kwargs={"value_col": value_col}, batch_format="pyarrow")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("int64").to_numpy()
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_id = np.cumsum(new_sess) - 1
        g = g.assign(_sess=sess_id)
        agg = g.groupby("_sess").agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n=(ts_col, "size"),
            sum_value_cents=("_cents", "sum"),
        )
        agg[key] = g[key].iloc[0]
        agg["n"] = agg["n"].astype("int64")
        agg["sum_value_cents"] = agg["sum_value_cents"].astype("int64")
        return agg.reset_index(drop=True)[
            [key, "session_start", "session_end", "n", "sum_value_cents"]
        ]

    from .partition import bounded_groupby

    out = bounded_groupby(ds, key).map_groups(sessions, batch_format="pandas")
    return out.map_batches(
        _pin_ts_us(["session_start", "session_end"]), batch_format="pyarrow"
    )
