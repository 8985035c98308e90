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
    """Grouped count+sum per (key, window): per-BATCH partial aggregation
    (one lexsort + reduceat, keeps the exchange bounded by distinct
    windows per batch on dense streams), then a co-hash final reduce —
    every (key, window) lands in one coarse bucket and one lexsort per
    bucket sums all its windows at once.

    This replaced Ray's native sort-based aggregate: measured 4.9-8.1 s
    native vs 1.2 s co-hash on the sf0.1 sliding query (382k output
    windows), identical results — the native aggregate's sort machinery
    (pandas block conversions + full sort shuffle) dominated the
    window queries' wall time. (The round-2 lesson about explicit
    combiners FEEDING the native aggregate still holds; this removes
    the native aggregate itself.)"""
    from .dedup import _col_np, _segments
    from .partition import cohash_map_groups

    empty = pa.table({
        key: pa.array([], pa.int64()),
        "window_start": pa.array([], pa.timestamp("us")),
        "n": pa.array([], pa.int64()),
        "sum_value_cents": pa.array([], pa.int64()),
    })

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return empty
        t = t.select([key, "window_start", "_cents"])
        order, bounds = _segments(t, [key, "window_start"])
        cents = _col_np(t, "_cents")[order]
        csum = np.concatenate([[0], np.cumsum(cents)])
        sums = csum[bounds[1:]] - csum[bounds[:-1]]
        out = t.take(pa.array(order[bounds[:-1]])).select([key, "window_start"])
        return (out.append_column("n", pa.array(np.diff(bounds), pa.int64()))
                   .append_column("sum_value_cents", pa.array(sums, pa.int64())))

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = cohash_map_groups(part, [key, "window_start"], _final_nk_reduce(key))
    return out.map_batches(_pin_ts_us(["window_start"]), batch_format="pyarrow")


def _final_nk_reduce(key: str):
    """Co-hash block reducer summing (n, sum_value_cents) per
    (key, window_start) — the final reduce shared by the explode and
    dense sliding plans."""
    from .dedup import _col_np, _segments

    empty = pa.table({
        key: pa.array([], pa.int64()),
        "window_start": pa.array([], pa.timestamp("us")),
        "n": pa.array([], pa.int64()),
        "sum_value_cents": pa.array([], pa.int64()),
    })

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key not in g.column_names:
            return empty
        order, bounds = _segments(g, [key, "window_start"])
        ns = _col_np(g, "n")[order]
        ss = _col_np(g, "sum_value_cents")[order]
        cn = np.concatenate([[0], np.cumsum(ns)])
        cs = np.concatenate([[0], np.cumsum(ss)])
        out = g.take(pa.array(order[bounds[:-1]])).select([key, "window_start"])
        return (
            out.append_column(
                "n", pa.array(cn[bounds[1:]] - cn[bounds[:-1]], pa.int64()))
            .append_column(
                "sum_value_cents",
                pa.array(cs[bounds[1:]] - cs[bounds[:-1]], pa.int64()))
        )

    return final


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
                      slide_s: int, value_col: str = "value",
                      plan: str = "explode"):
    """Sliding count + sum (exact cents) per (key, window).

    Two physical plans, selected by the caller's knowledge of the
    stream's density (both bit-exact; property-tested equal):

    - ``plan="explode"`` (default): each event fans out to its
      k = size/slide windows BEFORE one groupby. The replication is
      k x events of three narrow columns (cents and the projection are
      computed pre-fan, so the wide row is never copied k times).
      Right when events are SPARSE per (key, slide-bucket) — a fine
      pre-aggregation would reduce nothing and a second shuffle is
      pure loss (the driver's synthetic events: 100k events -> 98.9k
      distinct fine buckets).
    - ``plan="dense"``: aggregate at SLIDE granularity first (one
      groupby over UNEXPLODED events with map-side combining), then fan
      each fine-bucket AGGREGATE into its k covering windows and
      re-sum. The k-fold replication applies to (key, bucket, n, cents)
      int rows, never to events: with many events per bucket (real
      click/telemetry streams at 100 TB) the big shuffle shrinks by the
      per-bucket event multiplicity. Requires slide | size.
    """
    if plan not in ("explode", "dense"):
        raise ValueError(f"sliding_aggregate: unknown plan {plan!r}")
    if plan == "explode" or size_s % slide_s != 0:
        proj = ds.map_batches(
            lambda t: _to_cents(t, value_col).select([key, ts_col, "_cents"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        exploded = proj.map_batches(
            lambda t: sliding_explode(
                t, ts_col=ts_col, size_s=size_s, slide_s=slide_s
            ).select([key, "window_start", "_cents"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return _window_reduce(exploded, key)

    fine = ds.map_batches(
        add_tumbling_window, fn_kwargs={"ts_col": ts_col, "size_s": slide_s},
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(_to_cents, fn_kwargs={"value_col": value_col},
                  batch_format="pyarrow")
    agg1 = _window_reduce(fine, key)  # (key, fine window, n, cents)

    k = size_s // slide_s
    slide_us = slide_s * 1_000_000

    def fan(t: pa.Table) -> pa.Table:
        n = t.num_rows
        f_us = t.column("window_start").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        idx = np.repeat(np.arange(n), k)
        starts = np.repeat(f_us, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_us, n
        )
        # a window [s, s+size) covers a fine bucket [f, f+slide) for all
        # k offsets s = f - i*slide, i in 0..k-1 — no filter needed
        out = t.select([key, "n", "sum_value_cents"]).take(pa.array(idx))
        return out.append_column(
            "window_start", pa.array(starts, pa.timestamp("us"))
        )

    fanned = agg1.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    from .partition import cohash_map_groups

    out = cohash_map_groups(fanned, [key, "window_start"], _final_nk_reduce(key))
    return out.map_batches(_pin_ts_us(["window_start"]), batch_format="pyarrow")


def _sessionize_sorted(ts: np.ndarray, heads: np.ndarray, cents: np.ndarray,
                       gap_us: int):
    """Core sessionizer over a (key-)sorted event view: ``heads`` marks
    key-segment starts; a time gap > gap_us also starts a session.
    Returns (session-start indices, n, start_us, end_us, sum_cents) —
    all reduceat, no Python loops."""
    new = heads.copy()
    if len(ts) > 1:
        new[1:] |= (ts[1:] - ts[:-1]) > gap_us
    idx = np.nonzero(new)[0]
    n = np.diff(np.append(idx, len(ts)))
    start = ts[idx]
    end = ts[np.append(idx[1:], len(ts)) - 1]
    sums = np.add.reduceat(cents, idx) if len(idx) else np.zeros(0, np.int64)
    return idx, n.astype(np.int64), start, end, sums.astype(np.int64)


def session_windows(ds, *, key: str = "user_id", ts_col: str = "ts", gap_s: int = 1800,
                    value_col: str = "value", bin_s: int | None = None):
    """Session windows: per key, events sorted by ts; a gap > gap_s
    starts a new session. Cents are computed by the SAME Arrow
    ``_to_cents`` kernel as tumbling/sliding (half-away-from-zero,
    matching DuckDB ROUND), so all three window ops share one rounding
    family.

    TWO-PHASE shape (removes the round-2 hot-key cliff where one key's
    entire event history had to fit one group): phase 1 sessionizes per
    (key, coarse time bin) — a hot key's events spread over ~bins
    groups — and phase 2 stitches each key's bin-boundary sessions by
    merging adjacent session SUMMARIES whose gap <= gap_s (within-bin
    sessions are already maximal, so summary-level merging is exact).
    Phase-2 state per key is its session summaries, smaller than its
    events by the events-per-session factor — the residual assumption
    (documented): one key's SESSION LIST fits one group.

    Both phases are segment-vectorised over co-hash blocks (lexsort +
    reduceat — no per-key Python calls)."""
    gap_us = gap_s * 1_000_000
    bin_us = (bin_s or max(gap_s * 64, 3600)) * 1_000_000

    ds = ds.map_batches(_to_cents, fn_kwargs={"value_col": value_col}, batch_format="pyarrow")

    from .dedup import _col_np, _segments
    from .partition import cohash_map_groups

    def tag_bin(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column("_bin", pa.array(ts // bin_us, pa.int64()))

    tagged = ds.map_batches(tag_bin, batch_format="pyarrow", zero_copy_batch=True)

    def local_sessions(g: pa.Table) -> pa.Table:
        ts_np = g.column(ts_col).cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order, bounds = _segments(g, [key, "_bin"], extra=ts_np)
        ts = ts_np[order]
        cents = g.column("_cents").combine_chunks().to_numpy(
            zero_copy_only=False
        )[order]
        heads = np.zeros(len(order), dtype=bool)
        heads[bounds[:-1]] = True
        idx, n, start, end, sums = _sessionize_sorted(ts, heads, cents, gap_us)
        keys_col = g.take(pa.array(order[idx])).column(key)
        return pa.table(
            {
                key: keys_col,
                "_start": pa.array(start, pa.int64()),
                "_end": pa.array(end, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sum_value_cents": pa.array(sums, pa.int64()),
            }
        )

    summaries = cohash_map_groups(tagged, [key, "_bin"], local_sessions)

    def stitch(g: pa.Table) -> pa.Table:
        start_np = g.column("_start").combine_chunks().to_numpy(zero_copy_only=False)
        order, bounds = _segments(g, [key], extra=start_np)
        start = start_np[order]
        end = g.column("_end").combine_chunks().to_numpy(zero_copy_only=False)[order]
        n = g.column("n").combine_chunks().to_numpy(zero_copy_only=False)[order]
        cents = g.column("sum_value_cents").combine_chunks().to_numpy(
            zero_copy_only=False
        )[order]
        heads = np.zeros(len(order), dtype=bool)
        heads[bounds[:-1]] = True
        new = heads.copy()
        if len(start) > 1:
            # bin-adjacent sessions merge when the boundary gap closes;
            # within-key summaries are time-sorted and disjoint
            new[1:] |= (start[1:] - end[:-1]) > gap_us
        idx = np.nonzero(new)[0]
        m_start = start[idx]
        last = np.append(idx[1:], len(start)) - 1
        m_end = end[last]
        m_n = np.add.reduceat(n, idx) if len(idx) else np.zeros(0, np.int64)
        m_sum = np.add.reduceat(cents, idx) if len(idx) else np.zeros(0, np.int64)
        keys_col = g.take(pa.array(order[idx])).column(key)
        return pa.table(
            {
                key: keys_col,
                "session_start": pa.array(m_start, pa.timestamp("us")),
                "session_end": pa.array(m_end, pa.timestamp("us")),
                "n": pa.array(m_n.astype(np.int64), pa.int64()),
                "sum_value_cents": pa.array(m_sum.astype(np.int64), pa.int64()),
            }
        )

    return cohash_map_groups(summaries, [key], stitch)


def windowed_count_distinct(ds, *, ts_col: str = "ts", key_col: str = "user_id",
                            size_s: int = 3600):
    """Exact COUNT(DISTINCT key) per tumbling window.

    Scale shape: the only corpus-sized work is the per-batch pair
    projection + within-batch distinct (an Arrow group_by with no
    aggregates — a map-side combiner, so the shuffle carries unique
    (window, key) pairs per block, not events). ONE co-hash exchange on
    the window alone then does both reductions per coarse bucket: a
    (window, key) lexsort dedups pairs globally and the per-window
    distinct count falls out of the same segment boundaries (replaces
    two native sort aggregates)."""
    from .dedup import _col_np, _segments
    from .partition import cohash_map_groups

    def proj(t: pa.Table) -> pa.Table:
        t = add_tumbling_window(t, ts_col=ts_col, size_s=size_s)
        pairs = pa.table(
            {"window_start": t.column("window_start"), key_col: t.column(key_col)}
        )
        return pairs.group_by(["window_start", key_col]).aggregate([])

    pairs = ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)

    def count_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "window_start" not in g.column_names:
            return pa.table({"window_start": pa.array([], pa.timestamp("us")),
                             "users": pa.array([], pa.int64())})
        order, bounds = _segments(g, ["window_start", key_col])
        pair_heads = order[bounds[:-1]]  # one row per DISTINCT pair
        hw = g.take(pa.array(pair_heads)).select(["window_start"])
        w = _col_np(hw, "window_start")
        wb = np.concatenate(
            [[0], np.nonzero(w[1:] != w[:-1])[0] + 1, [len(w)]]
        ).astype(np.int64)
        out = hw.take(pa.array(wb[:-1]))
        return out.append_column("users", pa.array(np.diff(wb), pa.int64()))

    out = cohash_map_groups(pairs, ["window_start"], count_block)
    return out.map_batches(_pin_ts_us(["window_start"]), batch_format="pyarrow")


def assign_session_ids(ds, *, key: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id", gap_s: int = 1800):
    """EVENT-LEVEL sessionization: every event gets its key's 1-based
    session index (ordered by (ts, id); a gap > gap_s starts a new
    session) — the label funnels/attribution joins need, where
    ``session_windows`` only emits per-session summaries.

    ANSI-equivalent (the oracle): SUM(CASE WHEN ts - LAG(ts) > gap)
    OVER (PARTITION BY key ORDER BY ts, id). One co-hash shuffle, one
    lexsort per coarse block, cumulative-sum segment arithmetic — no
    per-key Python. Unlike the two-phase summary stitcher this is
    inherently event-sized per key (the output IS the events), so one
    key's events share a group; a pathological single hot key is the
    documented limit."""
    from .dedup import _col_np
    from .partition import cohash_map_groups

    gap_us = gap_s * 1_000_000

    def label(g: pa.Table) -> pa.Table:
        k = _col_np(g, key)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ident = _col_np(g, id_col)
        perm = np.lexsort((ident, ts, k))
        ks, tss = k[perm], ts[perm]
        n = len(perm)
        heads = np.empty(n, dtype=bool)
        if n:
            heads[0] = True
            heads[1:] = ks[1:] != ks[:-1]
        new = heads.copy()
        if n > 1:
            new[1:] |= (tss[1:] - tss[:-1]) > gap_us
        csum = np.cumsum(new)
        base = np.maximum.accumulate(np.where(heads, csum - 1, 0))
        sid = csum - base
        return g.take(pa.array(perm)).append_column(
            "session_idx", pa.array(sid, pa.int64())
        )

    return cohash_map_groups(ds, [key], label)
