"""Partitioned analytic (window-function) operators.

SQL-style analytic functions over a partitioned log: ROW_NUMBER / RANK /
DENSE_RANK / LAG / LEAD per key, ROLLUP grouping sets, pivot (conditional
aggregation) and explode/unnest. The reference engine has none of these
(SURVEY.md §2.7 — go-datax transforms are record-at-a-time only); they are
the analytics layer a replacement engine needs for parity with what users
run AROUND the reference today.

Ray-Data shapes (all chosen for the 100-TB case):

- ``ranked_window``: per-key ordered state → the co-hashed map_groups
  pattern (partition.cohash_map_groups): one shuffle on ``hash(key) %
  n_groups`` coarse buckets, then ONE numpy lexsort per bucket segments
  thousands of logical keys at once — no per-key Python call, no global
  sort. Partitioning assumption (documented, same as session windows):
  one key's rows fit one coarse bucket; keys are user-/url-grained.
- ``rollup_aggregate``: the ONLY big shuffle is the finest-level
  groupby; coarser levels re-aggregate the (small, distinct-key-sized)
  base result — never the raw input. This is the classic two-level
  rollup that makes GROUPING SETS O(input) instead of O(input x levels).
- ``pivot_aggregate``: pivot values are discovered with a projected
  ``unique`` (tiny shuffle over ONE column), then the wide conditional
  columns are built vectorised per batch and summed in ONE groupby —
  Ray's sort aggregate partial-aggregates map-side, so the shuffle
  carries ~|index| x |values| ints, not events.
- ``explode_tokens``: pure per-batch Arrow kernels
  (split_pattern_regex → list_flatten / list_parent_indices) — a
  flat_map with zero Python per row and no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.refcache import ref_cached
from .windows import _to_cents


def _np_sort_key(col: pa.ChunkedArray) -> np.ndarray:
    """Numpy view of a column usable as a lexsort key (timestamps → int64).

    String columns factorize via dictionary encoding: the codes are
    APPEARANCE-ordered, so they are valid for segmentation/identity but
    NOT for magnitude comparisons — use a real unicode array when the
    order itself matters."""
    def _one(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    if pa.types.is_timestamp(col.type) or pa.types.is_integer(col.type):
        return _one(col.cast(pa.int64())).to_numpy(zero_copy_only=False)
    if pa.types.is_floating(col.type):
        return _one(col).to_numpy(zero_copy_only=False)
    # strings: factorize via arrow dictionary encoding (C, not Python)
    enc = _one(pc.dictionary_encode(_one(col)))
    return enc.indices.to_numpy(zero_copy_only=False)


def ranked_window(
    ds,
    *,
    by: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    value_col: str = "value",
):
    """ROW_NUMBER / RANK / DENSE_RANK / LAG / LEAD per ``by`` key.

    Semantics (matches ANSI SQL / DuckDB):
      rn    = ROW_NUMBER() OVER (PARTITION BY by ORDER BY order, tiebreak)
      rnk   = RANK()        OVER (PARTITION BY by ORDER BY order)
      drnk  = DENSE_RANK()  OVER (PARTITION BY by ORDER BY order)
      prev_value = LAG(value)  OVER (... ORDER BY order, tiebreak)
      next_value = LEAD(value) OVER (... ORDER BY order, tiebreak)
      pct_rank   = PERCENT_RANK() OVER (PARTITION BY by ORDER BY order)
      cume_dist  = CUME_DIST()    OVER (PARTITION BY by ORDER BY order)

    RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST order by ``order`` alone
    (ties share a rank), so the output is deterministic even with
    duplicate timestamps; rn/lag/lead use the unique ``tiebreak`` and
    are deterministic too. The two ratio columns divide the same int64
    pairs ANSI engines divide ((rnk-1)/(n-1) and peers_through/n), so
    the doubles are IEEE-bit-identical to DuckDB's.
    """
    from .partition import cohash_map_groups

    def rank_block(g: pa.Table) -> pa.Table:
        key = _np_sort_key(g.column(by))
        ts = _np_sort_key(g.column(order))
        tb = _np_sort_key(g.column(tiebreak))
        # lexsort: LAST key is primary
        perm = np.lexsort((tb, ts, key))
        n = len(perm)
        key_s, ts_s = key[perm], ts[perm]
        seg_start = np.empty(n, dtype=bool)  # first row of each `by` segment
        if n:
            seg_start[0] = True
            seg_start[1:] = key_s[1:] != key_s[:-1]
        starts = np.flatnonzero(seg_start)
        # row_number: arange minus the segment start index, +1
        seg_of = np.maximum.accumulate(np.where(seg_start, np.arange(n), 0))
        rn = np.arange(n) - seg_of + 1
        # rank: index (within segment) of the first row of the current
        # equal-`order` run, +1; dense_rank: run counter within segment
        new_run = seg_start.copy()
        if n > 1:
            new_run[1:] |= ts_s[1:] != ts_s[:-1]
        run_of = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        rnk = run_of - seg_of + 1
        runs_cum = np.cumsum(new_run)
        drnk = runs_cum - np.repeat(runs_cum[starts] - 1, np.diff(np.r_[starts, n]))
        sorted_tbl = g.take(pa.array(perm))
        v = sorted_tbl.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        prev = np.empty_like(v)
        nxt = np.empty_like(v)
        if n:
            prev[1:] = v[:-1]
            prev[0] = 0.0
            nxt[:-1] = v[1:]
            nxt[-1] = 0.0
        seg_end = np.empty(n, dtype=bool)
        if n:
            seg_end[:-1] = seg_start[1:]
            seg_end[-1] = True
        # per-row segment size, and the within-segment index of the LAST
        # row of the current equal-`order` run (for CUME_DIST)
        seg_sizes = np.diff(np.r_[starts, n])
        seg_n = np.repeat(seg_sizes, seg_sizes)
        run_starts = np.flatnonzero(new_run)
        run_ends = np.r_[run_starts[1:], n] - 1  # global index per run
        run_id = np.cumsum(new_run) - 1
        peers_through = run_ends[run_id] - seg_of + 1
        denom = np.maximum(seg_n - 1, 1)
        pct_rank = (rnk - 1).astype(np.float64) / denom.astype(np.float64)
        cume = peers_through.astype(np.float64) / seg_n.astype(np.float64)
        return (
            sorted_tbl.append_column("rn", pa.array(rn, pa.int64()))
            .append_column("rnk", pa.array(rnk, pa.int64()))
            .append_column("drnk", pa.array(drnk, pa.int64()))
            .append_column("prev_value", pa.array(prev, pa.float64(), mask=seg_start))
            .append_column("next_value", pa.array(nxt, pa.float64(), mask=seg_end))
            .append_column("pct_rank", pa.array(pct_rank, pa.float64()))
            .append_column("cume_dist", pa.array(cume, pa.float64()))
        )

    return cohash_map_groups(ds, [by], rank_block)


def rolling_frame(ds, *, by: str = "user_id", order: str = "ts",
                  tiebreak: str = "event_id", cents_col: str = "cents",
                  window: int = 4):
    """Per-key ROWS-frame moving aggregates — the ANSI
    ``SUM/COUNT/AVG(x) OVER (PARTITION BY by ORDER BY order, tiebreak
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Fully vectorised per co-hash block: one lexsort, a cumulative sum,
    and a segment-clamped window-start index (max(i-window+1,
    segment_start)) — no per-key Python calls, no per-row loops.
    ``cents_col`` must be int64 (exact integer sums; the caller converts
    money via ROUND(value*100)); the moving average is emitted as the
    IEEE division of the two exact integers, so it is bit-identical to
    a SQL engine dividing the same pair.

    Appends: roll_sum_cents (int64), roll_n (int64), roll_avg_cents
    (float64). Scale shape: the shuffle carries only the projected
    columns; each key lands in one co-hash block (documented
    single-block-per-key assumption shared with ranked_window)."""
    from .partition import cohash_map_groups

    def frame_block(g: pa.Table) -> pa.Table:
        key = _np_sort_key(g.column(by))
        ts = _np_sort_key(g.column(order))
        tb = _np_sort_key(g.column(tiebreak))
        perm = np.lexsort((tb, ts, key))
        n = len(perm)
        key_s = key[perm]
        seg_start = np.empty(n, dtype=bool)
        if n:
            seg_start[0] = True
            seg_start[1:] = key_s[1:] != key_s[:-1]
        seg_of = np.maximum.accumulate(np.where(seg_start, np.arange(n), 0))
        sorted_tbl = g.take(pa.array(perm))
        v = sorted_tbl.column(cents_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(v)])  # csum[i+1] = sum v[:i+1]
        start = np.maximum(np.arange(n) - (window - 1), seg_of)
        roll_sum = csum[np.arange(n) + 1] - csum[start]
        roll_n = np.arange(n) - start + 1
        roll_avg = roll_sum.astype(np.float64) / roll_n.astype(np.float64)
        return (
            sorted_tbl.append_column("roll_sum_cents", pa.array(roll_sum, pa.int64()))
            .append_column("roll_n", pa.array(roll_n, pa.int64()))
            .append_column("roll_avg_cents", pa.array(roll_avg, pa.float64()))
        )

    return cohash_map_groups(ds, [by], frame_block)


def rollup_aggregate(ds, *, keys: list[str], value_col: str = "value"):
    """GROUP BY ROLLUP(keys...): one row set per prefix level, coarser
    levels null-filled — count + exact-cents sum per group.

    Only the finest level touches the raw input; every coarser level
    re-aggregates the finest-level result (distinct-key-sized)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .partition import bounded_groupby

    ds2 = ds.map_batches(
        lambda t: _to_cents(t, value_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base = bounded_groupby(ds2, keys).aggregate(
        Count(alias_name="n"), Sum("_cents", alias_name="sum_value_cents")
    ).materialize()  # small: one row per distinct key combo

    sch = base.schema()  # ray Schema: parallel .names / .types (pyarrow)
    key_types = {k: dict(zip(sch.names, sch.types))[k] for k in keys}

    def with_nulls(level: int):
        """Null-fill the rolled-up key columns and fix column order."""

        def fix(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys[:level]:
                cols[k] = t.column(k)
            for k in keys[level:]:
                cols[k] = pa.nulls(t.num_rows, key_types[k])
            cols["n"] = t.column("n").cast(pa.int64())
            cols["sum_value_cents"] = t.column("sum_value_cents").cast(pa.int64())
            return pa.table(cols)

        return fix

    levels = [base.map_batches(with_nulls(len(keys)), batch_format="pyarrow")]
    for lvl in range(len(keys) - 1, 0, -1):
        agg = base.groupby(keys[:lvl]).aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
        levels.append(agg.map_batches(with_nulls(lvl), batch_format="pyarrow"))
    # grand total: scalar aggregate on the driver (a single row)
    tot = base.aggregate(Sum("n"), Sum("sum_value_cents"))
    total_tbl = pa.table(
        {
            **{k: pa.nulls(1, key_types[k]) for k in keys},
            "n": pa.array([int(tot["sum(n)"])], pa.int64()),
            "sum_value_cents": pa.array(
                [int(tot["sum(sum_value_cents)"])], pa.int64()
            ),
        }
    )
    levels.append(rd.from_arrow(total_tbl))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_aggregate(ds, *, keys: list[str], value_col: str = "value"):
    """GROUP BY CUBE(keys...): one row set per key SUBSET (2^k grouping
    sets), absent keys null-filled — count + exact-cents sum per group.

    Same cost model as ``rollup_aggregate``: only the finest grouping
    touches the raw input (one bounded shuffle); every other subset
    re-aggregates the distinct-combo-sized base result, so the 2^k
    explosion applies to the tiny aggregate, never the corpus."""
    import itertools

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .partition import bounded_groupby

    ds2 = ds.map_batches(
        lambda t: _to_cents(t, value_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base = bounded_groupby(ds2, keys).aggregate(
        Count(alias_name="n"), Sum("_cents", alias_name="sum_value_cents")
    ).materialize()  # small: one row per distinct key combo

    sch = base.schema()
    key_types = {k: dict(zip(sch.names, sch.types))[k] for k in keys}

    def with_subset(subset: tuple):
        keep = set(subset)

        def fix(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (
                    t.column(k) if k in keep else pa.nulls(t.num_rows, key_types[k])
                )
            cols["n"] = t.column("n").cast(pa.int64())
            cols["sum_value_cents"] = t.column("sum_value_cents").cast(pa.int64())
            return pa.table(cols)

        return fix

    levels = [base.map_batches(with_subset(tuple(keys)), batch_format="pyarrow")]
    for r in range(len(keys) - 1, 0, -1):
        for subset in itertools.combinations(keys, r):
            agg = base.groupby(list(subset)).aggregate(
                Sum("n", alias_name="n"),
                Sum("sum_value_cents", alias_name="sum_value_cents"),
            )
            levels.append(agg.map_batches(with_subset(subset), batch_format="pyarrow"))
    tot = base.aggregate(Sum("n"), Sum("sum_value_cents"))
    total_tbl = pa.table(
        {
            **{k: pa.nulls(1, key_types[k]) for k in keys},
            "n": pa.array([int(tot["sum(n)"])], pa.int64()),
            "sum_value_cents": pa.array(
                [int(tot["sum(sum_value_cents)"])], pa.int64()
            ),
        }
    )
    levels.append(rd.from_arrow(total_tbl))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            name_col: str = "metric", value_col: str = "value"):
    """UNPIVOT / melt — the inverse of pivot_aggregate: one output row
    per (input row, value column), all inside the batch. Pure Arrow
    column copies, NO shuffle and no row-wise Python; output rows =
    input rows x len(value_cols), streamed block by block (ANSI
    equivalent: UNION ALL of per-column SELECTs / DuckDB UNPIVOT)."""
    vtype = pa.float64()

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[name_col] = pa.array([c] * n, pa.string())
            cols[value_col] = t.column(c).cast(vtype)
            parts.append(pa.table(cols))
        if not parts:
            return pa.table(
                {**{k: t.column(k) for k in id_cols},
                 name_col: pa.nulls(n, pa.string()),
                 value_col: pa.nulls(n, vtype)}
            ).slice(0, 0)
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def _safe_name(v: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in str(v))


def pivot_aggregate(
    ds,
    *,
    index: str = "user_id",
    column: str = "event_type",
    value_col: str = "value",
    values: list[str] | None = None,
):
    """Pivot ``column``'s (small, discovered) value set into one
    exact-cents sum column per value, grouped by ``index``.

    SUM(CASE WHEN column = v THEN cents ELSE 0 END) per value — built
    vectorised per batch, reduced in ONE groupby whose map-side partial
    aggregation means the shuffle carries |index| x |values| ints."""
    from ray.data.aggregate import Count, Sum

    from .partition import bounded_groupby

    if values is None:
        values = sorted(ds.select_columns([column]).unique(column))

    zero = pa.scalar(0, pa.int64())

    def widen(t: pa.Table) -> pa.Table:
        t = _to_cents(t, value_col)
        et = t.column(column)
        cents = t.column("_cents")
        cols = {index: t.column(index)}
        for v in values:
            cols[f"{_safe_name(v)}_cents"] = pc.if_else(
                pc.equal(et, pa.scalar(v)), cents, zero
            )
        return pa.table(cols)

    wide = ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Count(alias_name="n")] + [
        Sum(f"{_safe_name(v)}_cents", alias_name=f"{_safe_name(v)}_cents")
        for v in values
    ]
    out = bounded_groupby(wide, index).aggregate(*aggs)

    def conform(t: pa.Table) -> pa.Table:
        for name in t.column_names:
            if name.endswith("_cents") or name == "n":
                i = t.column_names.index(name)
                t = t.set_column(i, name, t.column(name).cast(pa.int64()))
        return t

    return out.map_batches(conform, batch_format="pyarrow")


def funnel_counts(ds, *, user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type", steps: list[str] | None = None):
    """Ordered-funnel conversion: users whose FIRST step-i event is
    strictly after their first qualifying step-(i-1) event, per step.

    ONE exchange (round-4 rewrite: the former per-step groupby-min +
    broadcast-frontier chain paid the sort shuffle's fixed overhead
    THREE times — 3.6 s of a 4 s wall at sf0.1): project (user, step_idx,
    ts), co-hash ALL of a user's step events into one bucket, and resolve
    the whole chain vectorized per bucket — per step s, t_s[user] =
    min ts among step-s rows with ts > t_{s-1}[user], one masked
    ``np.minimum.at`` per step, no per-user Python loop. Buckets emit
    3-row partial counts; the driver folds 3 x n_buckets ints.

    Output: one row per step — (step, users:int64).
    """
    steps = steps or ["signup", "click", "purchase"]
    import ray.data as rdm

    from .partition import cohash_map_groups

    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)
    step_arr = pa.array(steps, pa.string())

    def proj(t: pa.Table) -> pa.Table:
        st = pc.index_in(t.column(type_col), value_set=step_arr)  # null = not a step
        out = pa.table({
            user_col: t.column(user_col),
            "_st": pc.fill_null(st, -1).cast(pa.int8()),
            "_ts": t.column(ts_col).cast(pa.int64()),
        })
        return out.filter(pc.greater_equal(out.column("_st"), pa.scalar(0, pa.int8())))

    def bucket_counts(g: pa.Table) -> pa.Table:
        users = g.column(user_col).to_numpy(zero_copy_only=False)
        st = g.column("_st").to_numpy(zero_copy_only=False)
        ts = g.column("_ts").to_numpy(zero_copy_only=False)
        _, uinv = np.unique(users, return_inverse=True)
        n_users = int(uinv.max()) + 1 if len(uinv) else 0
        prev = np.zeros(n_users, dtype=np.int64)  # sentinel: ts > -inf
        prev_ok = np.ones(n_users, dtype=bool)
        counts = np.zeros(n_steps, dtype=np.int64)
        first = True
        for s in range(n_steps):
            cur = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
            rows = st == s
            if not first:
                rows &= prev_ok[uinv] & (ts > prev[uinv])
            np.minimum.at(cur, uinv[rows], ts[rows])
            ok = cur != np.iinfo(np.int64).max
            counts[s] = int(ok.sum())
            prev, prev_ok, first = cur, ok, False
        return pa.table({
            "_s": pa.array(np.arange(n_steps), pa.int64()),
            "_n": pa.array(counts, pa.int64()),
        })

    partials = cohash_map_groups(
        ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        [user_col], bucket_counts,
    ).take_all()  # 3 ints per bucket — metadata-scale
    totals = np.zeros(n_steps, dtype=np.int64)
    for r in partials:
        totals[r["_s"]] += r["_n"]
    return rdm.from_arrow(
        pa.table({"step": step_arr, "users": pa.array(totals, pa.int64())})
    )


def explode_tokens(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """UNNEST(whitespace-split tokens): (id, token) pair per token.

    Pure Arrow kernels, no shuffle — split_pattern_regex builds the list
    column, list_flatten/list_parent_indices explode it, empty tokens
    (leading/trailing whitespace artifacts) are filtered to match
    DuckDB's ``unnest(string_split_regex(...)) ... <> ''``."""

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column(text_col), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        out = pa.table({id_col: t.column(id_col).take(parent), "token": flat})
        return out.filter(pc.not_equal(out.column("token"), pa.scalar("")))

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def grouped_mode(ds, *, group: str = "user_id", value: str = "event_type"):
    """Per-group MODE (most frequent value; ties -> smallest value).

    Two bounded shuffles, both on reduced data: counts per (group,
    value) with Ray's map-side partial aggregation, then the existing
    segment-vectorised top-k (k=1, order=n desc, tiebreak=value asc)
    over the distinct-combo-sized counts table."""
    from ray.data.aggregate import Count

    from .partition import bounded_groupby
    from .sampling import top_k_per_group

    counts = bounded_groupby(
        ds.select_columns([group, value]), [group, value]
    ).aggregate(Count(alias_name="n"))

    def conform(t: pa.Table) -> pa.Table:
        i = t.column_names.index("n")
        return t.set_column(i, "n", t.column("n").cast(pa.int64()))

    counts = counts.map_batches(conform, batch_format="pyarrow")
    return top_k_per_group(counts, group=group, order="n", k=1, tiebreak=value)


def grouped_outliers(ds, *, group: str = "user_id", value_col: str = "value",
                     id_col: str = "event_id", n_sigma: int = 2):
    """Per-group outlier flag: |x - mean| > n_sigma * std (population),
    decided EXACTLY from integer-cents moments so the boolean is
    reproducible across engines: with s = sum(cents), q = sum(cents^2),
    n = count, the test is (n*x - s)^2 > n_sigma^2 * (n*q - s^2) — both
    sides computed as float64 from exact int64 moments in the SAME
    expression order the SQL oracle uses (identical IEEE results).

    Two-pass shape: one bounded groupby produces the per-group moment
    triple (tiny — one row per group), which joins back to the events
    via the broadcast path inside a map (per-batch vectorised flag).
    int64 moment overflow bound: |cents| < ~3e6 at 1e6 rows/group."""
    from ray.data.aggregate import Count, Sum

    from .partition import bounded_groupby

    def cents_col(t: pa.Table) -> pa.Table:
        t = _to_cents(t, value_col)
        sq = pc.multiply(t.column("_cents"), t.column("_cents"))
        return t.append_column("_sq", sq)

    ev = ds.map_batches(cents_col, batch_format="pyarrow", zero_copy_batch=True)
    stats = bounded_groupby(
        ev.select_columns([group, "_cents", "_sq"]), group
    ).aggregate(
        Count(alias_name="_n"),
        Sum("_cents", alias_name="_s"),
        Sum("_sq", alias_name="_q"),
    ).materialize()  # one row per group

    refs = tuple(stats.to_arrow_refs())

    def flag(t: pa.Table) -> pa.Table:
        gs, n, s, q = _moment_lookup(refs, group)
        gv = t.column(group).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(gs, gv)
        pos = np.minimum(pos, len(gs) - 1)
        x = t.column("_cents").to_numpy(zero_copy_only=False).astype(np.int64)
        ni, si, qi = n[pos], s[pos], q[pos]
        lhs = (ni * x - si).astype(np.float64) ** 2
        rhs = float(n_sigma * n_sigma) * (ni * qi - si * si).astype(np.float64)
        out = pa.table({
            id_col: t.column(id_col),
            group: t.column(group),
            "is_outlier": pa.array(lhs > rhs),
        })
        return out

    return ev.map_batches(flag, batch_format="pyarrow")


@ref_cached(2)
def _moment_lookup(refs: tuple, group: str):
    """(sorted groups, n, sum, sumsq) int64 arrays from the broadcast
    per-group moment refs — worker-cached, hex-keyed (a closure-local
    lru_cache here outlived executions inside Ray's deserialized-function
    cache and pinned the refs — the VERDICT r3 #2 teardown crash)."""
    import ray as _ray

    tables = [x for x in _ray.get(list(refs)) if x.num_rows]
    st = pa.concat_tables(tables)
    g = st.column(group).to_numpy(zero_copy_only=False)
    order = np.argsort(g, kind="stable")
    return (g[order],
            st.column("_n").to_numpy(zero_copy_only=False)[order].astype(np.int64),
            st.column("_s").to_numpy(zero_copy_only=False)[order].astype(np.int64),
            st.column("_q").to_numpy(zero_copy_only=False)[order].astype(np.int64))


import functools as _ft


@ref_cached(4)
def _ntile_lookup(refs: tuple):
    """(sorted distinct values, exclusive prefix counts, total n) from the
    broadcast per-value histogram refs — worker-cached (joins'
    _ref_value_set contract)."""
    import ray as _ray

    tables = [t for t in _ray.get(list(refs)) if t.num_rows]
    t = pa.concat_tables(tables)
    v = t.column("v").to_numpy(zero_copy_only=False)
    c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    prefix = np.concatenate([[0], np.cumsum(c)[:-1]])
    return v, prefix, int(c.sum())


def global_ntile(ds, *, value_col: str = "value", id_col: str = "event_id",
                 k: int = 4):
    """Exact NTILE(k) OVER (ORDER BY value, id) WITHOUT a global sort.

    rank(row) = #rows with smaller value + #same-value rows with smaller
    id. Two passes:
    1. per-VALUE histogram (combiner groupby — the shuffle is bounded by
       the value DOMAIN, not the row count) -> broadcast as object-store
       refs, each worker folds it once into (sorted values, exclusive
       prefix counts, n).
    2. rows co-hash-shuffle on the value's BIT PATTERN (exact float
       equality grouping) so equal values co-locate; one lexsort per
       coarse bucket yields the within-value id rank; global rank =
       prefix[value] + within; the bucket follows DuckDB's NTILE split
       (first n%k buckets get ceil(n/k) rows).

    Partitioning assumption (documented): rows sharing ONE value fit one
    coarse bucket — for genuinely discrete/low-cardinality values with
    huge tie classes, pre-bucket by (value, id-range) instead."""
    from ray.data.aggregate import Count

    from .partition import bounded_groupby, cohash_map_groups

    counts = bounded_groupby(
        ds.map_batches(
            lambda t: pa.table({"v": t.column(value_col)}),
            batch_format="pyarrow",
        ),
        "v",
    ).aggregate(Count(alias_name="c")).materialize()  # domain-bounded
    refs = tuple(counts.to_arrow_refs())

    def tag(t: pa.Table) -> pa.Table:
        bits = t.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).view(np.int64)
        return t.append_column("_vb", pa.array(bits, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def rank_block(g: pa.Table) -> pa.Table:
        vs, prefix, total = _ntile_lookup(refs)
        q, r = divmod(total, k)
        v = g.column(value_col).combine_chunks().to_numpy(zero_copy_only=False)
        ids = g.column(id_col).cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ids, v))
        v_s = v[order]
        heads = np.concatenate([[True], v_s[1:] != v_s[:-1]])
        seg_of = np.maximum.accumulate(np.where(heads, np.arange(len(v_s)), 0))
        within = np.arange(len(v_s)) - seg_of
        base = prefix[np.searchsorted(vs, v_s)]
        rank = base + within  # 0-based global rank
        big = r * (q + 1)
        if q == 0:
            bucket = rank // max(q + 1, 1)
        else:
            bucket = np.where(rank < big, rank // (q + 1),
                              r + (rank - big) // q)
        out = g.take(pa.array(order)).select([id_col, value_col])
        return out.append_column(
            "bucket", pa.array((bucket + 1).astype(np.int64), pa.int64())
        )

    return cohash_map_groups(tagged, ["_vb"], rank_block)
