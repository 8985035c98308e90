"""Incremental corpus dedup against a PERSISTED signature index.

Production shape (incremental web-crawl curation, CCNet/C4-style): the
committed corpus was deduped once; every new crawl increment must be
deduped (a) within itself and (b) against the committed corpus WITHOUT
re-hashing or re-shuffling the committed corpus. The index stores, as
plain parquet under ``index_dir``:

  exact/gen-*.parquet   (content_hash)                 exact-dup lookups
  lsh/gen-*.parquet     (doc_id, band, band_hash)      near-dup candidates
  meta.json             minhash params + generation    (signatures are only
                        comparable when derived with the SAME params)

The near-dup DECISION never relies on the index: verification is exact
word-k-gram Jaccard, with candidate old docs' text fetched from the
caller-supplied committed corpus (a parquet re-read, semi-join filtered
in-cluster — at web scale the index is ~40 B + bands x 24 B per doc
while the corpus is KBs per doc, so candidate generation touches ~0.1%
of the bytes a full recompute would). Incremental output == a full
recompute over old ∪ new with keep-first semantics where old ids always
win (pinned by test).

Scale shape: old LSH rows stream from parquet straight into the
(band, band_hash) co-hash shuffle; candidate/loser id sets live in the
object store (block refs pulled per worker), never on the driver; the
committed corpus is touched once, filtered to candidate ids only.

The reference engine has no dedup operators at all (SURVEY §2.7) — its
closest analogue is sink-side PK conflict resolution
(/root/reference/common/database/rdbms/writer/common.go:557-607).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import (
    MAX_LSH_BUCKET,
    _LOG,
    _col_np,
    _distinct_pairs,
    _segments,
    add_content_hash,
    broadcast_verify_batch,
    cluster_pairs,
    cluster_pairs_distributed,
    exact_dedup,
    minhash_batch,
    minhash_candidate_pairs,
    verify_pairs_distributed,
)

META_NAME = "meta.json"

_PARAM_KEYS = ("text_col", "id_col", "num_perm", "bands", "k", "seed",
               "min_shingles")


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, META_NAME)


def load_index_meta(index_dir: str) -> dict[str, Any]:
    with open(_meta_path(index_dir)) as f:
        return json.load(f)


def _write_generation(ds, index_dir: str, meta: dict, *, gen: int) -> dict:
    """Append one generation of exact + LSH rows for ``ds`` (docs that
    are already deduped). Files are generation-scoped so a crashed
    append can be re-run idempotently (same gen overwrites its own
    directory)."""
    text_col, id_col = meta["text_col"], meta["id_col"]
    mh_kw = {k: meta[k] for k in _PARAM_KEYS if k not in ("text_col", "id_col")}

    import shutil

    # write_parquet APPENDS files — clear the generation dirs first so a
    # crashed-then-retried append really overwrites instead of doubling
    # the generation's rows (benign for dedup correctness — pairs and
    # hash membership dedup — but it would double the index size)
    for sub in ("exact", "lsh"):
        shutil.rmtree(os.path.join(index_dir, sub, f"gen-{gen}"),
                      ignore_errors=True)

    exact = ds.map_batches(
        add_content_hash, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        lambda t: t.select(["content_hash"]), batch_format="pyarrow"
    )
    exact.write_parquet(os.path.join(index_dir, "exact", f"gen-{gen}"))
    lsh = ds.map_batches(
        minhash_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, **mh_kw),
        batch_format="pyarrow",
    )
    lsh.write_parquet(os.path.join(index_dir, "lsh", f"gen-{gen}"))
    meta["generation"] = gen
    with open(_meta_path(index_dir), "w") as f:
        json.dump(meta, f)
    return meta


def build_dedup_index(ds, index_dir: str, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, k: int = 3, seed: int = 42,
                      min_shingles: int = 1) -> dict[str, Any]:
    """Build the index over an ALREADY-DEDUPED committed corpus.
    ``ds`` ids must be non-negative int64 and disjoint from every future
    increment's ids (the keep-first total order is old-before-new)."""
    os.makedirs(index_dir, exist_ok=True)
    meta = dict(text_col=text_col, id_col=id_col, num_perm=num_perm,
                bands=bands, k=k, seed=seed, min_shingles=min_shingles,
                generation=0)
    return _write_generation(ds, index_dir, meta, gen=0)


def _cross_pair_fn(id_col: str, max_bucket: int):
    """(old x new) pairs within each (band, band_hash) bucket of a
    co-hash block — the cross-generation analogue of
    dedup._bucket_pair_fn. Output columns: id_a = OLD doc id,
    id_b = NEW doc id. Buckets over the cap emit nothing (logged)."""

    def block_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if g.num_rows == 0 or id_col not in g.column_names:
            return empty
        order, bounds = _segments(g, ["band", "band_hash"])
        ids_sorted = _col_np(g, id_col)[order]
        gen_sorted = _col_np(g, "_gen")[order]
        counts = np.diff(bounds)
        over = counts > max_bucket
        if over.any():
            for n in counts[over]:
                _LOG.warning(
                    "incremental LSH bucket overflow: %d docs > cap %d — "
                    "dropping cross-pair generation for this bucket",
                    n, max_bucket,
                )
        ia, ib = [], []
        for si in np.nonzero((counts >= 2) & ~over)[0]:
            s, e = bounds[si], bounds[si + 1]
            seg_ids, seg_gen = ids_sorted[s:e], gen_sorted[s:e]
            old = seg_ids[seg_gen == 0]
            new = seg_ids[seg_gen == 1]
            if len(old) == 0 or len(new) == 0:
                continue
            ia.append(np.repeat(old, len(new)))
            ib.append(np.tile(new, len(old)))
        if not ia:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(ia), pa.int64()),
                "id_b": pa.array(np.concatenate(ib), pa.int64()),
            }
        )

    return block_pairs


def incremental_dedup(new_ds, index_dir: str, old_docs, *,
                      threshold: float = 0.7,
                      max_bucket: int = MAX_LSH_BUCKET,
                      broadcast_threshold: int = 20_000,
                      cc_threshold: int = 2_000_000,
                      update_index: bool = True):
    """Dedup a new increment within itself AND against the committed
    corpus, touching the committed corpus only to fetch candidate docs.

    ``old_docs``: Dataset over the committed corpus (id_col, text_col at
    minimum) — typically a parquet re-read; it is filtered in-cluster to
    the candidate old ids before any text moves.

    Keep-first total order: committed docs ALWAYS win; within the new
    increment the smallest id wins (including transitively: a new doc
    connected to the committed corpus through other new docs is
    removed). Returns ``(survivors_ds, stats)``; when ``update_index``,
    survivors' exact hashes + LSH rows are appended as a new index
    generation so the NEXT increment dedups against them too."""
    import ray.data as rd

    from .joins import _filter_by_refs, bucket_hash_join, remove_keys
    from .partition import cohash_map_groups

    meta = load_index_meta(index_dir)
    text_col, id_col = meta["text_col"], meta["id_col"]
    mh_kw = {k: meta[k] for k in _PARAM_KEYS if k not in ("text_col", "id_col")}
    stats: dict[str, Any] = {}

    # -- 1. exact dedup WITHIN the increment (keep smallest new id) -----
    new_ds = exact_dedup(new_ds, text_col=text_col, key_col=id_col)

    # -- 2. exact dedup vs the committed corpus: anti-join the hash -----
    hashed = new_ds.map_batches(
        add_content_hash, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    old_exact = rd.read_parquet(os.path.join(index_dir, "exact"))
    new_ds = bucket_hash_join(
        hashed, old_exact, on="content_hash", how="anti"
    ).drop_columns(["content_hash"]).materialize()
    # ^ materialized: four downstream consumers (new-new pairs, new LSH
    # rows, candidate-doc fetch, loser removal) would otherwise each
    # RE-EXECUTE the exact-dedup cohash shuffle + the anti-join against
    # the index (measured: the re-execution alone erased the whole
    # incremental speedup at the 10x soak). The increment is the small
    # side by definition; blocks live in the object store and spill.

    # -- 3. near-dup candidates ------------------------------------------
    # new-new pairs (both ids new)
    nn_pairs = minhash_candidate_pairs(
        new_ds, text_col=text_col, id_col=id_col, max_bucket=max_bucket, **mh_kw
    )
    # new-old pairs: new LSH rows are recomputed; OLD rows stream from
    # the index parquet — the committed corpus is never re-hashed
    new_lsh = new_ds.map_batches(
        minhash_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, **mh_kw),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: band-hash set + cross exchange
    # prune old rows MAP-SIDE against the increment's band-hash set
    # (bands x increment_docs hashes, broadcast as refs): only old rows
    # that could collide enter the cross exchange, so the exchange is
    # sized by the collision set, not by 16 rows per committed doc
    from .dedup import _distinct_ids

    new_bh = _distinct_ids(new_lsh.select_columns(["band_hash"]),
                           "band_hash").materialize()
    bh_refs = tuple(new_bh.to_arrow_refs())
    old_lsh = rd.read_parquet(os.path.join(index_dir, "lsh")).map_batches(
        _filter_by_refs, fn_kwargs=dict(on="band_hash", refs=bh_refs, anti=False),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def tag(gen: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or id_col not in t.column_names:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "band": pa.array([], pa.int64()),
                    "band_hash": pa.array([], pa.int64()),
                    "_gen": pa.array([], pa.int64()),
                })
            return t.append_column(
                "_gen", pa.array(np.full(t.num_rows, gen, dtype=np.int64))
            )
        return fn

    both = old_lsh.map_batches(tag(0), batch_format="pyarrow").union(
        new_lsh.map_batches(tag(1), batch_format="pyarrow")
    )
    no_pairs = _distinct_pairs(
        cohash_map_groups(both, ["band", "band_hash"],
                          _cross_pair_fn(id_col, max_bucket))
    ).materialize()  # int64 id pairs only; consumed twice below
    pairs = _distinct_pairs(nn_pairs.union(no_pairs)).materialize()
    stats["candidate_pairs"] = pairs.count()
    if stats["candidate_pairs"] == 0:
        stats.update(candidate_docs=0, verified_pairs=0, removed_docs=0)
        survivors = new_ds.materialize()
        stats["survivors"] = survivors.count()  # uniform stats contract (ADVICE r3)
        if update_index:
            _write_generation(survivors, index_dir, meta,
                              gen=meta["generation"] + 1)
        return survivors, stats

    # -- 4. verify with EXACT Jaccard ------------------------------------
    def pair_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.concat_arrays([
                t.column("id_a").combine_chunks(),
                t.column("id_b").combine_chunks(),
            ])
        })

    from .dedup import _distinct_ids

    ids_ds = _distinct_ids(
        pairs.map_batches(pair_ids, batch_format="pyarrow"), id_col
    ).materialize()
    stats["candidate_docs"] = ids_ds.count()
    cand_refs = tuple(ids_ds.to_arrow_refs())
    proj = lambda t: t.select([id_col, text_col])  # noqa: E731
    cand_docs = new_ds.map_batches(
        _filter_by_refs, fn_kwargs=dict(on=id_col, refs=cand_refs, anti=False),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(proj, batch_format="pyarrow").union(
        old_docs.map_batches(
            _filter_by_refs, fn_kwargs=dict(on=id_col, refs=cand_refs, anti=False),
            batch_format="pyarrow", zero_copy_batch=True,
        ).map_batches(proj, batch_format="pyarrow")
    )
    if stats["candidate_docs"] <= broadcast_threshold:
        doc_refs = tuple(cand_docs.materialize().to_arrow_refs())
        verified = pairs.map_batches(
            broadcast_verify_batch,
            fn_kwargs=dict(doc_refs=doc_refs, text_col=text_col,
                           id_col=id_col, k=meta["k"], threshold=threshold),
            batch_format="pyarrow",
        )
    else:
        verified = verify_pairs_distributed(
            pairs, cand_docs, text_col=text_col, id_col=id_col,
            k=meta["k"], threshold=threshold,
        )
    ver = verified.materialize()
    stats["verified_pairs"] = ver.count()

    # -- 5. clusters: old ids always win ----------------------------------
    # Old ids are mapped to -(id+1) (ids must be >= 0, old/new disjoint):
    # every old id sorts below every new id, so min-rep clustering makes
    # any new doc TRANSITIVELY connected to the committed corpus a loser.
    # Old-id membership comes from the cross pairs (id_a is old by
    # construction; only cross pairs can involve old ids), shipped as
    # object-store refs — never in a task closure.
    def negate_old(t: pa.Table, *, refs: tuple) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return t
        from .joins import _ref_value_set

        olds = _ref_value_set(refs)
        a = _col_np(t, "id_a").copy()
        b = _col_np(t, "id_b").copy()
        if olds is not None:
            oset = olds.to_numpy(zero_copy_only=False)
            a = np.where(np.isin(a, oset), -(a + 1), a)
            b = np.where(np.isin(b, oset), -(b + 1), b)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})

    old_ids_ds = _distinct_ids(
        no_pairs.map_batches(
            lambda t: pa.table({"_oid": t.column("id_a")})
            if t.num_rows and "id_a" in t.column_names
            else pa.table({"_oid": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        "_oid",
    ).materialize()
    old_refs = tuple(old_ids_ds.to_arrow_refs())
    ver_oriented = ver.map_batches(
        negate_old, fn_kwargs=dict(refs=old_refs), batch_format="pyarrow"
    ).materialize()

    n_edges = ver_oriented.count()
    if n_edges <= cc_threshold:
        edges = [(r["id_a"], r["id_b"]) for r in ver_oriented.take_all()]
        reps = cluster_pairs(edges)
        loser_ids = sorted(i for i, r in reps.items() if r != i and i >= 0)
        stats["removed_docs"] = len(loser_ids)
        losers_ds = rd.from_arrow(
            pa.table({id_col: pa.array(loser_ids, pa.int64())})
        )
    else:
        labels = cluster_pairs_distributed(ver_oriented)
        losers_ds = labels.map_batches(
            lambda t: pa.table({
                id_col: t.filter(
                    pc.and_(
                        pc.not_equal(t.column("node"), t.column("label")),
                        pc.greater_equal(t.column("node"), pa.scalar(0)),
                    )
                ).column("node")
            }),
            batch_format="pyarrow",
        ).materialize()
        stats["removed_docs"] = losers_ds.count()

    survivors = remove_keys(new_ds, losers_ds, on=id_col).materialize()
    stats["survivors"] = survivors.count()
    if update_index:
        _write_generation(survivors, index_dir, meta,
                          gen=meta["generation"] + 1)
    return survivors, stats
