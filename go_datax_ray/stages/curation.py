"""Corpus-curation stages for LLM training-data pipelines.

Two operators the reference engine has no analogue for, but which any
web-scale corpus pipeline runs between ingestion and training:

* ``decontaminate`` — benchmark-overlap flagging: a training document is
  contaminated when it shares at least one word k-gram with any document
  in a held-out eval/benchmark set (the published FineWeb / Dolma
  decontamination semantics, re-expressed Ray-Data-first).
* ``gopher_quality`` — Gopher-style per-document quality rules
  (word-count band, mean-word-length band, duplicate-word fraction,
  stopword presence), emitted as INTEGER metrics plus booleans derived
  by integer cross-multiplication so the result is IEEE-free and
  hash-checkable against a DuckDB oracle.

Scale shape
-----------
Both operators tokenize with one vectorized Arrow ``split_pattern_regex``
per batch and do all per-document reductions with numpy
``bincount``/``lexsort`` over the flattened word array — no per-row
Python in the hot path (the only row loop is over documents SHORTER than
the shingle width, which collapse to one whole-text shingle).

``decontaminate`` is adaptive like ``joins.remove_keys``: eval shingle
sets up to ``broadcast_limit`` stay in the object store as block refs
(pulled once per worker process, lru-cached, searched with
``np.searchsorted``); larger sets route through the bucketed semi-join +
bounded groupby so the corpus pays one exchange but the eval set is
unbounded. Real benchmark suites are ~10^5-10^7 shingles, so the
broadcast path is the common case at 100 TB; the join path is the
escape hatch and is property-tested equal to the broadcast path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import md5_lower64_array
from ..state.refcache import ref_cached

# Classic English stopword probe (Gopher uses a similar small list).
# The list is a parameter: corpora with domain-specific vocabularies
# (code, logs, synthetic fixtures) pass their own.
DEFAULT_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


# ------------------------------------------------------------ tokenizing

def _flat_words(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``lower -> \\W+ split -> drop empties`` tokenization.

    Returns ``(flat_words, word_lens, doc_idx, n_words)`` where
    ``flat_words`` is an object ndarray of every word in batch order,
    ``word_lens`` its codepoint lengths, ``doc_idx`` the owning document
    index per word, and ``n_words`` the per-document word counts.
    Matches DuckDB ``list_filter(string_split_regex(lower(text),
    '\\W+'), x -> x != '')`` exactly (both sides are RE2).
    """
    arr = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), pattern=r"\W+"
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    values = arr.values
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.utf8_length(values).to_numpy(zero_copy_only=False)
    keep = lens > 0
    cum = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    n_words = cum[offsets[1:]] - cum[offsets[:-1]]
    flat = np.asarray(values, dtype=object)[keep]
    word_lens = lens[keep].astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    return flat, word_lens, doc_idx, n_words


def _distinct_shingles(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct word-k-gram hashes per document, vectorized.

    Returns ``(doc_idx, shingle_hash_u64, n_distinct_per_doc)`` with one
    row per DISTINCT shingle per document. Documents with 0 < n < k
    words collapse to one whole-text shingle; empty documents emit none
    — identical to ``dedup._shingle_hashes`` / the ngram_jaccard oracle.
    Hashes are ``md5_lower64`` (== DuckDB ``md5_number_lower``) of the
    space-joined shingle string.
    """
    flat, _, doc_idx, n_words = _flat_words(texts)
    n_docs = len(n_words)
    sh_strs: list[np.ndarray] = []
    sh_docs: list[np.ndarray] = []
    if len(flat) >= k:
        # Vector path: candidate shingle j spans words j..j+k-1; valid
        # when all k words belong to the same document.
        cand = flat[: len(flat) - k + 1]
        for i in range(1, k):
            cand = cand + " "
            cand = cand + flat[i : len(flat) - k + 1 + i]
        valid = doc_idx[: len(flat) - k + 1] == doc_idx[k - 1 :]
        sh_strs.append(cand[valid])
        sh_docs.append(doc_idx[: len(flat) - k + 1][valid])
    # Short documents (0 < n < k): one whole-text shingle each. Rare at
    # corpus scale; plain loop over just those documents.
    short = np.flatnonzero((n_words > 0) & (n_words < k))
    if short.size:
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_words, out=starts[1:])
        joined = np.array(
            [" ".join(flat[starts[d] : starts[d + 1]]) for d in short],
            dtype=object,
        )
        sh_strs.append(joined)
        sh_docs.append(short.astype(np.int64))
    if not sh_strs:
        empty = np.zeros(0, dtype=np.int64)
        return empty, np.zeros(0, dtype=np.uint64), np.zeros(n_docs, np.int64)
    strs = np.concatenate(sh_strs)
    docs = np.concatenate(sh_docs)
    hashes = md5_lower64_array(strs)
    order = np.lexsort((hashes, docs))
    docs, hashes = docs[order], hashes[order]
    first = np.ones(len(docs), dtype=bool)
    first[1:] = (docs[1:] != docs[:-1]) | (hashes[1:] != hashes[:-1])
    docs, hashes = docs[first], hashes[first]
    n_distinct = np.bincount(docs, minlength=n_docs).astype(np.int64)
    return docs, hashes, n_distinct


# ------------------------------------------------------------ decontaminate

def shingle_hash_ds(ds, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Project a corpus to one row per distinct (id, shingle-hash)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        docs, hashes, _ = _distinct_shingles(t.column(text_col), k)
        return pa.table(
            {
                id_col: pa.array(ids[docs], pa.int64()),
                "sh": pa.array(hashes.view(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


@ref_cached(4)
def _eval_shingle_set(refs: tuple) -> np.ndarray:
    """Pull the eval shingle blocks once per worker process and keep a
    sorted unique uint64 array for searchsorted membership tests."""
    import ray

    parts = [
        t.column("sh").to_numpy(zero_copy_only=False)
        for t in ray.get(list(refs))
        if t.num_rows
    ]
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts).astype(np.int64).view(np.uint64))


def _flag_batch(t: pa.Table, *, text_col: str, id_col: str, k: int, refs: tuple) -> pa.Table:
    ev = _eval_shingle_set(refs)
    ids = t.column(id_col).cast(pa.int64())
    docs, hashes, n_distinct = _distinct_shingles(t.column(text_col), k)
    n_docs = len(t)
    if ev.size and hashes.size:
        pos = np.searchsorted(ev, hashes)
        pos_c = np.minimum(pos, ev.size - 1)
        hit = (pos < ev.size) & (ev[pos_c] == hashes)
        n_hits = np.bincount(docs, weights=hit, minlength=n_docs).astype(np.int64)
    else:
        n_hits = np.zeros(n_docs, dtype=np.int64)
    return pa.table(
        {
            id_col: ids,
            "n_shingles": pa.array(n_distinct, pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array(n_hits > 0, pa.bool_()),
        }
    )


def decontaminate(ds, eval_ds, *, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, broadcast_limit: int = 5_000_000,
                  mode: str = "auto"):
    """Flag every document of ``ds`` that shares >= 1 word ``k``-gram
    with any document of ``eval_ds`` (the benchmark/eval corpus).

    Output: one row per ``ds`` document — ``(id, n_shingles, n_hits,
    contaminated)`` where ``n_hits`` counts the document's DISTINCT
    shingles that collide with the eval set (all int64/bool, so the
    driver value-hash is exact).

    ``mode``: ``"broadcast"`` pins the object-store-ref path,
    ``"join"`` pins the bucketed semi-join path, ``"auto"`` picks by
    eval shingle count vs ``broadcast_limit``.
    """
    from .partition import bounded_groupby
    from .joins import bucket_hash_join

    ev_sh = shingle_hash_ds(eval_ds, text_col=text_col, id_col=id_col, k=k)
    # Distinct eval shingles: tiny groupby (eval sets are small relative
    # to the corpus); also what the join path shuffles against.
    ev_distinct = bounded_groupby(ev_sh, ["sh"]).count().select_columns(["sh"])
    ev_distinct = ev_distinct.materialize()
    if mode == "auto":
        mode = "broadcast" if ev_distinct.count() <= broadcast_limit else "join"

    if mode == "broadcast":
        refs = tuple(ev_distinct.to_arrow_refs())
        return ds.map_batches(
            _flag_batch,
            fn_kwargs=dict(text_col=text_col, id_col=id_col, k=k, refs=refs),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    # Join path: corpus -> (id, sh) pairs; semi-join vs eval shingles;
    # bounded per-id count; left-join the counts back onto the per-doc
    # shingle totals. Two bounded exchanges, nothing on the driver.
    tr_sh = shingle_hash_ds(ds, text_col=text_col, id_col=id_col, k=k)
    pair_schema = pa.schema([(id_col, pa.int64()), ("sh", pa.int64())])
    ev_schema = pa.schema([("sh", pa.int64())])
    hits = bucket_hash_join(
        tr_sh, ev_distinct, on="sh", how="semi", schemas=(pair_schema, ev_schema)
    )
    hit_counts = bounded_groupby(hits, [id_col]).count()  # (id, count())

    def base(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64())
        _, _, n_distinct = _distinct_shingles(t.column(text_col), k)
        return pa.table(
            {id_col: ids, "n_shingles": pa.array(n_distinct, pa.int64())}
        )

    per_doc = ds.map_batches(base, batch_format="pyarrow", zero_copy_batch=True)
    base_schema = pa.schema([(id_col, pa.int64()), ("n_shingles", pa.int64())])
    cnt_schema = pa.schema([(id_col, pa.int64()), ("count()", pa.int64())])
    joined = bucket_hash_join(
        per_doc, hit_counts, on=id_col, how="left",
        schemas=(base_schema, cnt_schema),
    )

    def finish(t: pa.Table) -> pa.Table:
        n_hits = pc.fill_null(t.column("count()").cast(pa.int64()), 0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_shingles": t.column("n_shingles"),
                "n_hits": n_hits,
                "contaminated": pc.greater(n_hits, 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ line_dedup

#: line_idx packing width for the global keep-first order (doc_id, idx)
#: -> one int64: pos = doc_id * _MAX_LINES + idx. 2^20 lines per doc and
#: 2^43 doc ids — both asserted, both far beyond any real document/shard.
_MAX_LINES = 1 << 20


def _split_lines(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Plain (non-regex) split on a separator, vectorized.

    Returns ``(flat_lines, doc_idx, n_lines)``. Empty strings ARE lines
    (``"".split(sep) == [""]``) — every line, including blanks,
    participates in the global dedup, matching the SQL oracle's
    ``string_split`` exactly.
    """
    arr = pc.split_pattern(pc.fill_null(texts, ""), pattern="\n")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_lines = offsets[1:] - offsets[:-1]
    flat = np.asarray(arr.values, dtype=object)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_lines)
    return flat, doc_idx, n_lines


@ref_cached(2)
def _line_winner_lookup(refs: tuple):
    """(sorted line-hash array, min-pos array) from broadcast winner
    block refs — built once per worker process."""
    import ray

    tables = [
        t for t in ray.get(list(refs))
        if t.num_rows and "lh" in t.column_names
    ]
    lh = np.concatenate(
        [t.column("lh").to_numpy(zero_copy_only=False) for t in tables]
    )
    mp = np.concatenate(
        [t.column("min(pos)").to_numpy(zero_copy_only=False) for t in tables]
    )
    order = np.argsort(lh, kind="stable")
    return lh[order], mp[order]


def line_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
               n_buckets: int | None = None,
               broadcast_limit: int = 2_000_000):
    """Corpus-global duplicate-line removal (the C4 pipeline's exact
    line dedup): a line survives only at its FIRST occurrence in the
    global ``(doc_id, line_idx)`` order; later identical lines are
    dropped; documents are reassembled from their surviving lines and
    documents left with zero lines disappear from the output.

    Scale shape, adaptive: line TEXT never enters a shuffle. The
    winners (one ``(line_hash, min_pos)`` row per DISTINCT line) come
    from (1) ``(line_hash, pos)`` pairs -> bounded groupby min(pos).
    Then:
    - distinct-line counts <= ``broadcast_limit``: winners broadcast as
      object-store block refs (worker-cached searchsorted lookup) and
      documents filter + reassemble their lines in ONE map pass — zero
      further exchanges (document text never shuffles AT ALL).
    - web-scale line vocabularies: (2) pairs x winners bucket join on
      the int64 hash -> surviving ``(doc_id, line_idx)`` ids, (3)
      survivors co-hash-grouped per doc into a packed int32 index blob,
      (4) blobs bucket-joined back onto the documents (the one exchange
      that moves text) and lines re-split + filtered map-side.
    Hash = md5_lower64 of the line (collision odds ~n^2/2^65); both
    paths are property-tested equal.
    """
    from .partition import bounded_groupby, cohash_map_groups
    from .joins import bucket_hash_join

    def pairs_fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        assert ids.size == 0 or (0 <= ids.min() and ids.max() < (1 << 43)), \
            "line_dedup packs (doc_id, line_idx) into int64: doc_id < 2^43"
        flat, doc_idx, n_lines = _split_lines(t.column(text_col))
        assert n_lines.size == 0 or n_lines.max() < _MAX_LINES
        starts = np.zeros(len(n_lines) + 1, dtype=np.int64)
        np.cumsum(n_lines, out=starts[1:])
        line_idx = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
        lh = md5_lower64_array(flat).view(np.int64)
        pos = ids[doc_idx] * _MAX_LINES + line_idx
        return pa.table(
            {
                "lh": pa.array(lh, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    pairs = ds.map_batches(pairs_fn, batch_format="pyarrow", zero_copy_batch=True)
    winners = bounded_groupby(pairs, ["lh"]).min("pos")  # (lh, min(pos))

    winners_mat = winners.materialize()  # distinct-line-sized, ids only
    if winners_mat.count() <= broadcast_limit:
        refs = tuple(winners_mat.to_arrow_refs())

        def assemble_broadcast(t: pa.Table) -> pa.Table:
            lh_sorted, mp = _line_winner_lookup(refs)
            ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            flat, doc_idx, n_lines = _split_lines(t.column(text_col))
            starts = np.zeros(len(n_lines) + 1, dtype=np.int64)
            np.cumsum(n_lines, out=starts[1:])
            line_idx = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
            lh = md5_lower64_array(flat).view(np.int64)
            pos = ids[doc_idx] * _MAX_LINES + line_idx
            loc = np.searchsorted(lh_sorted, lh)
            keep = mp[np.minimum(loc, len(mp) - 1)] == pos
            kept_parent = doc_idx[keep]
            counts = np.bincount(kept_parent, minlength=t.num_rows)
            offsets = np.concatenate([[0], np.cumsum(counts)])
            lst = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(flat[keep], pa.string()),
            )
            texts = pc.binary_join(lst, pa.scalar("\n"))
            out = t.set_column(
                t.column_names.index(text_col), text_col, texts
            )
            # docs with zero surviving lines disappear (join-path parity)
            return out.filter(pa.array(counts > 0))

        return ds.map_batches(
            assemble_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    pair_schema = pa.schema([("lh", pa.int64()), ("pos", pa.int64())])
    win_schema = pa.schema([("lh", pa.int64()), ("min(pos)", pa.int64())])
    jkw = dict(n_buckets=n_buckets) if n_buckets else {}
    joined = bucket_hash_join(
        pairs, winners_mat, on="lh", how="inner",
        schemas=(pair_schema, win_schema), **jkw,
    )

    def keep_first(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        mpos = t.column("min(pos)").to_numpy(zero_copy_only=False)
        k = pos == mpos
        return pa.table(
            {
                id_col: pa.array(pos[k] // _MAX_LINES, pa.int64()),
                "line_idx": pa.array(pos[k] % _MAX_LINES, pa.int64()),
            }
        )

    surv = joined.map_batches(keep_first, batch_format="pyarrow", zero_copy_batch=True)

    def to_blobs(g: pa.Table) -> pa.Table:
        # many docs per coarse bucket: segment by doc_id, one blob per doc
        d = g.column(id_col).to_numpy(zero_copy_only=False)
        ix = g.column("line_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ix, d))
        d, ix = d[order], ix[order]
        bounds = np.flatnonzero(np.diff(d)) + 1
        docs = np.concatenate([[0], bounds])
        blobs = [
            ix[a:b].astype(np.int32).tobytes()
            for a, b in zip(np.concatenate([[0], bounds]), np.concatenate([bounds, [len(d)]]))
        ]
        return pa.table(
            {
                id_col: pa.array(d[docs], pa.int64()),
                "keep_blob": pa.array(blobs, pa.binary()),
            }
        )

    blobs = cohash_map_groups(surv, [id_col], to_blobs)

    def cast_ids(t: pa.Table) -> pa.Table:
        i = t.column_names.index(id_col)
        return t.set_column(i, id_col, t.column(id_col).cast(pa.int64()))

    docs64 = ds.map_batches(cast_ids, batch_format="pyarrow", zero_copy_batch=True)
    doc_schema = pa.schema(
        [(id_col, pa.int64())]
        + [(f.name, f.type) for f in ds.schema().base_schema if f.name != id_col]
    )
    blob_schema = pa.schema([(id_col, pa.int64()), ("keep_blob", pa.binary())])
    docs_with = bucket_hash_join(
        docs64, blobs, on=id_col, how="inner", schemas=(doc_schema, blob_schema)
    )

    def assemble(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        blobs_ = t.column("keep_blob").to_pylist()
        out = []
        for txt, bl in zip(texts, blobs_):
            keep = np.frombuffer(bl, dtype=np.int32)
            lines = (txt or "").split("\n")
            out.append("\n".join(lines[j] for j in np.sort(keep)))
        res = t.drop_columns(["keep_blob"])
        return res.set_column(
            res.column_names.index(text_col), text_col, pa.array(out, pa.string())
        )

    return docs_with.map_batches(assemble, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ gopher_quality

def dedup_lines_in_doc(t: pa.Table, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       out_col: str = "text_dedup") -> pa.Table:
    """INTRA-document repeated-line removal (the C4/Gopher in-document
    repetition step — distinct from the corpus-global ``line_dedup``):
    keep the FIRST occurrence of each exact line within a document,
    preserving line order; append the deduped text and the removed-line
    count. Pure per-batch kernel — a document never leaves its batch,
    so the stage is shuffle-free at any corpus size."""
    import pandas as pd

    if t.num_rows == 0:
        return (t.append_column(out_col, pa.array([], pa.string()))
                 .append_column("n_removed", pa.array([], pa.int64())))
    texts = t.column(text_col)
    flat, doc_idx, n_lines = _split_lines(texts)
    # first-occurrence mask per (doc, line): pandas duplicated is a C
    # hash pass over the flat (doc_idx, line) pairs
    keep = ~pd.DataFrame({"d": doc_idx, "l": flat}).duplicated().to_numpy()
    out, removed, pos = [], np.zeros(len(n_lines), dtype=np.int64), 0
    for i, nl in enumerate(n_lines):
        seg_keep = keep[pos:pos + nl]
        out.append("\n".join(flat[pos:pos + nl][seg_keep]))
        removed[i] = nl - int(seg_keep.sum())
        pos += nl
    return (t.append_column(out_col, pa.array(out, pa.string()))
             .append_column("n_removed", pa.array(removed, pa.int64())))


def token_pack(ds, *, id_col: str = "doc_id", len_col: str = "n_tokens",
               seq_len: int = 2048, range_size: int = 1024):
    """GPT-style sequence packing (concat-and-chunk): documents are
    concatenated in ``id_col`` order and cut every ``seq_len`` tokens;
    each doc learns which training sequences it lands in —
    ``first_seq = floor(prefix_tokens / seq_len)``,
    ``last_seq = floor((prefix_tokens + n - 1) / seq_len)``
    (zero-token docs: last_seq = first_seq).

    The distributed ordered PREFIX SUM behind it, without a global sort:
    docs range-partition by ``id // range_size`` (contiguous id ranges),
    per-range token totals reduce to one tiny table whose exclusive
    scan — the only sequential step, O(ids / range_size) values —
    broadcasts back as range offsets; each range then resolves its
    rows' prefixes with one in-block lexsort + cumsum. At 100 TB pick
    range_size so ids/range_size stays ~10^5-10^6 (the scan table is
    16 B per range).

    Input needs (id_col, len_col int64). Appends first_seq/last_seq."""
    import ray

    from .dedup import _col_np, _segments
    from .partition import cohash_map_groups

    rs = np.int64(range_size)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             len_col: pa.array([], pa.int64()),
                             "_rng": pa.array([], pa.int64())})
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return (t.select([id_col, len_col])
                 .append_column("_rng", pa.array(ids // rs, pa.int64())))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def range_total(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_rng" not in g.column_names:
            return pa.table({"_rng": pa.array([], pa.int64()),
                             "_tot": pa.array([], pa.int64())})
        order, bounds = _segments(g, ["_rng"])
        n = _col_np(g, len_col)[order]
        cn = np.concatenate([[0], np.cumsum(n)])
        heads = g.take(pa.array(order[bounds[:-1]])).select(["_rng"])
        return heads.append_column(
            "_tot", pa.array(cn[bounds[1:]] - cn[bounds[:-1]], pa.int64()))

    totals = cohash_map_groups(tagged, ["_rng"], range_total).take_all()
    # exclusive scan over range order — the tiny sequential step
    totals.sort(key=lambda r: r["_rng"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["_rng"]] = acc
        acc += r["_tot"]
    off_ref = ray.put(offsets)

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or id_col not in g.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             len_col: pa.array([], pa.int64()),
                             "first_seq": pa.array([], pa.int64()),
                             "last_seq": pa.array([], pa.int64())})
        off = ray.get(off_ref)
        order, bounds = _segments(g, ["_rng"], extra=_col_np(g, id_col))
        n = _col_np(g, len_col)[order]
        rng = _col_np(g, "_rng")[order]
        # within-range exclusive prefix + the range's global offset
        cp = np.concatenate([[0], np.cumsum(n)[:-1]])
        for si in range(len(bounds) - 1):
            s, e = bounds[si], bounds[si + 1]
            cp[s:e] += np.int64(off[int(rng[s])]) - cp[s]
        first = cp // seq_len
        last = np.where(n > 0, (cp + n - 1) // seq_len, first)
        out = g.take(pa.array(order)).drop_columns(["_rng"])
        return (out.append_column("first_seq", pa.array(first, pa.int64()))
                   .append_column("last_seq", pa.array(last, pa.int64())))

    return cohash_map_groups(tagged, ["_rng"], resolve)


def gopher_quality(t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id",
                   stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
                   min_words: int = 50, max_words: int = 100_000,
                   min_stopwords: int = 2, dup_frac_tenths: int = 3) -> pa.Table:
    """Gopher-style quality rules over one batch, integer-exact.

    Emitted metrics (all int64): ``n_words``, ``n_word_chars`` (sum of
    word codepoint lengths), ``n_distinct_words``, ``n_stop_words``
    (distinct probe stopwords present). Rules as booleans, derived by
    integer cross-multiplication (no IEEE division anywhere):

    * ``ok_word_count``:    min_words <= n_words <= max_words
    * ``ok_mean_word_len``: n_words > 0 and 3 <= mean word length <= 10,
      i.e. ``3*n_words <= n_word_chars <= 10*n_words``
    * ``ok_dup_fraction``:  duplicate-word fraction <= dup_frac_tenths/10,
      i.e. ``10*(n_words - n_distinct_words) <= dup_frac_tenths*n_words``
      (word-level analogue of Gopher's duplicate-line fraction)
    * ``ok_stopwords``:     n_stop_words >= min_stopwords
    * ``keep``: conjunction of the four.

    The thresholds and probe list are parameters because the published
    constants assume natural-language web text; a synthetic or
    domain-specific corpus picks values that actually split it.
    """
    ids = t.column(id_col).cast(pa.int64())
    flat, word_lens, doc_idx, n_words = _flat_words(t.column(text_col))
    n_docs = len(t)
    n_chars = np.bincount(doc_idx, weights=word_lens, minlength=n_docs).astype(np.int64)

    if len(flat):
        hashes = md5_lower64_array(flat)
        order = np.lexsort((hashes, doc_idx))
        d_s, h_s = doc_idx[order], hashes[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        n_distinct = np.bincount(d_s[first], minlength=n_docs).astype(np.int64)
        stop_h = np.unique(md5_lower64_array(np.array(list(stopwords), dtype=object)))
        is_stop = np.isin(h_s, stop_h)
        stop_first = first & is_stop
        n_stop = np.bincount(d_s[stop_first], minlength=n_docs).astype(np.int64)
    else:
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        n_stop = np.zeros(n_docs, dtype=np.int64)

    ok_count = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (n_words > 0) & (3 * n_words <= n_chars) & (n_chars <= 10 * n_words)
    ok_dup = (n_words > 0) & (
        10 * (n_words - n_distinct) <= dup_frac_tenths * n_words
    )
    ok_stop = n_stop >= min_stopwords
    keep = ok_count & ok_mean & ok_dup & ok_stop
    return pa.table(
        {
            id_col: ids,
            "n_words": pa.array(n_words, pa.int64()),
            "n_word_chars": pa.array(n_chars, pa.int64()),
            "n_distinct_words": pa.array(n_distinct, pa.int64()),
            "n_stop_words": pa.array(n_stop, pa.int64()),
            "ok_word_count": pa.array(ok_count, pa.bool_()),
            "ok_mean_word_len": pa.array(ok_mean, pa.bool_()),
            "ok_dup_fraction": pa.array(ok_dup, pa.bool_()),
            "ok_stopwords": pa.array(ok_stop, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def normalize_text(t: pa.Table, *, text_col: str = "text",
                   out_col: str = "norm") -> pa.Table:
    """Canonical text normalization: Unicode NFC -> lower -> collapse
    runs of whitespace to one space -> trim spaces. Byte-identical to
    DuckDB ``trim(regexp_replace(lower(nfc_normalize(x)), '\\s+', ' ',
    'g'))`` (the oracle), so normalized text is safely joinable/hashable
    across engines — the precondition for cross-run dedup keys.

    Vectorised: NFC is the IDENTITY on pure-ASCII text (the dominant
    web-corpus case, checked with one C kernel); only non-ASCII rows pay
    a per-row ``unicodedata.normalize`` (this build's Arrow
    utf8_normalize never composes, so it cannot be used for NFC parity
    — verified against DuckDB). lower/regex/trim are Arrow RE2/C
    kernels either way."""
    import unicodedata

    col = t.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    is_ascii = pc.string_is_ascii(col)
    need = pc.and_(pc.invert(is_ascii), pc.is_valid(col))
    need_np = need.to_numpy(zero_copy_only=False)
    if need_np.any():
        idx = np.flatnonzero(need_np)
        sub = [
            unicodedata.normalize("NFC", v)
            for v in col.take(pa.array(idx)).to_pylist()
        ]
        col = pc.replace_with_mask(col, need, pa.array(sub, pa.string()))
    out = pc.utf8_lower(col)
    out = pc.replace_substring_regex(out, r"\s+", " ")
    out = pc.utf8_trim(out, characters=" ")
    return t.append_column(out_col, out)


def normalize_text_ds(ds, *, text_col: str = "text", out_col: str = "norm"):
    """Dataset stage for ``normalize_text``."""
    return ds.map_batches(
        normalize_text,
        fn_kwargs=dict(text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# URL canonicalization (webtext dedup pre-pass)

#: query parameters dropped during canonicalization (tracking noise) —
#: matched against the full "k=v" pair string, anchored at the key
_TRACKING_PARAM_RE = r"^(utm_|fbclid=|gclid=|ref=)"


def canonicalize_urls(t: pa.Table, *, column: str = "url",
                      out_col: str = "canon_url") -> pa.Table:
    """Canonical URL form for webtext dedup/grouping:

    - scheme and host lowercased (path/query stay case-sensitive)
    - default ports stripped (http:80, https:443); others kept
    - fragment dropped
    - tracking query params dropped (``_TRACKING_PARAM_RE``), the rest
      SORTED lexicographically (binary collation, = DuckDB list_sort)
    - empty path -> '/'
    - non-absolute urls (no scheme://host) pass through unchanged

    Every rule is RE2 + deterministic string ops, so a DuckDB oracle
    replays it exactly (regexp_extract + list_filter + list_sort). All
    vectorized: one extract_regex per part, numpy offset surgery for the
    per-url param filter+sort — no per-row Python.
    """
    from .transforms import dx_extract
    from .transforms import url_pattern

    n = t.num_rows
    work = pa.table({"_u": t.column(column).cast(pa.string())})
    for part in ("scheme", "host", "port", "path", "query"):
        work = dx_extract(work, "_u", url_pattern(part), 1, f"_{part}")
    url = work.column("_u").combine_chunks()
    scheme = pc.utf8_lower(work.column("_scheme").combine_chunks())
    host = pc.utf8_lower(work.column("_host").combine_chunks())
    port = work.column("_port").combine_chunks()
    path = work.column("_path").combine_chunks()
    query = work.column("_query").combine_chunks()

    # ---- query params: split, drop tracking + empties, sort, rejoin
    parts = pc.split_pattern(pc.fill_null(query, ""), pattern="&")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    keep = pc.and_(
        pc.not_equal(flat, pa.scalar("")),
        pc.invert(pc.match_substring_regex(flat, _TRACKING_PARAM_RE)),
    )
    keep_np = pc.fill_null(keep, False).to_numpy(zero_copy_only=False)
    kept_parent = parent[keep_np]
    kept_vals = np.asarray(flat.filter(keep).to_pylist(), dtype=object)
    # sort within each url: lexsort by (parent, value) — binary collation
    if len(kept_vals):
        order = np.lexsort((kept_vals.astype(str), kept_parent))
        kept_parent = kept_parent[order]
        kept_vals = kept_vals[order]
    counts = np.bincount(kept_parent, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    lst = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(kept_vals, pa.string())
    )
    joined = pc.binary_join(lst, pa.scalar("&"))

    # ---- reassemble
    is_http_80 = pc.and_(pc.equal(scheme, pa.scalar("http")),
                         pc.equal(port, pa.scalar("80")))
    is_https_443 = pc.and_(pc.equal(scheme, pa.scalar("https")),
                           pc.equal(port, pa.scalar("443")))
    drop_port = pc.or_(pc.equal(port, pa.scalar("")),
                       pc.or_(is_http_80, is_https_443))
    port_str = pc.if_else(
        drop_port, pa.scalar(""),
        pc.binary_join_element_wise(pa.array([":"] * n), port, ""),
    )
    path_str = pc.if_else(pc.equal(path, pa.scalar("")), pa.scalar("/"), path)
    q_str = pc.if_else(
        pc.equal(joined, pa.scalar("")), pa.scalar(""),
        pc.binary_join_element_wise(pa.array(["?"] * n), joined, ""),
    )
    canon = pc.binary_join_element_wise(
        scheme, pa.array(["://"] * n), host, port_str, path_str, q_str, ""
    )
    # non-absolute urls pass through; null input stays null
    canon = pc.if_else(pc.equal(host, pa.scalar("")), url, canon)
    canon = pc.if_else(pc.is_valid(url), canon, pa.nulls(n, pa.string()))
    return t.append_column(out_col, canon)


def canonicalize_urls_ds(ds, *, column: str = "url", out_col: str = "canon_url"):
    return ds.map_batches(
        canonicalize_urls, fn_kwargs=dict(column=column, out_col=out_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
