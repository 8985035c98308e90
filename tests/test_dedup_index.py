"""Incremental dedup against a persisted signature index: the
incremental path must equal a full recompute over old ∪ new with
keep-first semantics (old ids always win), including transitive
clusters that reach the committed corpus through other new docs.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from go_datax_ray.stages.dedup import minhash_dedup_corpus
from go_datax_ray.stages.dedup_index import (
    build_dedup_index,
    incremental_dedup,
    load_index_meta,
)


def _doc(seed: int, n_words: int = 60) -> str:
    rng = np.random.default_rng(seed)
    return " ".join(f"w{v}" for v in rng.integers(0, 800, n_words))


def _perturb(text: str, n_swap: int, seed: int) -> str:
    ws = text.split()
    rng = np.random.default_rng(seed)
    for i in rng.integers(0, len(ws), n_swap):
        ws[i] = f"q{seed}x{i}"
    return " ".join(ws)


def _mk(ids, texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(ids), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
    }))


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """Old corpus (already unique) + a new increment carrying: an exact
    dup of old, a near-dup of old, a near-dup chain new->new->old, an
    intra-increment exact dup pair, and fresh docs."""
    old_ids = list(range(100))
    old_txt = [_doc(i) for i in old_ids]
    old = _mk(old_ids, old_txt)

    new_rows = [
        (1000, old_txt[3]),                       # exact dup of old 3
        (1001, _perturb(old_txt[7], 3, 1)),       # near-dup of old 7
        (1002, _perturb(old_txt[7], 5, 2)),       # near-dup of old 7 via 1001
        (1003, _doc(9001)),                       # fresh
        (1004, _doc(9002)),                       # fresh
        (1005, _doc(9003)),                       # fresh, duplicated below
        (1006, _doc(9003)),                       # exact dup within increment
        (1007, _perturb(_doc(9004), 2, 3)),       # fresh
    ]
    new = _mk([r[0] for r in new_rows], [r[1] for r in new_rows])
    full = _mk(old_ids + [r[0] for r in new_rows],
               old_txt + [r[1] for r in new_rows])
    return old, new, full


def test_incremental_equals_full_recompute(corpora, tmp_path):
    old, new, full = corpora
    idx = str(tmp_path / "idx")
    build_dedup_index(old, idx)
    survivors, stats = incremental_dedup(new, idx, old, threshold=0.6)
    got = sorted(r["doc_id"] for r in survivors.take_all())

    # full recompute keep-first over old ∪ new (old ids are smaller, so
    # min-id representatives are exactly the keep-old rule); the full
    # pipeline's exact dups resolve inside minhash clusters at J=1.0
    from go_datax_ray.stages.dedup import exact_dedup

    full_dd, _ = minhash_dedup_corpus(exact_dedup(full), threshold=0.6)
    want = sorted(r["doc_id"] for r in full_dd.take_all() if r["doc_id"] >= 1000)
    assert got == want
    # the planted structure: 1000 (exact-old), 1001/1002 (near-old,
    # transitive), 1006 (intra-increment exact dup) all removed
    assert set(got).isdisjoint({1000, 1001, 1002, 1006})
    assert {1003, 1004, 1005, 1007} <= set(got)
    assert stats["removed_docs"] >= 2 and stats["survivors"] == len(got)


def test_index_update_feeds_next_increment(corpora, tmp_path):
    """update_index appends survivors: a second increment duplicating a
    FIRST-increment survivor is caught without touching either corpus."""
    old, new, _ = corpora
    idx = str(tmp_path / "idx2")
    build_dedup_index(old, idx)
    surv1, _ = incremental_dedup(new, idx, old, threshold=0.6)
    assert load_index_meta(idx)["generation"] == 1
    surv1_tbl = {r["doc_id"]: r["text"] for r in surv1.take_all()}

    inc2 = _mk([2000, 2001], [surv1_tbl[1003], _doc(7777)])
    # old_docs for generation 2 = committed corpus ∪ first increment's
    # survivors (the caller's corpus grows with each committed increment)
    corpus2 = old.union(surv1)
    surv2, stats2 = incremental_dedup(inc2, idx, corpus2, threshold=0.6)
    ids2 = sorted(r["doc_id"] for r in surv2.take_all())
    assert ids2 == [2001]
    assert load_index_meta(idx)["generation"] == 2


def test_no_candidates_short_circuit(tmp_path):
    old = _mk([0, 1], [_doc(1), _doc(2)])
    idx = str(tmp_path / "idx3")
    build_dedup_index(old, idx)
    new = _mk([100], [_doc(500)])
    surv, stats = incremental_dedup(new, idx, old, threshold=0.6)
    assert [r["doc_id"] for r in surv.take_all()] == [100]
    assert stats["candidate_pairs"] == 0 or stats["removed_docs"] == 0
    # ADVICE r3: the early-exit path must keep the stats contract uniform
    # (dedup_soak.py reads stats["survivors"])
    assert stats["survivors"] == 1
