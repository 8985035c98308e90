"""Curation stages: decontaminate, gopher_quality, dx_mask.

Reference parity: the reference engine has no curation family; semantics
follow the published n-gram-decontamination / Gopher-rule descriptions
(see stages/curation.py docstring). Tests pin the engine against slow
per-row reference implementations and pin the two decontaminate
execution paths (broadcast refs vs bucketed semi-join) equal.
"""

import re

import numpy as np
import pyarrow as pa
import pytest


def _ref_shingles(text: str, k: int = 3) -> set[str]:
    words = [w for w in re.split(r"\W+", (text or "").lower()) if w]
    if not words:
        return set()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _rand_texts(rng, n, vocab=("the", "cat", "sat", "on", "mat", "dog", "ran", "x1")):
    out = []
    for _ in range(n):
        m = int(rng.integers(0, 12))
        out.append(" ".join(rng.choice(vocab, size=m)))
    return out


def test_distinct_shingles_matches_reference():
    from go_datax_ray.stages.curation import _distinct_shingles

    rng = np.random.default_rng(7)
    texts = _rand_texts(rng, 60) + ["", "one", "one two", "a  b,c!d"]
    docs, hashes, n_distinct = _distinct_shingles(pa.chunked_array([pa.array(texts)]))
    for i, t in enumerate(texts):
        assert n_distinct[i] == len(_ref_shingles(t)), t
    # pairs are distinct per doc
    assert len(set(zip(docs.tolist(), hashes.tolist()))) == len(docs)


def test_decontaminate_paths_agree_and_match_reference(ray_session=None):
    import ray.data as rd
    from go_datax_ray.stages.curation import decontaminate

    rng = np.random.default_rng(11)
    texts = _rand_texts(rng, 120)
    ids = list(range(120))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ev_mask = [i % 7 == 0 for i in ids]
    ev_t = t.filter(pa.array(ev_mask))
    tr_t = t.filter(pa.array([not m for m in ev_mask]))

    ev_sh = set().union(*[_ref_shingles(x) for x in ev_t.column("text").to_pylist()])
    want = {}
    for i, x in zip(tr_t.column("doc_id").to_pylist(), tr_t.column("text").to_pylist()):
        sh = _ref_shingles(x)
        want[i] = (len(sh), len(sh & ev_sh))

    outs = {}
    for mode in ("broadcast", "join"):
        got = (
            decontaminate(rd.from_arrow(tr_t), rd.from_arrow(ev_t), mode=mode)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs[mode] = got
        for _, r in got.iterrows():
            ns, nh = want[r["doc_id"]]
            assert (r["n_shingles"], r["n_hits"]) == (ns, nh)
            assert bool(r["contaminated"]) == (nh > 0)
    assert outs["broadcast"].equals(outs["join"])


def test_gopher_quality_reference():
    from go_datax_ray.stages.curation import gopher_quality

    texts = [
        "",  # empty: everything fails
        "tiny doc",  # below word count
        " ".join(f"w{i:02d}" for i in range(60)),  # 60 distinct 3-char words
        " ".join(["dup"] * 60),  # all duplicates
        " ".join(["antidisestablishmentarianism"] * 3 + ["ok"] * 57),  # long words ok (mean <= 10)
        "the be to of and that have with " + " ".join(f"word{i}" for i in range(50)),
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    g = gopher_quality(t, min_words=10, max_words=100).to_pandas()

    for i, txt in enumerate(texts):
        words = [w for w in re.split(r"\W+", txt.lower()) if w]
        assert g.n_words[i] == len(words)
        assert g.n_word_chars[i] == sum(len(w) for w in words)
        assert g.n_distinct_words[i] == len(set(words))
        stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
        assert g.n_stop_words[i] == len(stops & set(words))
    assert not g.keep[0] and not g.keep[1]
    assert not g.ok_stopwords[2]  # no stopwords
    assert not g.ok_dup_fraction[3]
    assert g.ok_mean_word_len[4]  # mean (3*28 + 57*2)/60 = 3.3
    assert g.keep[5]


def _ref_line_dedup(docs: list[tuple[int, str]]) -> dict[int, str]:
    seen = set()
    out = {}
    for did, text in sorted(docs):
        kept = []
        for line in text.split("\n"):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            out[did] = "\n".join(kept)
    return out


def test_line_dedup_matches_reference():
    import ray.data as rd
    from go_datax_ray.stages.curation import line_dedup

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", ""]
    docs = []
    for did in range(80):
        n = int(rng.integers(1, 6))
        lines = [
            " ".join(rng.choice(vocab, size=int(rng.integers(0, 3))))
            for _ in range(n)
        ]
        docs.append((did, "\n".join(lines)))
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    got = (
        line_dedup(rd.from_arrow(t))
        .to_pandas().set_index("doc_id")["text"].to_dict()
    )
    assert got == _ref_line_dedup(docs)
    # broadcast_limit=0 forces the bucketed-join scale path — identical
    got_join = (
        line_dedup(rd.from_arrow(t), broadcast_limit=0)
        .to_pandas().set_index("doc_id")["text"].to_dict()
    )
    assert got_join == got


def test_line_dedup_keeps_extra_columns():
    import ray.data as rd
    from go_datax_ray.stages.curation import line_dedup

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a\nb", "b\nc"]),
                  "lang": pa.array(["en", "de"])})
    got = line_dedup(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert got["lang"].tolist() == ["en", "de"]
    assert got["text"].tolist() == ["a\nb", "c"]


def test_dedup_lines_in_doc_kernel():
    """First-occurrence intra-doc line dedup: order preserved, blank
    lines dedup like any line, other docs' identical lines unaffected,
    empty text stays one (empty) line."""
    from go_datax_ray.stages.curation import dedup_lines_in_doc

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a\nb\na\nc\nb",        # in-doc dups a,b
            "a\n\nx\n\na",          # blank lines dedup too
            "",                       # empty text = one empty line
        ]),
    })
    out = dedup_lines_in_doc(t)
    assert out.column("text_dedup").to_pylist() == ["a\nb\nc", "a\n\nx", ""]
    assert out.column("n_removed").to_pylist() == [2, 2, 0]
    # doc 1 and doc 2 both keep their own 'a' — dedup is per-document
    empty = dedup_lines_in_doc(t.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names[-2:] == ["text_dedup", "n_removed"]


def test_dx_mask_golden():
    from go_datax_ray.stages.transforms import dx_mask

    t = pa.table({"s": pa.array([
        "mail me at john.doe+x@sub.example.co.uk now",
        "call +1 (415) 555-0000 or 020 7946 0958 today",
        "server 192.168.1.250 and 8.8.8.8",
        "clean text with no pii",
        None,
    ])})
    out = dx_mask(t, "s").column("s").to_pylist()
    assert out[0] == "mail me at <EMAIL> now"
    assert out[1] == "call <PHONE> or <PHONE> today"
    assert out[2] == "server <IP> and <IP>"
    assert out[3] == "clean text with no pii"
    assert out[4] is None

    with pytest.raises(ValueError):
        dx_mask(t, "s", kinds="ssn")


def test_bpe_re2_count_equals_lookahead_variant():
    """The RE2-safe pattern (no `\\s+(?!\\S)`) must COUNT identically to
    the Python-re GPT-2 pattern whenever whitespace is plain spaces
    (mixed space+tab runs legitimately differ — see BPE_RE2_PATTERN)."""
    from go_datax_ray.stages.text import bpe_token_count, _BPE_RE

    rng = np.random.default_rng(5)
    alphabet = list("ab N'.,9  -")
    texts = ["".join(rng.choice(alphabet, size=int(rng.integers(0, 40))))
             for _ in range(300)]
    texts += ["", "   ", "don't stop", "a  b   c", "x!!!  ", "'ll've"]
    t = pa.table({"text": pa.array(texts)})
    got = bpe_token_count(t).column("n_tokens_bpe").to_pylist()
    want = [len(_BPE_RE.findall(x)) for x in texts]
    assert got == want
    # documented divergence on mixed-whitespace runs
    mixed = pa.table({"text": pa.array([" \ta"])})
    assert bpe_token_count(mixed).column("n_tokens_bpe").to_pylist() == [2]
    assert len(_BPE_RE.findall(" \ta")) == 3


def test_dx_mask_in_chain():
    from go_datax_ray.stages.transforms import build_transformer_chain

    t = pa.table({"v": pa.array(["x a@b.io y"])})
    chain = build_transformer_chain(
        [{"name": "dx_mask", "parameter": {"column": "v", "paras": ["email"]}}],
        t.schema,
    )
    assert chain(t).column("v").to_pylist() == ["x <EMAIL> y"]


def test_normalize_text_matches_duckdb_unicode():
    """Byte parity with DuckDB on composed/decomposed accents, fullwidth
    forms, case folds, and whitespace runs — the fallback path."""
    import duckdb

    from go_datax_ray.stages.curation import normalize_text

    cases = [
        "Café  NOËL",     # decomposed accents -> NFC composes
        "Café noël",        # precomposed stays
        "  A\tB\n\nC  ",              # ws collapse + trim (pure ascii)
        "İstanbul STRASSE",      # dotted I, sharp-s-free casefold
        "ＡＢＣ",          # fullwidth (NFC keeps, lower maps)
        "plain ascii",
        "",
    ]
    t = pa.table({"text": pa.array(cases, pa.string())})
    mine = normalize_text(t).column("norm").to_pylist()
    for c, m in zip(cases, mine):
        want = duckdb.sql(
            r"select trim(regexp_replace(lower(nfc_normalize(?)),"
            r" '\s+', ' ', 'g'))",
            params=[c],
        ).fetchone()[0]
        assert m == want, (c.encode("unicode_escape"), m, want)


def test_cluster_size_histogram():
    from go_datax_ray.stages.dedup import cluster_size_histogram

    import ray.data as rd

    texts = ["a"] * 5 + ["b"] * 3 + ["c", "d", "e"]  # sizes: 5,3,1,1,1
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    out = cluster_size_histogram(ds).to_pandas()
    got = dict(zip(out["cluster_size"], out["n_clusters"]))
    assert got == {5: 1, 3: 1, 1: 3}


def test_canonicalize_urls_rules():
    from go_datax_ray.stages.curation import canonicalize_urls

    t = pa.table({"url": pa.array([
        "HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&z=1&a=2#frag",
        "http://ex.org:8080?b=2&a=1&fbclid=abc",
        "http://ex.org:80",
        "https://ex.org:443",
        "ftp://Files.Ex.org:21/pub",
        "not-a-url",
        None,
    ], pa.string())})
    got = canonicalize_urls(t).column("canon_url").to_pylist()
    assert got == [
        "https://www.ex.com/A/b?a=2&z=1",   # default https port, utm gone, sorted
        "http://ex.org:8080/?a=1&b=2",       # non-default port kept, '/' added
        "http://ex.org/",                    # default http port stripped
        "https://ex.org/",
        "ftp://files.ex.org:21/pub",         # non-http scheme: port kept
        "not-a-url",                          # passthrough
        None,                                 # null stays null
    ]


def test_token_pack_prefix_sum():
    """Distributed concat-and-chunk packing == a serial prefix sum:
    docs spanning several sequences, exact boundaries, zero-token docs."""
    import numpy as np

    import ray.data as rd

    from go_datax_ray.stages.curation import token_pack

    rng = np.random.default_rng(6)
    n = 3000
    lens = rng.integers(0, 300, n).astype(np.int64)
    lens[5] = 0  # zero-token doc
    lens[7] = 5000  # spans many 512-token sequences
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_tokens": pa.array(lens, pa.int64()),
    }))
    out = token_pack(ds, seq_len=512, range_size=100).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    cp = np.concatenate([[0], np.cumsum(lens)[:-1]])
    first = cp // 512
    last = np.where(lens > 0, (cp + lens - 1) // 512, first)
    assert out["first_seq"].tolist() == first.tolist()
    assert out["last_seq"].tolist() == last.tolist()
    assert out.loc[7, "last_seq"] - out.loc[7, "first_seq"] >= 9
