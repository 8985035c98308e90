"""Unit tests: schema evolution, hashing oracle parity, synth determinism,
LWW kernel vs a DuckDB oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from go_datax_ray.hashing import md5_lower64, partition_ids, uniform01
from go_datax_ray.schema import (
    CDC_EVENT_SCHEMA,
    SchemaEvolutionError,
    WEBTEXT_SCHEMA,
    conform,
    evolve,
)
from go_datax_ray.stages.lww import lww_table
from go_datax_ray.synth import (
    EventGen,
    SynthConfig,
    extract_text,
    gen_event_batch,
    make_pages_table,
)


# ---------------------------------------------------------------- schema
def test_evolve_additive():
    s2 = evolve(CDC_EVENT_SCHEMA, CDC_EVENT_SCHEMA.append(pa.field("fetch_status", pa.int64())))
    assert s2.field("fetch_status").type == pa.int64()
    assert s2.names[: len(CDC_EVENT_SCHEMA.names)] == CDC_EVENT_SCHEMA.names


def test_evolve_rejects_type_change():
    bad = pa.schema([pa.field("url", pa.int64())])
    with pytest.raises(SchemaEvolutionError):
        evolve(WEBTEXT_SCHEMA, bad)


def test_conform_null_fills():
    t = pa.table({"url": ["a"], "lang": ["en"]})
    target = pa.schema([pa.field("url", pa.string()), pa.field("lang", pa.string()), pa.field("x", pa.int64())])
    out = conform(t, target)
    assert out.column("x").null_count == 1
    assert out.schema == target


# ---------------------------------------------------------------- hashing
def test_md5_lower64_matches_duckdb():
    vals = ["abc", "https://d0001.example.org/p/1", "", "日本語"]
    duck = duckdb.sql(
        "SELECT md5_number_lower(s) FROM (SELECT unnest(?) s)", params=[vals]
    ).fetchall()
    for v, (d,) in zip(vals, duck):
        assert md5_lower64(v) == int(d)


def test_partition_ids_match_duckdb():
    urls = [f"https://d{i % 7:04d}.example.org/p/{i}" for i in range(100)]
    ours = partition_ids(pa.array(urls), 16, hash_fn="md5")
    duck = duckdb.sql(
        "SELECT md5_number_lower(s) % 16 FROM (SELECT unnest(?) s)", params=[urls]
    ).fetchall()
    assert list(ours) == [int(d) for (d,) in duck]


def test_partition_ids_crc32_matches_reference_hash():
    """Default partitioner == the reference's CRC32(pk) % N hash split
    (mysql_reader.go:432-444)."""
    import zlib

    urls = [f"https://d{i % 7:04d}.example.org/p/{i}" for i in range(100)]
    ours = partition_ids(pa.array(urls), 16)
    assert list(ours) == [zlib.crc32(u.encode()) % 16 for u in urls]


# ---------------------------------------------------------------- synth
def test_gen_batch_boundary_independent():
    cfg = SynthConfig(n_urls=50)
    gen = EventGen(cfg)
    whole = gen(pa.table({"id": np.arange(100, dtype=np.int64)}))
    a = gen(pa.table({"id": np.arange(0, 37, dtype=np.int64)}))
    b = gen(pa.table({"id": np.arange(37, 100, dtype=np.int64)}))
    assert pa.concat_tables([a, b]).equals(whole)


def test_gen_offset_equivalence():
    cfg = SynthConfig(n_urls=50)
    g0 = EventGen(cfg, offset=0)(pa.table({"id": np.arange(10, 20, dtype=np.int64)}))
    g1 = EventGen(cfg, offset=10)(pa.table({"id": np.arange(0, 10, dtype=np.int64)}))
    assert g0.equals(g1)


def test_text_is_pure_function_of_html():
    cfg = SynthConfig(n_urls=20)
    t = EventGen(cfg)(pa.table({"id": np.arange(200, dtype=np.int64)}))
    for h, txt in zip(t.column("html").to_pylist(), t.column("text").to_pylist()):
        if h is None:
            assert txt is None
        else:
            assert extract_text(h) == txt


def test_deletes_have_null_payload():
    t = EventGen(SynthConfig(n_urls=20))(pa.table({"id": np.arange(500, dtype=np.int64)}))
    import pyarrow.compute as pc

    dels = t.filter(pc.equal(t.column("op"), pa.scalar("D")))
    assert dels.num_rows > 0
    assert dels.column("html").null_count == dels.num_rows
    assert dels.column("text").null_count == dels.num_rows


def test_pages_table_unique_urls():
    pages = make_pages_table(SynthConfig(n_urls=100))
    assert pages.num_rows == 100
    assert len(set(pages.column("url").to_pylist())) == 100
    assert pages.schema.equals(WEBTEXT_SCHEMA)


# ---------------------------------------------------------------- LWW kernel
def _events_table(n=2000, n_urls=60, seed=7) -> pa.Table:
    cfg = SynthConfig(seed=seed, n_urls=n_urls, ts_range_s=50)  # coarse ts -> ties
    return EventGen(cfg)(pa.table({"id": np.arange(n, dtype=np.int64)}))


def test_lww_matches_duckdb_oracle():
    t = _events_table()
    got = lww_table(t).sort_by("url")
    want = duckdb.sql(
        """
        SELECT * EXCLUDE rn FROM (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) rn
          FROM t
        ) WHERE rn = 1 ORDER BY url
        """
    ).arrow()
    assert got.column("lsn").to_pylist() == want.column("lsn").to_pylist()
    assert got.column("url").to_pylist() == want.column("url").to_pylist()


def test_lww_associative_split():
    t = _events_table()
    whole = lww_table(t).sort_by("url")
    a, b = t.slice(0, 777), t.slice(777)
    two_phase = lww_table(pa.concat_tables([lww_table(a), lww_table(b)])).sort_by("url")
    assert two_phase.equals(whole)


def test_lww_idempotent():
    t = _events_table()
    once = lww_table(t).sort_by("url")
    twice = lww_table(pa.concat_tables([once, once])).sort_by("url")
    assert twice.equals(once)
