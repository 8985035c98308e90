"""cassandrawriter wire analogue: CQL literal rendering, writetime()
pseudo-column -> USING TIMESTAMP, UNLOGGED batch grouping, registry."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest

import ray.data as rd

from go_datax_ray.sinks.wire import cassandra_cql, write_cassandra_cql


def test_cql_literals_and_writetime():
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5,
                           tzinfo=datetime.timezone.utc)
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "name": pa.array(["o'brien", None]),
        "raw": pa.array([b"\x01\xff", None], pa.binary()),
        "ok": pa.array([True, False]),
        "writetime()": pa.array([ts, None], pa.timestamp("us", tz="UTC")),
    })
    body = cassandra_cql(t, table="ks.t").decode()
    lines = body.rstrip("\n").split("\n")
    # writetime() is excluded from the column list and rendered as
    # USING TIMESTAMP micros (cassandra_writer.go:204-236)
    assert lines[0] == ("INSERT INTO ks.t (id, name, raw, ok) VALUES "
                        "(1, 'o''brien', 0x01ff, true) "
                        f"USING TIMESTAMP {int(ts.timestamp() * 1_000_000)};")
    # null writetime row gets a plain insert; nulls render null
    assert lines[1] == ("INSERT INTO ks.t (id, name, raw, ok) VALUES "
                        "(2, null, null, false);")


def test_unlogged_batch_grouping():
    t = pa.table({"id": list(range(5))})
    body = cassandra_cql(t, table="ks.t", batch_size=2).decode()
    assert body.count("BEGIN UNLOGGED BATCH") == 3  # 2+2+1
    assert body.count("APPLY BATCH;") == 3
    assert body.count("INSERT INTO") == 5
    # batch_size=1 emits bare statements (the reference's default)
    assert "BEGIN" not in cassandra_cql(t, table="ks.t").decode()


def test_two_writetime_columns_rejected():
    t = pa.table({"a": [1], "writetime()": [2], "WRITETIME()": [3]})
    with pytest.raises(ValueError, match="writetime"):
        cassandra_cql(t, table="ks.t")


def test_write_and_registry(tmp_path, ray_session):
    from go_datax_ray.registry import SINKS

    ds = rd.from_arrow(pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]}))
    res = SINKS["cassandrawriter"](ds, {
        "path": str(tmp_path / "cql"), "keyspace": "ks", "table": "t",
        "batchSize": 2, "consistencyLevel": "quorum",
    })
    assert res["records"] == 3
    chunk = open(res["files"][0]).read()
    assert chunk.startswith("CONSISTENCY QUORUM;\n")
    assert "INSERT INTO ks.t (id, v)" in chunk
    man = open(res["manifest"]).read()
    assert "cqlsh" in man and "-k" in man
    # missing path still fails loudly; collapse opt-in still works
    with pytest.raises(ValueError, match="parameter.path"):
        write_cassandra_cql(ds, {"keyspace": "ks", "table": "t"})
    res2 = SINKS["cassandrawriter"](ds, {
        "allowCollapse": True, "path": str(tmp_path / "lake"), "table": "t",
    })
    assert res2["records"] == 3
