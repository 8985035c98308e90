"""Wire-format goldens: ES bulk NDJSON + Doris/StarRocks Stream Load.

Each golden is the byte-exact body the reference's Go writer produces
for the same records (elasticsearch_writer.go:845-961 — Go json.Marshal
is compact with sorted keys; doris_writer.go:396-459 — encoding/csv with
TAB, \\N nulls)."""

import json

import pyarrow as pa

import ray.data as rd

from go_datax_ray.sinks.wire import (
    es_bulk_body,
    stream_load_csv,
    stream_load_json,
    stream_load_request,
)


def _batch():
    return pa.table(
        {
            "pk": pa.array(["a1", "a2", "a3"], pa.string()),
            "rt": pa.array(["r1", None, "r3"], pa.string()),
            "op": pa.array(["U", "U", "D"], pa.string()),
            "name": pa.array(["alpha", None, "gamma"], pa.string()),
            "qty": pa.array([3, 5, None], pa.int64()),
        }
    )


def test_es_bulk_index_golden():
    body = es_bulk_body(
        _batch(), index="items", action_type="index",
        id_col="pk", routing_col="rt", op_col="op",
    ).decode()
    lines = body.splitlines()
    # 2 upserts (2 lines each) + 1 delete (1 line)
    assert lines == [
        '{"index":{"_id":"a1","_index":"items","routing":"r1"}}',
        '{"name":"alpha","qty":3}',
        '{"index":{"_id":"a2","_index":"items"}}',
        '{"qty":5}',  # null name stripped (removeNullValues parity)
        '{"delete":{"_id":"a3","_index":"items"}}',
    ]


def test_es_bulk_update_and_es6():
    body = es_bulk_body(
        _batch().slice(0, 1), index="items", action_type="update",
        id_col="pk", es_version=6, index_type="doc",
    ).decode()
    assert body.splitlines() == [
        '{"update":{"_id":"a1","_index":"items","_type":"doc"}}',
        '{"doc":{"name":"alpha","op":"U","qty":3,"rt":"r1"},"doc_as_upsert":true}',
    ]


def test_es_bulk_version_external():
    t = pa.table({"pk": pa.array(["k"], pa.string()),
                  "v": pa.array([17], pa.int64()),
                  "x": pa.array([1.5], pa.float64())})
    body = es_bulk_body(t, index="i", id_col="pk", version_col="v").decode()
    assert body.splitlines()[0] == (
        '{"index":{"_id":"k","_index":"i","version":"17",'
        '"version_type":"external"}}'
    )


def test_stream_load_csv_golden():
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "name": pa.array(["x", None], pa.string()),
            "price": pa.array([9.5, 0.25], pa.float64()),
        }
    )
    assert stream_load_csv(t).decode() == "1\tx\t9.5\n2\t\\N\t0.25\n"
    # custom separator, as loadProps sends it ("\\t" unescapes to TAB)
    assert stream_load_csv(t, column_separator=",").decode() == (
        "1,x,9.5\n2,\\N,0.25\n"
    )
    assert stream_load_csv(t, column_separator="\\t").decode().startswith("1\tx")


def test_stream_load_json_golden():
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "name": pa.array(["x"], pa.string())})
    assert stream_load_json(t).decode() == '[{"id":1,"name":"x"}]'


def test_stream_load_request_label_idempotent():
    body = b"1\tx\n"
    r1 = stream_load_request(body, host="fe:8030", database="db", table="t",
                             username="u", password="p", label_prefix="job_")
    r2 = stream_load_request(body, host="fe:8030", database="db", table="t",
                             username="u", password="p", label_prefix="job_")
    assert r1["label"] == r2["label"]  # content-addressed -> retry-safe
    assert r1["url"] == "http://fe:8030/api/db/t/_stream_load"
    assert r1["headers"]["Authorization"].startswith("Basic ")
    assert r1["headers"]["Expect"] == "100-continue"


def test_es_and_stream_load_sinks_end_to_end(tmp_path):
    """Registry-routed jobs render chunk files + a request manifest."""
    from go_datax_ray.engine import run_job

    esdir = str(tmp_path / "es")
    job = {
        "job": {
            "content": [{
                "reader": {"name": "parquetreader", "parameter": {
                    "path": "/root/testdata/sf0.001/region.parquet"}},
                "writer": {"name": "elasticsearchwriter", "parameter": {
                    "path": esdir, "index": "region", "idColumn": "r_regionkey"}},
            }]
        }
    }
    res = run_job(job)
    assert res.records == 5
    manifest = [json.loads(x) for x in
                open(f"{esdir}/_requests.jsonl").read().splitlines()]
    assert manifest and manifest[0]["url"].endswith("/_bulk")
    first_body = open(manifest[0]["body_file"]).read()
    assert '"_index":"region"' in first_body

    slddir = str(tmp_path / "sld")
    job["job"]["content"][0]["writer"] = {
        "name": "starrockswriter",
        "parameter": {
            "path": slddir, "table": "region", "database": "tpch",
            "loadUrl": ["fe1:8030"], "labelPrefix": "gdr_",
            "column": ["r_regionkey", "r_name"],
        },
    }
    res2 = run_job(job)
    assert res2.records == 5
    reqs = [json.loads(x) for x in
            open(f"{slddir}/_requests.jsonl").read().splitlines()]
    assert reqs[0]["url"] == "http://fe1:8030/api/tpch/region/_stream_load"
    assert reqs[0]["label"].startswith("gdr_")
    body = open(reqs[0]["body_file"]).read()
    assert body.splitlines()[0].count("\t") == 1  # two columns, TAB-separated

    # idempotent re-render: same content-hash files, same labels
    res3 = run_job(job)
    assert sorted(res3.sink_result["files"]) == sorted(res2.sink_result["files"])

    # no silent collapse without path
    import pytest

    job["job"]["content"][0]["writer"]["parameter"].pop("path")
    with pytest.raises(Exception, match="Stream Load|path"):
        run_job(job)
