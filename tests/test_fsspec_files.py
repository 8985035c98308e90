"""fsspec-URI file IO: the ftp/hdfs/oss reader+writer plumbing.

No live FTP/HDFS server exists in this container, so the tests drive the
SAME fsspec code paths through file:// URIs — scheme resolution, glob,
dir listing, remote open on the read side; makedirs/glob-truncate/open
on the write side. A real ftp:// URI takes exactly these branches with
fsspec's FTPFileSystem (stdlib ftplib)."""

import gzip

import pytest

from go_datax_ray.engine import run_job


def _write_csv(p, text):
    p.write_text(text)


def test_txtfile_reader_over_fsspec_uri(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_csv(d / "a.csv", "1,alpha\n2,beta\n")
    (d / "b.csv.gz").write_bytes(gzip.compress(b"3,gamma\n"))
    job = {
        "job": {
            "content": [{
                "reader": {"name": "ftpreader", "parameter": {
                    "path": f"file://{d}/*.csv*",
                    "column": [
                        {"index": 0, "type": "long", "name": "id"},
                        {"index": 1, "type": "string", "name": "name"},
                    ],
                }},
                "writer": {"name": "streamwriter", "parameter": {"print": False}},
            }]
        }
    }
    res = run_job(job)
    assert res.records == 3


def test_txtfile_writer_over_fsspec_uri_roundtrip(tmp_path):
    out = tmp_path / "out"
    job = {
        "job": {
            "content": [{
                "reader": {"name": "parquetreader", "parameter": {
                    "path": "/root/testdata/sf0.001/region.parquet",
                    "column": ["r_regionkey", "r_name"],
                }},
                "writer": {"name": "ftpwriter", "parameter": {
                    "path": f"file://{out}", "fileName": "region",
                    "writeMode": "truncate",
                }},
            }]
        }
    }
    res = run_job(job)
    assert res.records == 5
    assert all(f.startswith("file://") for f in res.sink_result["files"])
    # read it back through the URI reader
    back = {
        "job": {
            "content": [{
                "reader": {"name": "ftpreader", "parameter": {
                    "path": f"file://{out}"}},
                "writer": {"name": "streamwriter", "parameter": {"print": False}},
            }]
        }
    }
    assert run_job(back).records == 5
    # nonConflict over fsspec sees the existing files
    job["job"]["content"][0]["writer"]["parameter"]["writeMode"] = "nonConflict"
    with pytest.raises(Exception, match="nonConflict"):
        run_job(job)


def test_jsonfile_writer_over_fsspec_uri(tmp_path):
    out = tmp_path / "json_out"
    job = {
        "job": {
            "content": [{
                "reader": {"name": "parquetreader", "parameter": {
                    "path": "/root/testdata/sf0.001/region.parquet",
                    "column": ["r_regionkey", "r_name"],
                }},
                "writer": {"name": "jsonfilewriter", "parameter": {
                    "path": f"file://{out}", "fileName": "region"}},
            }]
        }
    }
    res = run_job(job)
    assert res.records == 5
    import json

    lines = [json.loads(x) for x in
             (out / "region_00000.jsonl").read_text().splitlines()]
    assert {r["r_regionkey"] for r in lines} == {0, 1, 2, 3, 4}
