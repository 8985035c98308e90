"""ftpreader/ftpwriter over a REAL ftp:// connection (loopback server,
stdlib sockets): the reference's ftpwriter emits the txtfile layout over
FTP (ftp_writer.go) and its ftpreader walks/globs/reads the same way
(ftp_reader.go:61-301). Until this round the fsspec routing was only
exercised via file:// — this drives the actual FTP protocol path,
including the netloc-preserving URL tagging fixed alongside it
(credentials/host/port must survive the glob -> per-task open hop)."""

from __future__ import annotations

import gzip

import pyarrow as pa
import ray.data as rd

from go_datax_ray.registry import SINKS, SOURCES

from _ftp_loopback import LoopbackFtpServer


def _ds(n: int, blocks: int):
    t = pa.table({"id": list(range(n)), "v": [f"v{i}" for i in range(n)]})
    return rd.from_arrow(t).repartition(blocks)


def test_ftpwriter_then_ftpreader_roundtrip(ray_session, tmp_path):
    root = tmp_path / "srv"
    root.mkdir()
    with LoopbackFtpServer(str(root)) as url:
        res = SINKS["ftpwriter"](_ds(300, 3), {
            "path": f"{url}/out", "fileName": "r", "header": ["id", "v"],
            "minRowsPerFile": 100,
        })
        assert res["records"] == 300
        assert len(res["files"]) == 3
        # files really landed on the server's disk, one per task
        on_disk = sorted(p.name for p in (root / "out").iterdir())
        assert on_disk == ["r_00000.csv", "r_00001.csv", "r_00002.csv"]
        # reported URLs keep host:port credentials (openable as-is)
        assert all(f.startswith(url) for f in res["files"])

        ds = SOURCES["ftpreader"]({
            "path": f"{url}/out/r_*.csv",
            "column": [{"index": 0, "type": "long"},
                       {"index": 1, "type": "string"}],
            "skipHeader": True,
        })
        rows = ds.take_all()
        assert sorted(r["column_0"] for r in rows) == list(range(300))


def test_ftpwriter_truncate_and_stale_cleanup(ray_session, tmp_path):
    root = tmp_path / "srv"
    root.mkdir()
    with LoopbackFtpServer(str(root)) as url:
        param = {"path": f"{url}/out", "fileName": "r", "minRowsPerFile": 100}
        SINKS["ftpwriter"](_ds(300, 3), param)
        # rerun with fewer tasks: stale r_00002 must be removed over FTP
        res2 = SINKS["ftpwriter"](_ds(200, 2), param)
        assert len(res2["files"]) == 2
        on_disk = sorted(p.name for p in (root / "out").iterdir())
        assert on_disk == ["r_00000.csv", "r_00001.csv"]
        # truncate mode deletes everything matching fileName* up front
        SINKS["ftpwriter"](_ds(100, 1),
                           {**param, "writeMode": "truncate"})
        on_disk = sorted(p.name for p in (root / "out").iterdir())
        assert on_disk == ["r_00000.csv"]


def test_ftp_gzip_roundtrip(ray_session, tmp_path):
    root = tmp_path / "srv"
    root.mkdir()
    with LoopbackFtpServer(str(root)) as url:
        SINKS["ftpwriter"](_ds(120, 1), {
            "path": f"{url}/gz", "fileName": "c", "compress": "gzip",
        })
        raw = (root / "gz" / "c_00000.csv.gz").read_bytes()
        assert len(gzip.decompress(raw).splitlines()) == 120
        ds = SOURCES["ftpreader"]({
            "path": f"{url}/gz/*.csv.gz",
            "column": [{"index": 0, "type": "long"},
                       {"index": 1, "type": "string"}],
            "compress": "gzip",
        })
        assert ds.count() == 120
