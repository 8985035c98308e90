"""Object-store exercise: the lake and the oss/s3 file IO against a REAL
S3 endpoint — a loopback moto server — through the boto3-backed fsspec
fallback (state/s3boto.py).

test_fsspec_lake / test_fsspec_files prove the fsspec code paths over
file://; this module proves them over the actual S3 wire protocol:
prefix listings, ranged GETs, multipart uploads, copy+delete manifest
swap (NOT atomic — the documented hard single-writer requirement for
object-store lakes, state/fs.py module docstring), and the no-rename
content-addressed data plane. The endpoint/credential env is pinned in
conftest.py BEFORE ray.init so Ray worker processes inherit it.
"""

import os

import pytest

pytest.importorskip("moto")
pytest.importorskip("boto3")

from go_datax_ray.engine import run_job
from go_datax_ray.pipelines.cdc_replay import ReplayConfig, SynthEventSource, replay
from go_datax_ray.sinks.lake import read_lake, read_lake_table
from go_datax_ray.state.fs import LakeFS
from go_datax_ray.state.manifest import Manifest
from go_datax_ray.synth import SynthConfig

BUCKET = "enginetest"


@pytest.fixture(scope="module")
def s3_bucket():
    import boto3
    from moto.server import ThreadedMotoServer

    ep = os.environ["AWS_ENDPOINT_URL"]
    port = int(ep.rsplit(":", 1)[1])
    srv = ThreadedMotoServer(ip_address="127.0.0.1", port=port, verbose=False)
    srv.start()
    boto3.client("s3", endpoint_url=ep).create_bucket(Bucket=BUCKET)
    yield BUCKET
    srv.stop()


def test_s3_lake_replay_round_trip(s3_bucket, tmp_path):
    plain = str(tmp_path / "lake_plain")
    uri = f"s3://{s3_bucket}/lake_rt"
    cfg = SynthConfig(seed=11, n_urls=300)
    for lake in (plain, uri):
        res = replay(
            SynthEventSource(3000, cfg),
            ReplayConfig(lake_dir=lake, num_partitions=4, epoch_size=1000),
        )
        assert res.events == 3000 and res.epochs == 3
    # identical committed state on local disk and on the object store
    t_plain = read_lake_table(plain).drop_columns(["part_id"])
    t_s3 = read_lake_table(uri).drop_columns(["part_id"])
    assert t_plain.equals(t_s3)
    # streaming (ray.data) read over the s3 lake
    assert read_lake(uri).count() == t_s3.num_rows
    # resume is a watermark no-op over s3 too
    res2 = replay(
        SynthEventSource(3000, cfg),
        ReplayConfig(lake_dir=uri, num_partitions=4, epoch_size=1000),
    )
    assert res2.events == 0 and res2.epochs == 0
    # lineage reconciles through the object store
    man = Manifest.load(uri)
    assert len(man.lineage()) == man.epoch + 1 == 3


def test_oss_reader_writer_over_s3(s3_bucket):
    out = f"s3://{s3_bucket}/oss_out"
    job = {
        "job": {
            "content": [{
                "reader": {"name": "parquetreader", "parameter": {
                    "path": "/root/testdata/sf0.001/region.parquet",
                    "column": ["r_regionkey", "r_name"],
                }},
                "writer": {"name": "osswriter", "parameter": {
                    "path": out, "fileName": "region",
                    "writeMode": "truncate",
                }},
            }]
        }
    }
    res = run_job(job)
    assert res.records == 5
    assert all(f.startswith("s3://") for f in res.sink_result["files"])
    # read back through the ossreader with a glob over the bucket prefix
    back = {
        "job": {
            "content": [{
                "reader": {"name": "ossreader", "parameter": {
                    "path": f"{out}/region*"}},
                "writer": {"name": "streamwriter", "parameter": {"print": False}},
            }]
        }
    }
    assert run_job(back).records == 5
    # nonConflict sees the existing objects via the prefix listing
    job["job"]["content"][0]["writer"]["parameter"]["writeMode"] = "nonConflict"
    with pytest.raises(Exception, match="nonConflict"):
        run_job(job)


def test_s3_maintenance_soak(s3_bucket, ray_session):
    """The FULL maintenance soak (replay, delete_where, compaction,
    time-travel, gc_history, gc_orphans — scripts/lake_soak.py) over the
    object store: every manifest save in every maintenance op rides the
    If-Match conditional swap, the data plane stays rename-free, and the
    exact driver-side LWW oracle must hold bit-for-bit as it does
    locally."""
    import importlib.util

    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "lake_soak.py")
    spec = importlib.util.spec_from_file_location("lake_soak_s3", p)
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)
    stats = soak.run_soak(f"s3://{s3_bucket}/soak", cycles=2,
                          events_per_cycle=800, n_urls=150)
    assert stats["cycles"] == 2
    assert stats["compactions"] == 2
    assert stats["tombstones_dropped"] > 0
    assert stats["asof_checks"] >= 6
    assert stats["gc_orphans_removed"] >= 1
    assert stats["evolution_checks"] >= 2


def test_s3_multipart_and_manifest_swap(s3_bucket):
    fsh = LakeFS(f"s3://{s3_bucket}/raw")
    # multipart upload: 11 MiB through the buffered file (5 MiB parts ->
    # 2 parts + final), then ranged read-back of head and tail
    p = fsh.join("big.bin")
    payload = (b"0123456789abcdef" * (11 * 2**20 // 16))
    with fsh.open(p, "wb") as f:
        f.write(payload)
    with fsh.open(p, "rb") as f:
        assert f.read(16) == payload[:16]
        f.seek(len(payload) - 16)
        assert f.read(16) == payload[-16:]
    assert fsh.exists(p) and not fsh.local
    # manifest-style swap: tmp write + mv (copy+delete on S3) is
    # last-writer-wins, never leaves the tmp object behind
    m = fsh.join("_manifest.json")
    fsh.write_json_atomic(m, '{"epoch": 0}')
    fsh.write_json_atomic(m, '{"epoch": 1}')
    with fsh.open(m, "rb") as f:
        assert b'"epoch": 1' in f.read()
    assert not fsh.exists(m + ".tmp")
    # listing and delete through the facade
    assert "big.bin" in fsh.listdir(fsh.join(""))
    fsh.remove(p)
    assert not fsh.exists(p)
