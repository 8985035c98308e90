"""Multimodal stages, windowed aggregates, compaction, dead-letter."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- multimodal
def test_media_pipeline_plumbing():
    from go_datax_ray.stages.multimodal import (
        AudioFeatures,
        ImageFeatures,
        frame_sample,
        make_media_table,
    )

    media = make_media_table(60)
    ds = rd.from_arrow(media)
    img = ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    n_img = (media.column("kind").to_pandas() == "image").sum()
    assert len(img) == n_img
    assert all(len(f) == 192 for f in img["features"])  # 8x8x3 pooled
    aud = ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert (aud["duration_s"] > 0).all()
    vid = ds.map_batches(
        frame_sample, fn_kwargs={"every_n": 10}, batch_format="pyarrow"
    ).to_pandas()
    assert set(vid["frame_idx"].unique()) == set(range(0, 100, 10))
    # determinism
    img2 = ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert img["phash"].tolist() == img2["phash"].tolist()


def test_media_real_backend_stubbed():
    from go_datax_ray.stages.multimodal import DecodeBackend

    with pytest.raises(NotImplementedError, match="PIL|cv2|codec"):
        DecodeBackend(backend="real")


# ---------------------------------------------------------------- windows
def test_tumbling_matches_duckdb():
    from go_datax_ray.stages.windows import tumbling_aggregate

    ds = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        tumbling_aggregate(ds, size_s=3600)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_value_cents
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["window_start"].tolist() == want["window_start"].tolist()
    assert got["sum_value_cents"].tolist() == want["sum_value_cents"].tolist()


def test_sliding_covers_each_event_k_times():
    from go_datax_ray.stages.windows import sliding_aggregate

    ds = rd.read_parquet(f"{SF}/events.parquet")
    got = sliding_aggregate(ds, size_s=3600, slide_s=900).to_pandas()
    n_events = 1000
    assert got["n"].sum() == n_events * 4  # every event in size/slide=4 windows


def test_session_windows():
    from go_datax_ray.stages.windows import session_windows

    t = pa.table(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": pa.array(
                [0, 10_000_000, 4_000_000_000, 4_010_000_000, 0], pa.timestamp("us")
            ),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = session_windows(rd.from_arrow(t), gap_s=1800).to_pandas().sort_values(
        ["user_id", "session_start"]
    )
    # user 1: two sessions (gap > 30min between 10s and 4000s)
    assert len(out[out["user_id"] == 1]) == 2
    assert out[out["user_id"] == 1]["n"].tolist() == [2, 2]
    assert len(out[out["user_id"] == 2]) == 1


# ------------------------------------------------------------- compaction
def test_compaction_drops_tombstones(tmp_path):
    from go_datax_ray.pipelines.cdc_replay import ReplayConfig, SynthEventSource, replay
    from go_datax_ray.sinks.lake import compact, read_lake_table
    from go_datax_ray.synth import SynthConfig

    lake = str(tmp_path / "lake")
    cfg = SynthConfig(seed=3, n_urls=200)
    replay(SynthEventSource(3000, cfg), ReplayConfig(lake_dir=lake, num_partitions=4))
    raw_before = read_lake_table(lake, final_state=False)
    n_tombs = raw_before.filter(
        pa.compute.equal(raw_before.column("op"), pa.scalar("D"))
    ).num_rows
    assert n_tombs > 0
    final_before = read_lake_table(lake)
    res = compact(lake)
    assert res["dropped_tombstones"] == n_tombs
    raw_after = read_lake_table(lake, final_state=False)
    assert raw_after.filter(
        pa.compute.equal(raw_after.column("op"), pa.scalar("D"))
    ).num_rows == 0
    # final state unchanged by compaction
    assert read_lake_table(lake).equals(final_before)
    # and replay after compaction still no-ops (watermark intact)
    res2 = replay(SynthEventSource(3000, cfg), ReplayConfig(lake_dir=lake, num_partitions=4))
    assert res2.events == 0


# ------------------------------------------------------------ dead letter
def test_dead_letter_routing():
    from go_datax_ray.engine import run_job

    job = {
        "job": {
            "setting": {"errorLimit": {"record": 1000}},
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {
                            "path": f"{SF}/documents.parquet",
                            "column": ["doc_id", "lang"],
                        },
                    },
                    # dx_substr on an int64 column raises in Arrow -> every
                    # row becomes a poison row routed to dead-letter
                    "transformer": [
                        {"name": "dx_substr", "parameter": {"column": "doc_id", "paras": ["0", "2"]}}
                    ],
                    "writer": {"name": "streamwriter", "parameter": {"print": False}},
                }
            ],
        }
    }
    res = run_job(job)
    assert res.error_records == 500
    assert res.records == 0


def test_error_limit_aborts_job():
    from go_datax_ray.engine import run_job
    from go_datax_ray.state.metrics import ErrorLimitExceeded

    job = {
        "job": {
            "setting": {"errorLimit": {"record": 10}},
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {"path": f"{SF}/documents.parquet", "column": ["doc_id"]},
                    },
                    "transformer": [
                        {"name": "dx_substr", "parameter": {"column": "doc_id", "paras": ["0", "2"]}}
                    ],
                    "writer": {"name": "streamwriter", "parameter": {"print": False}},
                }
            ],
        }
    }
    with pytest.raises(ErrorLimitExceeded):
        run_job(job)


def test_image_resize_stage():
    from go_datax_ray.stages.multimodal import ImageResize, make_media_table

    ds = rd.from_arrow(make_media_table(30))
    out = ds.map_batches(
        ImageResize, fn_constructor_kwargs={"out_w": 8, "out_h": 4},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    assert len(out) == (make_media_table(30).column("kind").to_pandas() == "image").sum()
    assert (out["width"] == 8).all() and (out["height"] == 4).all()
    # payloads are REAL PNGs now (pure-stdlib codec)
    from go_datax_ray.stages.codecs import png_decode

    assert all(png_decode(p).shape == (4, 8, 3) for p in out["payload"])
    # deterministic
    out2 = ds.map_batches(
        ImageResize, fn_constructor_kwargs={"out_w": 8, "out_h": 4},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    assert out["payload"].tolist() == out2["payload"].tolist()


def test_jsonl_writer_reader_roundtrip(tmp_path):
    """jsonfilewriter output parses back identically through
    jsonfilereader (writer/reader parity)."""
    from go_datax_ray.engine import run_job

    out_dir = tmp_path / "jout"
    write_job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {
                            "path": f"{SF}/customer.parquet",
                            "column": ["c_custkey", "c_name", "c_acctbal"],
                        },
                    },
                    "writer": {
                        "name": "jsonfilewriter",
                        "parameter": {"path": str(out_dir), "fileName": "cust",
                                      "fileFormat": "jsonl", "writeMode": "truncate"},
                    },
                }
            ]
        }
    }
    res = run_job(write_job)
    assert res.records == 150
    read_job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "jsonfilereader",
                        "parameter": {
                            "path": str(out_dir),
                            "column": [
                                {"name": "c_custkey", "type": "long"},
                                {"name": "c_name", "type": "string"},
                                {"name": "c_acctbal", "type": "double"},
                            ],
                        },
                    },
                    "writer": {"name": "streamwriter", "parameter": {"print": False}},
                }
            ]
        }
    }
    res2 = run_job(read_job)
    assert res2.records == 150
    import duckdb

    want = duckdb.sql(
        f"SELECT c_custkey, c_name FROM '{SF}/customer.parquet' ORDER BY c_custkey"
    ).df()
    got_first = sorted(res2.sink_result["lines"])[:3]
    assert all("\t" in ln for ln in got_first)


def test_delete_where_and_routing_and_mappings(tmp_path):
    """ES-writer analogue knobs: deleteBy conditions, routing column,
    index-mapping (declared output schema) enforcement."""
    import pyarrow as pa
    import ray.data as rd

    from go_datax_ray.sinks.lake import delete_where, read_lake_table
    from go_datax_ray.sinks.parquet import write as pwrite

    lake = str(tmp_path / "lake")
    t = pa.table({
        "pk": pa.array([1, 2, 3, 4], pa.int64()),
        "grp": ["a", "a", "b", "b"],
        "v": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
        "ver": pa.array([1, 1, 1, 1], pa.timestamp("us")),
    })
    pwrite(rd.from_arrow(t), {"path": lake, "writeMode": "upsert",
                              "primaryKey": "pk", "versionColumn": "ver",
                              "routing": "grp", "numPartitions": 4})
    full = read_lake_table(lake)
    assert full.num_rows == 4
    # routing: all rows of one grp share a partition
    df = full.select(["grp", "part_id"]).to_pandas()
    assert df.groupby("grp")["part_id"].nunique().max() == 1

    out = delete_where(lake, [["grp", "=", "a"], ["v", "<", 15.0]])
    assert out["deleted"] == 1
    left = read_lake_table(lake).to_pandas()
    assert sorted(left["pk"]) == [2, 3, 4]
    # delete survives an unrelated subsequent upsert (tombstone committed)
    t2 = pa.table({"pk": pa.array([5], pa.int64()), "grp": ["c"],
                   "v": pa.array([50.0], pa.float64()),
                   "ver": pa.array([2], pa.timestamp("us"))})
    pwrite(rd.from_arrow(t2), {"path": lake, "writeMode": "upsert",
                               "primaryKey": "pk", "versionColumn": "ver",
                               "routing": "grp", "numPartitions": 4})
    assert sorted(read_lake_table(lake).to_pandas()["pk"]) == [2, 3, 4, 5]

    # mappings: declared columns become the enforced output schema
    outp = str(tmp_path / "plain")
    res = pwrite(rd.from_arrow(t), {
        "path": outp,
        "column": [{"name": "pk", "type": "string"}, {"name": "v", "type": "long"}],
    })
    assert res["records"] == 4
    import pyarrow.parquet as pq

    got = pq.read_table(outp)
    assert got.column_names == ["pk", "v"]
    assert got.schema.field("pk").type == pa.string()
    assert got.schema.field("v").type == pa.int64()


def test_lake_cli(tmp_path):
    import json

    from go_datax_ray.lake_cli import main as cli
    from go_datax_ray.pipelines.cdc_replay import ReplayConfig, SynthEventSource, replay
    from go_datax_ray.synth import SynthConfig

    lake = str(tmp_path / "lake")
    replay(SynthEventSource(2000, SynthConfig(n_urls=200)),
           ReplayConfig(lake_dir=lake, num_partitions=4, epoch_size=1000))
    import io
    from contextlib import redirect_stdout

    def run(*args):
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert cli(list(args)) == 0
        return buf.getvalue()

    st = json.loads(run("status", lake))
    assert st["epoch"] == 1 and st["committed_partitions"] == 4
    assert len(run("lineage", lake).strip().splitlines()) == 2
    assert json.loads(run("gc-orphans", lake))["removed"] == 0
    out = json.loads(run("delete-where", lake, "--where", '[["lang","=","es"]]'))
    assert out["epoch"] == 2


def test_mongoreader_document_collapse(tmp_path):
    """mongoreader is a REAL document-store plugin over JSONL dumps
    (nested docs, dotted paths) — no opt-in needed for file paths; only
    live addresses fail."""
    import json

    import pytest

    from go_datax_ray.engine import run_job

    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in [
        {"_id": 1, "user": {"name": "ada", "age": 36}},
        {"_id": 2, "user": {"name": "bob", "age": 41}},
    ]))
    job = {
        "job": {
            "content": [{
                "reader": {"name": "mongoreader", "parameter": {
                    "path": str(p),
                    "column": [{"name": "_id", "type": "long"},
                               {"name": "user.name", "type": "string"}],
                }},
                "writer": {"name": "streamwriter", "parameter": {"print": False}},
            }]
        }
    }
    assert run_job(job).records == 2
    job["job"]["content"][0]["reader"]["parameter"]["address"] = ["mongodb://x"]
    with pytest.raises(ValueError, match="no live MongoDB"):
        run_job(job)


def test_cohash_map_groups_equals_per_group_map():
    """cohash_map_groups (coarse-bucket + in-block segmenting) must be
    output-equivalent to groupby().map_groups with a per-group fn, for a
    fn that reduces each logical group independently."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from go_datax_ray.stages.dedup import _col_np, _segments
    from go_datax_ray.stages.partition import cohash_map_groups

    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 700, n), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    ds = rd.from_arrow(t)

    def seg_min(g: pa.Table) -> pa.Table:
        order, bounds = _segments(g, ["k"], extra=_col_np(g, "v"))
        heads = bounds[:-1]
        kk = _col_np(g, "k")[order][heads]
        vv = _col_np(g, "v")[order][heads]
        return pa.table({"k": pa.array(kk, pa.int64()),
                         "vmin": pa.array(vv, pa.int64())})

    got = (cohash_map_groups(ds, ["k"], seg_min)
           .to_pandas().sort_values("k").reset_index(drop=True))

    def per_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"k": pa.array([g.column("k")[0].as_py()], pa.int64()),
                         "vmin": pa.array([pc.min(g.column("v")).as_py()], pa.int64())})

    want = (ds.groupby("k").map_groups(per_group, batch_format="pyarrow")
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist()
    assert got["vmin"].tolist() == want["vmin"].tolist()


def test_assign_session_ids_gaps_and_islands():
    """Hand-built gap structure + consistency with session_windows'
    session counts per user."""
    import pyarrow as pa

    import ray.data as rd

    from go_datax_ray.stages.windows import assign_session_ids

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
        # u1: 0s, 10s, 40min, 41min -> sessions {1,1,2,2}
        # u2: 0s, 31min, 31min+30min -> {1,2,2} (gap == 30min stays)
        "ts": pa.array(
            [0, 10 * us * 1, 2400 * us * 1, 2460 * us,
             0, 1860 * us, 1860 * us + 1800 * us],
            pa.int64(),
        ).cast(pa.timestamp("us")),
    })
    out = (
        assign_session_ids(rd.from_arrow(t), gap_s=1800)
        .to_pandas().sort_values("event_id")
    )
    assert list(out["session_idx"]) == [1, 1, 2, 2, 1, 2, 2]
