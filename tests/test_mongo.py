"""Mongo-analogue plugin: query-filter grammar + ReplaceOne-upsert.

Reference semantics: mongo_reader.go:42-121 (query filter), mongo_
writer.go:402-446 (ReplaceOne upsert / InsertMany).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from go_datax_ray.sources.mongo import query_mask


def _t():
    return pa.table(
        {
            "a": pa.array([1, 2, 3, None, 5], pa.int64()),
            "s": pa.array(["foo", "bar", "foobar", "baz", None], pa.string()),
        }
    )


def _m(q):
    return query_mask(_t(), q).to_pylist()


def test_query_mask_operators():
    assert _m({"a": 2}) == [False, True, False, False, False]
    assert _m({"a": {"$gte": 2, "$lt": 5}}) == [False, True, True, False, False]
    # Mongo: $ne matches null fields too
    assert _m({"a": {"$ne": 2}}) == [True, False, True, True, True]
    assert _m({"a": {"$in": [1, 5]}}) == [True, False, False, False, True]
    assert _m({"a": {"$nin": [1, 5]}}) == [False, True, True, True, False]
    assert _m({"s": {"$regex": "^foo"}}) == [True, False, True, False, False]
    assert _m({"a": {"$exists": True}}) == [True, True, True, False, True]
    assert _m({"a": {"$exists": False}}) == [False, False, False, True, False]
    assert _m({"a": None}) == [False, False, False, True, False]
    # implicit AND across fields; $or across documents
    assert _m({"a": {"$gte": 2}, "s": {"$regex": "bar"}}) == [
        False, True, True, False, False]
    assert _m({"$or": [{"a": 1}, {"s": "baz"}]}) == [
        True, False, False, True, False]
    assert _m({"$nor": [{"a": 1}, {"s": "baz"}]}) == [
        False, True, True, False, True]


def test_query_mask_missing_field():
    # a field absent from the projection: $ne/$nin/$exists:false match
    assert _m({"zzz": {"$ne": 1}}) == [True] * 5
    assert _m({"zzz": {"$nin": [1]}}) == [True] * 5
    assert _m({"zzz": {"$exists": False}}) == [True] * 5
    assert _m({"zzz": 1}) == [False] * 5
    assert _m({"zzz": {"$gt": 0}}) == [False] * 5


def _dump(tmpdir, docs, name="c_00000.jsonl"):
    os.makedirs(tmpdir, exist_ok=True)
    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    return p


def test_mongoreader_query_end_to_end(tmp_path, ray_session):
    from go_datax_ray.registry import SOURCES

    coll = str(tmp_path / "coll")
    _dump(coll, [
        {"_id": 1, "user": {"name": "ann"}, "score": 9},
        {"_id": 2, "user": {"name": "bob"}, "score": 3},
        {"_id": 3, "user": {"name": "cat"}, "score": 7},
    ])
    ds = SOURCES["mongoreader"](
        {
            "path": f"{coll}/*.jsonl",
            "column": [
                {"name": "_id", "type": "long"},
                {"name": "user.name", "type": "string"},
                {"name": "score", "type": "long"},
            ],
            "query": json.dumps({"score": {"$gte": 5}}),
        }
    )
    rows = sorted(ds.take_all(), key=lambda r: r["_id"])
    assert [r["_id"] for r in rows] == [1, 3]
    assert rows[0]["user_name"] == "ann"


def test_mongoreader_rejects_live_address():
    from go_datax_ray.registry import SOURCES

    with pytest.raises(ValueError, match="no live MongoDB"):
        SOURCES["mongoreader"]({"address": ["mongodb://x:27017"], "path": "/tmp/x"})


def test_mongoreader_query_field_not_projected(tmp_path, ray_session):
    from go_datax_ray.registry import SOURCES

    coll = str(tmp_path / "coll")
    _dump(coll, [{"_id": 1, "score": 2}])
    ds = SOURCES["mongoreader"](
        {
            "path": f"{coll}/*.jsonl",
            "column": [{"name": "_id", "type": "long"}],
            "query": {"score": {"$gte": 5}},
        }
    )
    with pytest.raises(Exception, match="not in the column projection"):
        ds.take_all()


def test_mongowriter_replace_upsert(tmp_path, ray_session):
    import ray.data as rd

    from go_datax_ray.registry import SINKS, SOURCES

    coll = str(tmp_path / "coll")
    # seed the collection via insert mode
    seed = rd.from_items([
        {"_id": 1, "v": "old1"},
        {"_id": 2, "v": "old2"},
    ])
    SINKS["mongowriter"]({"path": coll}) if False else None
    SINKS["mongowriter"](seed, {"path": coll, "fileName": "c"})
    # replace: update _id=2, insert _id=3; duplicate incoming _id=3
    # resolves by orderColumn (ver) — highest wins
    newd = rd.from_items([
        {"_id": 2, "v": "new2", "ver": 1},
        {"_id": 3, "v": "new3-lo", "ver": 1},
        {"_id": 3, "v": "new3-hi", "ver": 2},
    ])
    res = SINKS["mongowriter"](
        newd,
        {"path": coll, "writeMode": "replace", "replaceKey": "_id",
         "orderColumn": "ver"},
    )
    assert res["records"] == 3
    docs = []
    for fn in sorted(os.listdir(coll)):
        with open(os.path.join(coll, fn)) as f:
            docs += [json.loads(l) for l in f if l.strip()]
    byid = {d["_id"]: d for d in docs}
    assert len(docs) == 3 and set(byid) == {1, 2, 3}
    assert byid[1]["v"] == "old1"          # untouched survives
    assert byid[2]["v"] == "new2"          # replaced
    assert byid[3]["v"] == "new3-hi"       # upserted, orderColumn winner


def test_mongowriter_replace_requires_key(ray_session):
    import ray.data as rd

    from go_datax_ray.registry import SINKS

    with pytest.raises(ValueError, match="replaceKey"):
        SINKS["mongowriter"](
            rd.from_items([{"_id": 1}]), {"path": "/tmp/x", "writeMode": "replace"}
        )
