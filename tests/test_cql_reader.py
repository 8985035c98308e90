"""cassandrareader: token-ring split by partitioner, per-range CQL
SELECT rendering, distributed fetch through an injected session, loud
live-fail, registry routing."""

from __future__ import annotations

import sys

import pyarrow as pa
import pytest
from ray import cloudpickle

# The fake session classes below travel to Ray worker processes inside
# CQLFetch's constructor args; this test module is not importable there,
# so force Ray's cloudpickle to serialize its objects by value.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from go_datax_ray.sources import cql
from go_datax_ray.sources.cql import (
    MURMUR3_RING,
    RANDOM_RING,
    build_query,
    read,
    split_ranges,
    token_slices,
)

PARAM = {
    "host": "10.0.0.1,10.0.0.2", "keyspace": "ks", "table": "t",
    "column": ["id", "name", "score"],
}


# ---- ring split (cassandra_reader.go:154-252) ----

def test_murmur3_slices_cover_ring_half_open():
    slices = token_slices(MURMUR3_RING, 4)
    assert len(slices) == 4
    assert slices[0][0] == MURMUR3_RING[0]
    assert slices[-1][1] == MURMUR3_RING[1]
    # contiguous: each max is the next min ((min, max] half-open)
    for (_, hi), (lo, _) in zip(slices, slices[1:]):
        assert hi == lo
    # the Go port's int64 step overflow would make every non-final
    # slice empty; the intended equal-width math does not
    widths = [hi - lo for lo, hi in slices]
    assert min(widths) > 2**61


def test_random_partitioner_ring():
    slices = token_slices(RANDOM_RING, 3)
    assert slices[0][0] == -1 and slices[-1][1] == 2**127


def test_split_rules():
    # channel<=1 and unknown partitioners don't split
    assert split_ranges(PARAM, 1, "Murmur3Partitioner") == [None]
    assert split_ranges(PARAM, 4, "ByteOrderedPartitioner") == [None]
    # a user WHERE already constraining token() keeps its own slicing
    p = dict(PARAM, where="TOKEN(id) > 5")
    assert split_ranges(p, 4, "Murmur3Partitioner") == [None]
    assert len(split_ranges(PARAM, 4, "org.apache.cassandra.dht."
                            "Murmur3Partitioner")) == 4


# ---- query rendering (getQueryString, cassandra_reader.go:328-379) ----

def test_query_golden_unsplit():
    assert build_query(PARAM, partition_keys=[]) == \
        "SELECT id,name,score FROM t;"


def test_query_golden_where_token_filtering():
    p = dict(PARAM, where="score > 10", allowFiltering=True)
    got = build_query(p, partition_keys=["id", "name"],
                      token_range=(-100, 200))
    assert got == ("SELECT id,name,score FROM t WHERE score > 10 AND "
                   "token(id,name) > -100 AND token(id,name) <= 200 "
                   "ALLOW FILTERING;")


def test_validation_errors():
    with pytest.raises(ValueError, match="keyspace"):
        cql._validate({"host": "h", "table": "t", "column": ["a"]})
    with pytest.raises(ValueError, match="column"):
        cql._validate({"host": "h", "keyspace": "k", "table": "t"})
    with pytest.raises(ValueError, match="non-empty"):
        cql._validate(dict(PARAM, column=["a", ""]))


# ---- distributed fetch through an injected session ----

class FakeSession:
    """Serves rows whose token(id) = the id value itself (small ints sit
    in the first Murmur3 slice only if negative enough — instead we
    parse the rendered range and filter, proving each fetch task runs
    ITS OWN slice)."""

    ROWS = [{"id": i, "name": f"n{i}", "score": i * 10} for i in range(8)]

    def partitioner(self):
        return "Murmur3Partitioner"

    def partition_keys(self, keyspace, table):
        assert (keyspace, table) == ("ks", "t")
        return ["id"]

    def execute(self, stmt, consistency=None):
        assert consistency == "ONE"
        assert stmt.endswith(";")
        if "token(" not in stmt:
            return list(self.ROWS)
        import re

        lo = int(re.search(r"token\(id\) > (-?\d+)", stmt).group(1))
        hi = int(re.search(r"token\(id\) <= (-?\d+)", stmt).group(1))
        # fake token(id) = id scaled into the ring quarters
        step = (MURMUR3_RING[1] - MURMUR3_RING[0]) // 8
        return [r for r in self.ROWS
                if lo < MURMUR3_RING[0] + r["id"] * step + 1 <= hi]


def _fake_factory(param):
    return FakeSession()


def test_distributed_fetch_union_of_ranges(ray_session):
    ds = read(dict(PARAM, consistancyLevel="one"), channel=4,
              session_factory=_fake_factory)
    out = ds.sort("id").to_pandas()
    assert out["id"].tolist() == list(range(8))
    assert out["name"].tolist() == [f"n{i}" for i in range(8)]
    assert out["score"].tolist() == [i * 10 for i in range(8)]


def test_module_factory_reaches_workers(ray_session, monkeypatch):
    monkeypatch.setattr(cql, "SESSION_FACTORY", _fake_factory)
    ds = read(dict(PARAM, consistancyLevel="ONE"), channel=2)
    assert ds.count() == 8


def test_missing_values_become_nulls():
    t = cql._rows_to_table([{"id": 1}, {"id": 2, "name": "x"}],
                           ["id", "name"])
    assert t.column("name").to_pylist() == [None, "x"]
    assert isinstance(t, pa.Table)


# ---- loud-fail + registry routing ----

def test_live_path_fails_loudly():
    with pytest.raises(RuntimeError, match="cassandra-driver"):
        read(PARAM, channel=2)


def test_registry_routes_host_to_cql(ray_session, tmp_path):
    from go_datax_ray.registry import SOURCES

    with pytest.raises(RuntimeError, match="cassandra-driver"):
        SOURCES["cassandrareader"](PARAM, channel=1)
    # dump-style params keep the explicit collapse gate
    with pytest.raises(ValueError, match="allowCollapse"):
        SOURCES["cassandrareader"]({"path": str(tmp_path)}, channel=1)
