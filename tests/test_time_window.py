"""tdenginereader time-window grammar: format/order validation, parquet
filter pushdown, SQL WHERE folding (tdengine_reader.go:146-168,349-355
parity)."""

from __future__ import annotations

import datetime
import sqlite3

import pytest

from go_datax_ray.sources import sqldb
from go_datax_ray.sources.parquet import time_window

SF = "/root/testdata/sf0.001"


def test_validation_matches_reference():
    with pytest.raises(ValueError, match=r"\[beginDateTime\] needs to"):
        time_window({"beginDateTime": "2024-01-10"})
    with pytest.raises(ValueError, match="should be less than"):
        time_window({"beginDateTime": "2024-01-15 00:00:00",
                     "endDateTime": "2024-01-10 00:00:00"})
    assert time_window({}) is None


def test_triplets_default_c0_and_open_ends():
    tw = time_window({"beginDateTime": "2024-01-10 00:00:00"})
    assert tw == [["_c0", ">=", datetime.datetime(2024, 1, 10)]]
    tw = time_window({"endDateTime": "2024-01-15 06:30:00", "tsColumn": "ts"})
    assert tw == [["ts", "<", datetime.datetime(2024, 1, 15, 6, 30)]]


def test_parquet_pushdown_matches_duckdb(ray_session):
    import duckdb

    from go_datax_ray.registry import SOURCES

    ds = SOURCES["tdenginereader"](
        {"path": f"{SF}/events.parquet", "column": ["event_id", "ts"],
         "tsColumn": "ts",
         "beginDateTime": "2024-01-10 00:00:00",
         "endDateTime": "2024-01-15 00:00:00",
         "allowCollapse": True},
        channel=2,
    )
    want = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet' "
        "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'"
    ).fetchone()[0]
    assert ds.count() == want > 0


def test_sql_source_folds_window_into_where(ray_session, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE m (ts TEXT, v INTEGER)")
    con.executemany("INSERT INTO m VALUES (?, ?)", [
        ("2024-01-09 23:59:59", 1), ("2024-01-10 00:00:00", 2),
        ("2024-01-12 12:00:00", 3), ("2024-01-15 00:00:00", 4)])
    con.commit(); con.close()
    ds = sqldb.read({"path": db, "table": "m", "tsColumn": "ts",
                     "where": "v != 99",
                     "beginDateTime": "2024-01-10 00:00:00",
                     "endDateTime": "2024-01-15 00:00:00"})
    assert sorted(r["v"] for r in ds.take_all()) == [2, 3]
