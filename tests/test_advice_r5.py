"""Round-5 regression tests for the ADVICE.md (r4) findings.

- _with_auth must survive SQL Server-style ';key=value' property URLs
  (sqlserver_writer.go:196's documented jdbc shape) instead of letting
  urlsplit parse the props into the port and raise ValueError
- dbwriter must not rewrite a sqlite path into '//user:pass@/tmp/x.db'
  when the job carries username/password params (sqldb.read's gate)
- dbwriter's returned stats must never expose the plaintext password
  that _with_auth injected into the URL
"""

from __future__ import annotations

import sqlite3

import pyarrow as pa
import ray.data as rd

from go_datax_ray.sinks.dbwriter import _mask_userinfo, write
from go_datax_ray.sources import sqldb


def test_with_auth_sqlserver_property_url():
    """ADVICE medium: ';DatabaseName=db' used to reach urlsplit and blow
    up with 'Port could not be cast to integer'."""
    url = sqldb._with_auth(
        "sqlserver://h:1433;DatabaseName=db",
        {"username": "sa", "password": "p@ss"})
    assert url == "sqlserver://sa:p%40ss@h:1433;DatabaseName=db"


def test_with_auth_property_url_existing_creds_untouched():
    keep = "sqlserver://sa:x@h:1433;DatabaseName=db;encrypt=false"
    assert sqldb._with_auth(keep, {"username": "other"}) == keep


def test_with_auth_property_url_no_username_untouched():
    keep = "sqlserver://h:1433;DatabaseName=db"
    assert sqldb._with_auth(keep, {}) == keep


def test_sqlite_write_ignores_username_param(ray_session, tmp_path):
    """ADVICE low: a sqlite job carrying username/password params used to
    get its path rewritten to '//user:pass@/tmp/x.db'."""
    db = str(tmp_path / "auth.db")
    res = write(rd.from_arrow(pa.table({"id": [1, 2], "v": ["a", "b"]})), {
        "jdbcUrl": db, "driver": "sqlite", "table": "t",
        "username": "app", "password": "s3cret", "channel": 1,
        "preSql": ["CREATE TABLE @table (id INTEGER PRIMARY KEY, v TEXT)"],
    })
    assert res["records"] == 2
    assert res["path"] == db  # not //app:s3cret@/tmp/.../auth.db
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM t").fetchone() == (2,)
    con.close()


def test_stats_path_masks_password():
    """ADVICE low: job stats/logs must not leak the injected password."""
    masked = _mask_userinfo("mysql://app:s3cret@h:3306/db")
    assert "s3cret" not in masked
    assert masked == "mysql://app:***@h:3306/db"
    # user-only and credential-free URLs stay readable
    assert _mask_userinfo("mysql://app@h/db") == "mysql://app:***@h/db"
    assert _mask_userinfo("mysql://h:3306/db") == "mysql://h:3306/db"
    assert _mask_userinfo("/tmp/plain.db") == "/tmp/plain.db"
