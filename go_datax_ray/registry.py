"""Plugin registry: name -> reader/writer, populated at import.

The reference registers 42 plugins via init() side-effect imports
(/root/reference/core/registry/registry.go:10-185, cmd/datax/main.go:6-48).
Ours is two dicts; aliases map every reference RDBMS plugin name onto the
engine's columnar equivalents so existing job JSONs resolve.
"""

from __future__ import annotations

from .sinks import jsonfile as jsonfile_sink
from .sinks import parquet as parquet_sink
from .sinks import stream as stream_sink
from .sinks import txtfile as txtfile_sink
from .sources import jsonfile as jsonfile_src
from .sources import parquet as parquet_src
from .sources import stream as stream_src
from .sources import txtfile as txtfile_src

SOURCES = {
    "txtfilereader": txtfile_src.read,
    "jsonfilereader": jsonfile_src.read,
    "streamreader": stream_src.read,
    "parquetreader": parquet_src.read,
}

# The 14 reference RDBMS/warehouse readers collapse onto the parquet
# source (their SELECT/WHERE/split semantics — SURVEY.md §2.3): a user
# migrating a job points `path` at the table's lake location.
for _name in (
    "mysqlreader", "postgresqlreader", "oraclereader", "sqlserverreader",
    "sybasereader", "gaussdbreader", "sqlitereader", "clickhousereader",
    "dorisreader", "starrocksreader", "oceanbasereader", "tdenginereader",
    "cassandrareader", "mongoreader", "hdfsreader", "ossreader", "ftpreader",
):
    SOURCES.setdefault(_name, parquet_src.read)

SINKS = {
    "txtfilewriter": txtfile_sink.write,
    "jsonfilewriter": jsonfile_sink.write,
    "streamwriter": stream_sink.write,
    "parquetwriter": parquet_sink.write,
}

# RDBMS/warehouse writers -> parquet sink (writeMode=upsert gives their
# ON CONFLICT DO UPDATE semantics through the exactly-once lake).
for _name in (
    "mysqlwriter", "postgresqlwriter", "oraclewriter", "sqlserverwriter",
    "sybasewriter", "gaussdbwriter", "sqlitewriter", "oceanbasewriter",
    "clickhousewriter", "doriswriter", "starrockswriter", "databendwriter",
    "elasticsearchwriter", "mongowriter", "cassandrawriter", "neo4jwriter",
    "tdenginewriter", "hdfswriter", "osswriter", "ftpwriter",
):
    SINKS.setdefault(_name, parquet_sink.write)
