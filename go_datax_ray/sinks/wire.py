"""Wire-format serializers for the HTTP bulk-loading sinks.

The reference ships two HTTP load protocols this sandbox cannot speak
live (no network): the Elasticsearch bulk API
(/root/reference/plugins/writer/elasticsearchwriter/elasticsearch_writer.go:845-961)
and Doris/StarRocks Stream Load
(/root/reference/plugins/writer/doriswriter/doris_writer.go:396-548).
This module renders their exact REQUEST BODIES (and headers) so the
engine's jobs produce byte-faithful, replayable load files: each Ray
block becomes one bulk/stream-load chunk file plus a ``_requests.jsonl``
manifest describing the HTTP request (method, URL, headers, body file) —
``curl -T`` replayable against a real cluster.

Format-fidelity notes (golden-tested):
- Action/doc JSON matches Go ``json.Marshal``: compact separators and
  alphabetically sorted keys. (Go additionally HTML-escapes ``<>&``;
  we do not — documents containing those bytes differ there.)
- Stream Load CSV matches Go ``encoding/csv`` with the configured
  ``column_separator`` (default TAB): minimal quoting, ``\\N`` for NULL
  (doris_writer.go:418), LF line ends.
- Stream Load labels are ``labelPrefix + content-hash`` instead of the
  reference's ``labelPrefix + UnixNano`` (doris_writer.go:489): Doris
  dedups loads BY LABEL, so a content-addressed label makes chunk
  retries idempotent — the same at-most-once intent, made deterministic.
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import json
import os
from typing import Any

import pyarrow as pa


def _json_go(obj: Any) -> str:
    """Compact, key-sorted JSON — Go json.Marshal's layout."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def _row_value(v: Any) -> Any:
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return base64.b64encode(v).decode()
    return v


def _rows(batch: pa.Table, columns: list[str] | None) -> list[dict[str, Any]]:
    cols = columns or batch.column_names
    data = {c: batch.column(c).to_pylist() for c in cols if c in batch.column_names}
    return [
        {c: _row_value(data[c][i]) for c in data}
        for i in range(batch.num_rows)
    ]


def _strip_nulls(m: dict) -> dict:
    """removeNullValues (elasticsearch_writer.go:1405-1413): recursive."""
    out = {}
    for k, v in m.items():
        if v is None:
            continue
        out[k] = _strip_nulls(v) if isinstance(v, dict) else v
    return out


def es_bulk_body(batch: pa.Table, *, index: str, action_type: str = "index",
                 id_col: str | None = None, routing_col: str | None = None,
                 version_col: str | None = None, op_col: str | None = None,
                 es_version: int = 7, index_type: str | None = None,
                 write_null: bool = False,
                 columns: list[str] | None = None) -> bytes:
    """One ES _bulk request body (NDJSON) for a batch.

    Faithful to elasticsearch_writer.go:845-961: per row one action
    metadata line + one doc line (none for deletes); delete rows are
    those whose ``op_col`` equals 'D'; update wraps the doc in
    {"doc": ..., "doc_as_upsert": true}; version implies
    version_type=external (except update); es_version < 7 adds _type.
    Meta columns (id/routing/version/op) are excluded from the doc."""
    meta_cols = {c for c in (id_col, routing_col, version_col, op_col) if c}
    doc_cols = [c for c in (columns or batch.column_names) if c not in meta_cols]
    rows = _rows(batch, list(meta_cols | set(doc_cols)))
    buf = io.StringIO()
    for r in rows:
        doc = {c: r.get(c) for c in doc_cols}
        rid = r.get(id_col) if id_col else None
        rid = None if rid is None else str(rid)
        routing = r.get(routing_col) if routing_col else None
        version = r.get(version_col) if version_col else None
        is_delete = op_col is not None and r.get(op_col) == "D"
        if is_delete:
            meta: dict[str, Any] = {"_index": index, "_id": rid}
            if es_version < 7:
                meta["_type"] = index_type or index
            buf.write(_json_go({"delete": meta}))
            buf.write("\n")
            continue
        name = action_type
        meta = {"_index": index}
        if rid:  # index/create: _id only when non-empty (common.go parity)
            meta["_id"] = rid
        if name == "update":
            meta["_id"] = rid  # update always addresses a doc id
            doc = {"doc": doc, "doc_as_upsert": True}
        if es_version < 7:
            meta["_type"] = index_type or index
        if routing:
            meta["routing"] = str(routing)
        if version is not None and name != "update":
            meta["version"] = str(version)
            meta["version_type"] = "external"
        buf.write(_json_go({name: meta}))
        buf.write("\n")
        if not write_null:
            if name == "update":
                doc["doc"] = _strip_nulls(doc["doc"])
            else:
                doc = _strip_nulls(doc)
        buf.write(_json_go(doc))
        buf.write("\n")
    return buf.getvalue().encode("utf-8")


def stream_load_csv(batch: pa.Table, *, columns: list[str] | None = None,
                    column_separator: str = "\t") -> bytes:
    """Stream Load CSV chunk (doris_writer.go:396-435): configured
    separator (default TAB), ``\\N`` for NULL, minimal quoting, LF."""
    sep = "\t" if column_separator in ("\\t", "", None) else column_separator
    cols = columns or batch.column_names
    data = {c: batch.column(c).to_pylist() for c in cols}
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=sep[0], lineterminator="\n")
    for i in range(batch.num_rows):
        w.writerow(
            ["\\N" if data[c][i] is None else str(_row_value(data[c][i]))
             for c in cols]
        )
    return buf.getvalue().encode("utf-8")


def stream_load_json(batch: pa.Table, *, columns: list[str] | None = None) -> bytes:
    """Stream Load JSON chunk (doris_writer.go:437-459): one array of
    row objects, Go-marshal layout."""
    return _json_go(_rows(batch, columns)).encode("utf-8")


def stream_load_request(body: bytes, *, host: str, database: str, table: str,
                        username: str = "root", password: str = "",
                        label_prefix: str = "datax_",
                        fmt: str = "csv",
                        load_props: dict | None = None) -> dict[str, Any]:
    """The PUT request envelope (doris_writer.go:484-521), with a
    content-addressed label (see module docstring)."""
    label = label_prefix + hashlib.md5(body).hexdigest()[:20]
    headers = {
        "Authorization": "Basic "
        + base64.b64encode(f"{username}:{password}".encode()).decode(),
        "Content-Type": "application/json" if fmt == "json" else "text/plain",
        "label": label,
        "Expect": "100-continue",
    }
    if fmt == "json":
        headers["format"] = "json"
        headers["strip_outer_array"] = "true"
    for k, v in (load_props or {}).items():
        headers[k] = str(v)
    return {
        "method": "PUT",
        "url": f"http://{host}/api/{database}/{table}/_stream_load",
        "headers": headers,
        "label": label,
    }


def _neo4j_value(v: Any, ptype: str, split: str = ",", date_format: str | None = None) -> Any:
    """Property-type conversion, faithful to convertColumnValue
    (neo4j_writer.go:358-438): BOOLEAN/STRING/LONG/SHORT/INT/DOUBLE/
    FLOAT/dates/LIST-split/MAP-json; unknown types pass as strings."""
    import datetime

    if v is None:
        return None
    t = (ptype or "STRING").upper()
    if t == "BOOLEAN":
        return bool(v)
    if t in ("LONG", "SHORT", "INTEGER", "INT"):
        return int(v)
    if t in ("DOUBLE", "FLOAT"):
        return float(v)
    if t in ("LOCAL_DATE", "LOCAL_DATE_TIME", "LOCAL_TIME"):
        if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
            return v.isoformat()
        return str(v)
    if t == "LIST":
        s = str(v)
        return [p.strip() for p in s.split(split or ",")] if s else []
    if t == "MAP":
        s = str(v)
        return json.loads(s) if s else {}
    return _row_value(v) if isinstance(v, (bytes, datetime.date)) else str(v)


def neo4j_tx_body(batch: pa.Table, *, cypher: str, var_name: str = "batch",
                  properties: list[dict] | None = None,
                  columns: list[str] | None = None) -> bytes:
    """One neo4j HTTP transaction-API request body: the user's cypher
    with the whole block bound as the ``$batch`` parameter — byte-layout
    analogue of the bolt writer's flushRecords (neo4j_writer.go:539-551
    ``parameters[batchDataVariableName] = records``). ``properties``
    maps columns POSITIONALLY (name/type/split/dateFormat), exactly the
    reference's convertRecord contract: a count mismatch is an error."""
    cols = columns or batch.column_names
    props = properties or [{"name": c, "type": "STRING"} for c in cols]
    if len(props) != len(cols):
        raise ValueError(
            f"the read and write columns do not match! expected "
            f"{len(props)} columns, got {len(cols)} (neo4j_writer.go:335)"
        )
    data = {c: batch.column(c).to_pylist() for c in cols}
    records = [
        {
            p["name"]: _neo4j_value(
                data[c][i], p.get("type", "STRING"),
                p.get("split", ","), p.get("dateFormat"),
            )
            for c, p in zip(cols, props)
        }
        for i in range(batch.num_rows)
    ]
    return _json_go(
        {"statements": [{"statement": cypher,
                         "parameters": {var_name: records}}]}
    ).encode("utf-8")


# --------------------------------------------------------------------------
# Ray sinks: distributed chunk rendering + request manifest


def _chunked_write(ds, path: str, render, request_for) -> dict[str, Any]:
    """map_batches stage: render each block to a content-hash-named chunk
    file and emit its request record; the driver only aggregates the tiny
    (file, label, records, bytes) rows."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"file": pa.array([], pa.string()),
                 "records": pa.array([], pa.int64()),
                 "bytes": pa.array([], pa.int64()),
                 "request": pa.array([], pa.string())}
            )
        body = render(t)
        tag = hashlib.md5(body).hexdigest()[:16]
        req = request_for(body, tag)
        fp = os.path.join(path, req.pop("_file_name"))
        with open(fp, "wb") as f:
            f.write(body)
        req["body_file"] = fp
        return pa.table(
            {"file": pa.array([fp], pa.string()),
             "records": pa.array([t.num_rows], pa.int64()),
             "bytes": pa.array([len(body)], pa.int64()),
             "request": pa.array([json.dumps(req, sort_keys=True)], pa.string())}
        )

    stats = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    manifest = os.path.join(path, "_requests.jsonl")
    with open(manifest, "w") as f:
        for r in sorted(stats, key=lambda r: r["file"]):
            f.write(r["request"] + "\n")
    return {
        "records": int(sum(r["records"] for r in stats)),
        "bytes": int(sum(r["bytes"] for r in stats)),
        "files": sorted(r["file"] for r in stats),
        "manifest": manifest,
    }


def write_es_bulk(ds, param: dict[str, Any]) -> dict[str, Any]:
    """elasticsearchwriter: renders real _bulk NDJSON bodies to
    ``parameter.path`` (no live cluster in-sandbox; replay with
    ``curl -H 'Content-Type: application/x-ndjson' --data-binary @file
    host/_bulk``)."""
    path = param.get("path")
    if not path:
        raise ValueError(
            "elasticsearchwriter renders bulk request bodies to files in "
            "this engine (no live HTTP in-sandbox): set parameter.path for "
            "the rendered chunks, or parameter.allowCollapse=true for the "
            "lake-upsert collapse."
        )
    index = param.get("index")
    if not index:
        raise ValueError("elasticsearchwriter needs 'index'")
    kw = dict(
        index=index,
        action_type=param.get("actionType", "index"),
        id_col=param.get("idColumn"),
        routing_col=param.get("routingColumn"),
        version_col=param.get("versionColumn"),
        op_col=param.get("opColumn"),
        es_version=int(param.get("esVersion", 7)),
        index_type=param.get("indexType") or param.get("type"),
        write_null=bool(param.get("enableWriteNull", False)),
        columns=param.get("column"),
    )
    host = param.get("endpoint", "http://localhost:9200")

    def request_for(body: bytes, tag: str) -> dict[str, Any]:
        return {
            "_file_name": f"bulk-{tag}.ndjson",
            "method": "POST",
            "url": f"{host}/_bulk",
            "headers": {"Content-Type": "application/x-ndjson"},
        }

    return _chunked_write(
        ds, path, lambda t: es_bulk_body(t, **kw), request_for
    )


_CH_ESCAPES = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}


def clickhouse_tsv(batch: pa.Table, *, columns: list[str] | None = None) -> bytes:
    """ClickHouse TabSeparated chunk: TAB columns, LF rows, backslash
    escapes for tab/newline/backslash, ``\\N`` for NULL (the public
    TabSeparated format the HTTP interface ingests — the byte-level
    equivalent of the reference's batched native INSERT,
    clickhouse_writer.go:282-327)."""
    cols = columns or batch.column_names
    data = {c: batch.column(c).to_pylist() for c in cols}

    def esc(v: Any) -> str:
        if v is None:
            return "\\N"
        s = str(_row_value(v))
        for raw, enc in _CH_ESCAPES.items():
            s = s.replace(raw, enc)
        return s

    lines = (
        "\t".join(esc(data[c][i]) for c in cols)
        for i in range(batch.num_rows)
    )
    return ("\n".join(lines) + "\n").encode("utf-8") if batch.num_rows else b""


def write_clickhouse(ds, param: dict[str, Any]) -> dict[str, Any]:
    """clickhousewriter: renders TabSeparated INSERT chunks + HTTP
    requests against ClickHouse's public HTTP interface
    (``POST /?query=INSERT INTO db.t (cols) FORMAT TabSeparated``) to
    ``parameter.path`` — the wire analogue of the reference's native
    batched insert (clickhouse_writer.go:282-327); preSql/postSql render
    as leading/trailing query requests in the manifest, mirroring
    Prepare/Post (clickhouse_writer.go:171-229). Replay with
    sinks.http_replay (retry-on-5xx) or ``curl --data-binary``."""
    from urllib.parse import quote

    path = param.get("path")
    if not path:
        raise ValueError(
            "clickhousewriter renders HTTP-interface request bodies to files "
            "in this engine (no native TCP driver in-sandbox): set "
            "parameter.path, or parameter.allowCollapse=true for the "
            "lake-upsert collapse."
        )
    conn = param.get("connection")
    ent = (conn[0] if isinstance(conn, list) else conn) if conn else {}
    table = ent.get("table")
    table = (table[0] if isinstance(table, list) else table) or param.get("table")
    if not table:
        raise ValueError("clickhousewriter needs 'table'")
    database = param.get("database") or ent.get("database", "default")
    endpoint = param.get("endpoint", "http://localhost:8123")
    cols = param.get("column")
    headers = {"Content-Type": "text/plain"}
    if param.get("username"):
        headers["X-ClickHouse-User"] = str(param["username"])
        if param.get("password"):
            headers["X-ClickHouse-Key"] = str(param["password"])

    first_cols: list[str] = list(cols) if cols else []

    def render(t: pa.Table) -> bytes:
        if not first_cols:
            first_cols.extend(t.column_names)
        return clickhouse_tsv(t, columns=cols)

    def request_for(body: bytes, tag: str) -> dict[str, Any]:
        q = (f"INSERT INTO {database}.{table} "
             f"({', '.join(first_cols)}) FORMAT TabSeparated")
        return {
            "_file_name": f"insert-{tag}.tsv",
            "method": "POST",
            "url": f"{endpoint}/?query={quote(q)}",
            "headers": headers,
        }

    res = _chunked_write(ds, path, render, request_for)
    # preSql/postSql as standalone query requests around the inserts
    pre = param.get("preSql") or []
    post = param.get("postSql") or []
    extra_head, extra_tail = [], []
    for which, stmts, bucket in (("pre", pre, extra_head), ("post", post, extra_tail)):
        for i, stmt in enumerate(stmts if isinstance(stmts, list) else [stmts]):
            body = stmt.replace("@table", str(table)).encode("utf-8")
            fp = os.path.join(path, f"{which}-{i:03d}.sql")
            with open(fp, "wb") as f:
                f.write(body)
            bucket.append(json.dumps({
                "method": "POST", "url": f"{endpoint}/", "headers": headers,
                "body_file": fp,
            }, sort_keys=True))
    if extra_head or extra_tail:
        with open(res["manifest"]) as f:
            mid = [ln.rstrip("\n") for ln in f if ln.strip()]
        with open(res["manifest"], "w") as f:
            for ln in extra_head + mid + extra_tail:
                f.write(ln + "\n")
    return res


_WRITETIME = "writetime()"


def _cql_literal(v: Any) -> str:
    """CQL literal rendering for a Python value: single-quoted strings
    with '' doubling, 0x hex blobs, true/false, null, ISO timestamps."""
    import datetime

    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "'" + v.isoformat() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _writetime_micros(v: Any) -> int:
    """USING TIMESTAMP operand: microseconds since epoch (what the
    reference binds for the writetime() pseudo-column)."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return int(v)


def cassandra_cql(batch: pa.Table, *, table: str,
                  columns: list[str] | None = None,
                  batch_size: int = 1) -> bytes:
    """CQL statements for a batch: per row one
    ``INSERT INTO t (cols) VALUES (literals)``, with a configured
    ``writetime()`` pseudo-column rendered as ``USING TIMESTAMP <µs>``
    and excluded from the insert list (cassandra_writer.go:204-236);
    ``batch_size > 1`` groups rows into ``BEGIN UNLOGGED BATCH`` blocks
    (cassandra_writer.go:478-483 uses gocql.UnloggedBatch)."""
    cols = list(columns or batch.column_names)
    wt_idx = [i for i, c in enumerate(cols) if c.lower() == _WRITETIME]
    if len(wt_idx) > 1:
        raise ValueError("only one writetime() column is allowed")
    wt_col = cols.pop(wt_idx[0]) if wt_idx else None
    data = {c: batch.column(c).to_pylist() for c in cols}
    wt = batch.column(wt_col).to_pylist() if wt_idx else None
    collist = ", ".join(cols)

    stmts = []
    for i in range(batch.num_rows):
        vals = ", ".join(_cql_literal(data[c][i]) for c in cols)
        stmt = f"INSERT INTO {table} ({collist}) VALUES ({vals})"
        if wt is not None and wt[i] is not None:
            stmt += f" USING TIMESTAMP {_writetime_micros(wt[i])}"
        stmts.append(stmt + ";")
    if batch_size <= 1:
        return ("\n".join(stmts) + "\n").encode() if stmts else b""
    out = []
    for s in range(0, len(stmts), batch_size):
        group = stmts[s:s + batch_size]
        out.append("BEGIN UNLOGGED BATCH\n" + "\n".join(group)
                   + "\nAPPLY BATCH;")
    return ("\n".join(out) + "\n").encode()


def write_cassandra_cql(ds, param: dict[str, Any]) -> dict[str, Any]:
    """cassandrawriter: renders the reference's prepared-INSERT batches
    (cassandra_writer.go:186-248 builds INSERT INTO ks.t (cols) VALUES
    with optional USING TIMESTAMP; :461-498 flushes UNLOGGED batches)
    as ``cqlsh -f``-replayable .cql chunk files — a ``CONSISTENCY``
    directive heads each file (parseConsistency, :516-540) and the
    request manifest records the cqlsh invocation per chunk. No CQL
    driver ships in this sandbox; live addresses are never dialed."""
    path = param.get("path")
    if not path:
        raise ValueError(
            "cassandrawriter renders cqlsh-replayable CQL batch files in "
            "this engine (no CQL driver in-sandbox): set parameter.path, "
            "or parameter.allowCollapse=true for the lake-upsert collapse."
        )
    keyspace = param.get("keyspace")
    table = param.get("table")
    if not keyspace or not table:
        raise ValueError("cassandrawriter needs 'keyspace' and 'table'")
    fq_table = f"{keyspace}.{table}"
    cols = param.get("column")
    batch_size = int(param.get("batchSize") or 1)
    # the reference's config key is the typo 'consistancyLevel'
    # (cassandra_writer.go KeyConsistencyLevel); accept both spellings
    consistency = str(param.get("consistancyLevel")
                      or param.get("consistencyLevel")
                      or "LOCAL_QUORUM").upper()
    header = f"CONSISTENCY {consistency};\n".encode()

    def render(t: pa.Table) -> bytes:
        return header + cassandra_cql(
            t, table=fq_table, columns=cols, batch_size=batch_size)

    def request_for(body: bytes, tag: str) -> dict[str, Any]:
        return {
            "_file_name": f"batch-{tag}.cql",
            "tool": "cqlsh",
            "args": ["-k", keyspace, "-f", f"batch-{tag}.cql"],
        }

    return _chunked_write(ds, path, render, request_for)


def write_neo4j_tx(ds, param: dict[str, Any]) -> dict[str, Any]:
    """neo4jwriter: renders HTTP transaction-API bodies (user cypher +
    UNWIND-able $batch parameter) to ``parameter.path`` — POSTable to
    ``/db/{database}/tx/commit`` with sinks.http_replay, whose retry loop
    mirrors executeWithRetry (neo4j_writer.go:553-588 retryTimes x
    retrySleepMills)."""
    path = param.get("path")
    if not path:
        raise ValueError(
            "neo4jwriter renders transaction-API request bodies to files in "
            "this engine (no bolt driver in-sandbox): set parameter.path, or "
            "parameter.allowCollapse=true for the lake-upsert collapse."
        )
    cypher = param.get("cypher")
    if not cypher:
        raise ValueError("cypher is required (neo4j_writer.go:104)")
    props = param.get("properties")
    if isinstance(props, str):  # the reference takes properties as JSON text
        props = json.loads(props)
    if not props:
        raise ValueError("properties configuration is required (neo4j_writer.go:116)")
    var_name = param.get("batchDataVariableName", "batch")
    endpoint = param.get("endpoint", "http://localhost:7474")
    database = param.get("database", "neo4j")
    headers = {"Content-Type": "application/json", "Accept": "application/json"}
    if param.get("username"):
        headers["Authorization"] = "Basic " + base64.b64encode(
            f"{param['username']}:{param.get('password', '')}".encode()
        ).decode()

    def request_for(body: bytes, tag: str) -> dict[str, Any]:
        return {
            "_file_name": f"tx-{tag}.json",
            "method": "POST",
            "url": f"{endpoint}/db/{database}/tx/commit",
            "headers": headers,
        }

    return _chunked_write(
        ds, path,
        lambda t: neo4j_tx_body(t, cypher=cypher, var_name=var_name,
                                properties=props, columns=param.get("column")),
        request_for,
    )


def write_stream_load(ds, param: dict[str, Any]) -> dict[str, Any]:
    """doriswriter / starrockswriter: renders Stream Load chunks +
    labelled PUT requests to ``parameter.path`` (replay with
    ``curl -XPUT -T chunkfile -H @headers url``)."""
    path = param.get("path")
    if not path:
        raise ValueError(
            "doriswriter/starrockswriter render Stream Load chunks to files "
            "in this engine (no live HTTP in-sandbox): set parameter.path, "
            "or parameter.allowCollapse=true for the lake-upsert collapse."
        )
    conn = param.get("connection")
    ent = (conn[0] if isinstance(conn, list) else conn) if conn else {}
    table = ent.get("table")
    table = (table[0] if isinstance(table, list) else table) or param.get("table")
    if not table:
        raise ValueError("stream-load writer needs 'table'")
    database = ent.get("selectedDatabase") or param.get("database", "default")
    host = ent.get("loadUrl") or param.get("loadUrl", "127.0.0.1:8030")
    if isinstance(host, list):
        host = host[0]
    load_props = param.get("loadProps", {}) or {}
    fmt = str(load_props.get("format", "csv")).lower()
    cols = param.get("column")
    sep = load_props.get("column_separator", "\t")

    def render(t: pa.Table) -> bytes:
        if fmt == "json":
            return stream_load_json(t, columns=cols)
        return stream_load_csv(t, columns=cols, column_separator=sep)

    def request_for(body: bytes, tag: str) -> dict[str, Any]:
        req = stream_load_request(
            body, host=host, database=database, table=table,
            username=param.get("username", "root"),
            password=param.get("password", ""),
            label_prefix=param.get("labelPrefix", "datax_"),
            fmt=fmt, load_props=load_props,
        )
        ext = "json" if fmt == "json" else "csv"
        req["_file_name"] = f"load-{tag}.{ext}"
        return req

    return _chunked_write(ds, path, render, request_for)
