"""Schemas and Avro-style additive schema evolution.

The reference's data model is a positional 7-type Column system
(/root/reference/common/element/column.go:11-19: Null, Long, Double,
String, Date, Bool, Bytes). We map it onto named Arrow schemas
(SURVEY.md §1.4) and add the CDC envelope required by BASELINE.json.

Schema evolution rule (north_rule "Avro-style additive"):
  - new nullable columns may appear on either side -> null-filled;
  - column removal is tolerated reading old data (old col null-filled);
  - type CHANGES are rejected (raise SchemaEvolutionError).
This mirrors (and strengthens) the reference's only evolution mechanism,
wildcard `*` expansion against the target schema
(/root/reference/common/database/rdbms/writer/pretreatment.go:129-186).
"""

from __future__ import annotations

import pyarrow as pa

# The 7 reference column types -> canonical Arrow types
# (/root/reference/common/element/column.go:11-19).
REF_TYPE_MAP: dict[str, pa.DataType] = {
    "long": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
    "date": pa.timestamp("us"),
    "bool": pa.bool_(),
    "bytes": pa.binary(),
}

# Base lake table shape mandated by BASELINE.json input_hint.
WEBTEXT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# CDC envelope columns prepended to the payload (FIXTURES.md §2). `op` is the
# elasticsearchwriter actionType model {index,create,delete,update} collapsed
# to {I,U,D} (/root/reference/plugins/writer/elasticsearchwriter/
# elasticsearch_writer.go:33-41).
CDC_EVENT_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("src_offset", pa.int64()),
        pa.field("op", pa.string()),
    ]
    + list(WEBTEXT_SCHEMA)
)

# Schema-evolution variant: additive nullable column (FIXTURES.md §2).
CDC_EVENT_SCHEMA_V2 = CDC_EVENT_SCHEMA.append(pa.field("fetch_status", pa.int64()))


class SchemaEvolutionError(TypeError):
    """Raised when two schemas differ by more than additive nullable columns."""


def evolve(table_schema: pa.Schema, batch_schema: pa.Schema) -> pa.Schema:
    """Resolve a committed table schema against an incoming batch schema.

    Additive union: the result contains every field of both, in
    table-schema order first, then new batch fields in batch order.
    A field present in both must have an identical type.
    """
    out: list[pa.Field] = []
    batch_by_name = {f.name: f for f in batch_schema}
    for f in table_schema:
        other = batch_by_name.get(f.name)
        if other is not None and other.type != f.type:
            raise SchemaEvolutionError(
                f"column {f.name!r}: type change {f.type} -> {other.type} is not additive"
            )
        out.append(pa.field(f.name, f.type, nullable=True))
    table_names = set(table_schema.names)
    for f in batch_schema:
        if f.name not in table_names:
            out.append(pa.field(f.name, f.type, nullable=True))
    return pa.schema(out)


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project/null-fill ``table`` to exactly ``schema`` (order included).

    New columns absent from ``table`` are filled with nulls; present
    columns must already have the target type (checked by ``evolve``).
    """
    n = table.num_rows
    cols = []
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)
