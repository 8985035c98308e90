"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship document-derived CDC replay through the
full exactly-once lake path at sf0.001. ``queries()`` exposes one
callable per implemented operator family (SURVEY.md §2 + training-data
ops); ``oracle_sql()`` gives the DuckDB equivalent where the operator is
SQL-expressible (the CDC ones included — the md5-derived event rules are
deliberately reproducible in SQL via md5_number_lower).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in go_datax_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_PARTS = 16  # partition count used by oracle-checked partition queries


def pd_ts(s: str):
    import pandas as pd

    return pd.Timestamp(s)
ANN_K = 5
ANN_NUM_QUERIES = 8




def _pool():
    from go_datax_ray.stages.partition import actor_pool

    return actor_pool()



def _rp(sf_dir: str, table: str, **kw):
    """read_parquet with the block count floored to the CPU count
    (partition.read_blocks): the sf test tables are single parquet
    files, which Ray reads as ONE block — serialising every pre-shuffle
    map stage. At real scale the natural block count already exceeds
    the floor, so the override never caps."""
    from go_datax_ray.stages.partition import read_blocks

    kw.setdefault("override_num_blocks", read_blocks())
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", **kw)

def _rd():
    import ray.data as rd

    return rd


# ---------------------------------------------------------------------------
# helpers

def _events_as_cdc(sf_dir: str):
    """events table viewed as a CDC log: key=user_id, lsn=event_id,
    op = D when event_type='error' else upsert."""
    rd = _rd()
    ds = _rp(sf_dir, "events")

    def to_cdc(t: pa.Table) -> pa.Table:
        return (
            t.append_column("url", pc.cast(t.column("user_id"), pa.string()))
            .append_column("lsn", t.column("event_id"))
            .append_column("warc_ts", t.column("ts"))
            .append_column(
                "op",
                pc.if_else(
                    pc.equal(t.column("event_type"), pa.scalar("error")),
                    pa.scalar("D"),
                    pa.scalar("U"),
                ),
            )
        )

    return ds.map_batches(to_cdc, batch_format="pyarrow", zero_copy_batch=True)


def _cdc_out(t: pa.Table) -> pa.Table:
    return t.select(["user_id", "lsn", "ts", "event_type", "value"])


def _lww_events(sf_dir: str, *, drop_tombstones: bool):
    from go_datax_ray.stages.lww import dedup_events
    from go_datax_ray.stages.partition import partition_events

    ds = _events_as_cdc(sf_dir)
    ds = partition_events(ds, num_partitions=NUM_PARTS)
    ds = dedup_events(ds)
    if drop_tombstones:
        ds = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("op"), pa.scalar("D"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds.map_batches(_cdc_out, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# contract

def entry() -> Any:
    """Flagship: document-derived CDC replay -> exactly-once Parquet lake
    at sf0.001; returns the final-state Dataset."""
    from go_datax_ray.pipelines.flagship import run_flagship

    ds, _res = run_flagship("/root/testdata/sf0.001", "/tmp/gdr_entry_lake")
    return ds


def queries() -> dict[str, Callable[[str], Any]]:
    from go_datax_ray.stages.transforms import (
        apply_transformers,
        dx_digest,
        dx_filter,
        dx_pad,
        dx_replace,
        dx_substr,
    )

    rd_lazy = _rd  # defer ray.data import to call time

    # -- CDC core ----------------------------------------------------------
    def q_cdc_final_state(sf_dir: str):
        return _lww_events(sf_dir, drop_tombstones=True)

    def q_lww_latest_event(sf_dir: str):
        return _lww_events(sf_dir, drop_tombstones=False)

    def q_cdc_lake_replay(sf_dir: str):
        """Same final state as q_cdc_final_state but through the FULL lake
        path: partition -> LWW -> merge-apply -> manifest commit -> read
        back. Oracle identical to q_cdc_final_state."""
        import shutil

        from go_datax_ray.pipelines.cdc_replay import (
            DatasetEventSource,
            ReplayConfig,
            replay,
        )
        from go_datax_ray.sinks.lake import read_lake

        lake = "/tmp/gdr_q_lake"
        shutil.rmtree(lake, ignore_errors=True)
        ev = _events_as_cdc(sf_dir)
        n = ev.count()
        replay(
            DatasetEventSource(ev, 0, n),
            ReplayConfig(lake_dir=lake, num_partitions=8, epoch_size=max(n // 3, 1)),
        )
        return read_lake(lake).map_batches(_cdc_out, batch_format="pyarrow")

    def q_lake_point_lookup(sf_dir: str):
        """Data-skipping point lookup: replay the CDC log into a lake,
        then read ONLY the hash partitions five keys map to (the
        manifest records key column + hash_fn, so the reader prunes to
        k of P files instead of scanning the lake). Oracle = LWW final
        state filtered to the same keys."""
        import shutil

        from go_datax_ray.pipelines.cdc_replay import (
            DatasetEventSource,
            ReplayConfig,
            replay,
        )
        from go_datax_ray.sinks.lake import read_lake

        lake = "/tmp/gdr_q_lake_pt"
        shutil.rmtree(lake, ignore_errors=True)
        ev = _events_as_cdc(sf_dir)
        n = ev.count()
        replay(
            DatasetEventSource(ev, 0, n),
            ReplayConfig(lake_dir=lake, num_partitions=8, epoch_size=max(n // 2, 1)),
        )
        keys = [str(k) for k in (1, 7, 23, 42, 99)]
        return read_lake(lake, keys=keys).map_batches(_cdc_out, batch_format="pyarrow")

    def q_ntile(sf_dir: str):
        """Exact NTILE(4) over (value, event_id) with NO global sort:
        domain-bounded value histogram broadcast once per worker +
        value-bit cohash shuffle for within-tie id ranks."""
        from go_datax_ray.stages.analytic import global_ntile

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "value"])
        return global_ntile(ev, value_col="value", id_col="event_id", k=4)

    def q_regex_extract(sf_dir: str):
        """dx_extract through the transformer chain: RE2 capture-group
        extraction, byte parity with DuckDB regexp_extract (non-match ->
        '', null stays null)."""
        from go_datax_ray.stages.transforms import apply_transformers

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        out = apply_transformers(docs, [
            {"name": "dx_extract",
             "parameter": {"column": "text",
                           "paras": [r"^(\w+)\s+(\w+)", "2", "second_word"]}},
        ])
        return out.select_columns(["doc_id", "second_word"])

    def q_session_ids(sf_dir: str):
        """Event-level sessionization: per-user 1-based session index
        (30-min inactivity gap), the gaps-and-islands label — oracle is
        the ANSI SUM(CASE WHEN gap) OVER (...) form."""
        from go_datax_ray.stages.windows import assign_session_ids

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
        return assign_session_ids(ev, gap_s=1800)

    def q_url_canonicalize(sf_dir: str):
        """URL canonicalization (the webtext dedup pre-pass): lowercase
        scheme/host, strip default ports + fragments + tracking params,
        sort surviving query params. Engine rules are pure RE2 + binary
        collation, replayed exactly by the DuckDB oracle."""
        from go_datax_ray.stages.curation import canonicalize_urls_ds

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "lang"])

        def build_url(t):
            import numpy as np

            ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            n = t.num_rows
            src_up = pc.utf8_upper(t.column("source").cast(pa.string()))
            scheme = pc.if_else(pa.array(ids % 2 == 0),
                                pa.scalar("HTTPS"), pa.scalar("http"))
            port = pc.if_else(
                pa.array(ids % 4 == 0), pa.scalar(":443"),
                pc.if_else(pa.array(ids % 4 == 1), pa.scalar(":8443"),
                           pa.scalar("")),
            )
            q = pc.if_else(
                pa.array(ids % 3 == 0),
                pc.binary_join_element_wise(
                    pa.array(["?utm_source=mail&z="] * n),
                    pa.array((ids % 7).astype(str)),
                    pa.array(["&lang="] * n),
                    t.column("lang").cast(pa.string()), "",
                ),
                pa.scalar(""),
            )
            frag = pc.if_else(pa.array(ids % 5 == 0), pa.scalar("#Top"),
                              pa.scalar(""))
            url = pc.binary_join_element_wise(
                scheme, pa.array(["://"] * n), src_up,
                pa.array([".Example.COM"] * n), port,
                pc.if_else(pa.array(ids % 7 == 0), pa.scalar(""),
                           pc.binary_join_element_wise(
                               pa.array(["/Docs/"] * n),
                               t.column("doc_id").cast(pa.string()), "")),
                q, frag, "",
            )
            return pa.table({"doc_id": t.column("doc_id"), "url": url})

        built = docs.map_batches(build_url, batch_format="pyarrow")
        return canonicalize_urls_ds(built).select_columns(
            ["doc_id", "url", "canon_url"]
        )

    def q_url_dedup(sf_dir: str):
        """URL-keyed exact dedup: canonicalize_urls -> payload-free
        exact_dedup keyed on the canonical form (keep min doc_id per
        canonical url) — the first dedup pass of every web-corpus
        pipeline, as a pure composition of two existing stages."""
        from go_datax_ray.stages.dedup import exact_dedup

        deduped = exact_dedup(
            q_url_canonicalize(sf_dir), text_col="canon_url", key_col="doc_id"
        )
        return deduped.select_columns(["doc_id", "canon_url"])

    def q_global_quantiles(sf_dir: str):
        """Exact global QUANTILE_DISC over documents.n_chars via the
        distinct-value histogram (no global sort; shuffle is one row per
        distinct value)."""
        from go_datax_ray.stages.sampling import exact_quantiles_disc

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["n_chars"])
        return exact_quantiles_disc(docs, col="n_chars",
                                    qs=(0.25, 0.5, 0.75, 0.9))

    def q_length_filter(sf_dir: str):
        """Percentile-gated corpus filter (the FineWeb-style curation
        step): keep documents whose n_chars clears the corpus p25,
        computed exactly in-cluster and broadcast as ONE integer."""
        from go_datax_ray.stages.sampling import exact_quantiles_disc

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
        thr_tbl = exact_quantiles_disc(
            docs.select_columns(["n_chars"]), col="n_chars", qs=(0.25,)
        ).take_all()
        thr = pa.scalar(thr_tbl[0]["value"], pa.int64())
        return docs.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n_chars"), thr)),
            batch_format="pyarrow",
        )

    def q_mongo_query(sf_dir: str):
        """mongoreader over a JSONL collection dump with the reference's
        `query` filter grammar ({$in, $gte} here) evaluated as Arrow
        kernels (sources/mongo.py; mongo_reader.go:42-121). The dump is
        a deterministic re-serialisation of the documents table; the
        oracle expresses the same predicate in SQL."""
        import json as _json
        import os

        from go_datax_ray.registry import SOURCES

        rd = rd_lazy()
        coll = "/tmp/gdr_mongo_coll"
        marker = os.path.join(coll, f"_src_{os.path.basename(sf_dir)}")
        if not os.path.exists(marker):
            import shutil

            import pyarrow.parquet as pq

            shutil.rmtree(coll, ignore_errors=True)
            os.makedirs(coll)
            t = pq.read_table(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang", "source", "n_chars"])
            with open(os.path.join(coll, "documents_00000.jsonl"), "w") as f:
                for r in t.to_pylist():
                    f.write(_json.dumps(r) + "\n")
            open(marker, "w").close()
        ds = SOURCES["mongoreader"](
            {
                "path": f"{coll}/*.jsonl",
                "column": [
                    {"name": "doc_id", "type": "long"},
                    {"name": "lang", "type": "string"},
                    {"name": "source", "type": "string"},
                    {"name": "n_chars", "type": "long"},
                ],
                "query": _json.dumps(
                    {"lang": {"$in": ["en", "fr"]}, "n_chars": {"$gte": 200}}
                ),
            }
        )
        return ds

    def q_unpivot_lineitem(sf_dir: str):
        """UNPIVOT (melt) of lineitem's four measures into (metric,
        value) long form — pure per-batch Arrow column copies, zero
        shuffle (stages/analytic.unpivot)."""
        from go_datax_ray.stages.analytic import unpivot

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_linenumber", "l_quantity",
                          "l_extendedprice", "l_discount", "l_tax"])
        return unpivot(
            li, id_cols=["l_orderkey", "l_linenumber"],
            value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        )

    def q_url_parse(sf_dir: str):
        """dx_url through the transformer chain: scheme/host/port/path/
        query-param extraction with RE2 patterns shared verbatim with
        the DuckDB oracle (regexp_extract). The url column is built
        deterministically from documents (the test tables carry no raw
        urls; the flagship's synthetic urls never reach the driver
        contract)."""
        from go_datax_ray.stages.transforms import apply_transformers

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "source", "lang"])

        def build_url(t):
            import numpy as np

            ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            did = t.column("doc_id").cast(pa.string())
            port = pc.if_else(
                pa.array(ids % 13 == 0),
                pa.scalar(":8080"), pa.scalar(""),
            )
            path = pc.if_else(
                pa.array(ids % 7 == 0),
                pa.scalar(""),
                pc.binary_join_element_wise(pa.array(["/docs/"] * t.num_rows), did, ""),
            )
            q = pc.if_else(
                pa.array(ids % 3 == 0),
                pc.binary_join_element_wise(
                    pa.array(["?lang="] * t.num_rows),
                    t.column("lang").cast(pa.string()),
                    pa.array(["&v="] * t.num_rows),
                    pa.array((ids % 5).astype(str)),
                    "",
                ),
                pa.scalar(""),
            )
            url = pc.binary_join_element_wise(
                pa.array(["https://"] * t.num_rows),
                t.column("source").cast(pa.string()),
                pa.array([".example.com"] * t.num_rows),
                port, path, q, "",
            )
            return pa.table({"doc_id": t.column("doc_id"), "url": url})

        built = docs.map_batches(build_url, batch_format="pyarrow")
        out = apply_transformers(built, [
            {"name": "dx_url", "parameter": {"column": "url", "paras": ["host"]}},
            {"name": "dx_url", "parameter": {"column": "url", "paras": ["port"]}},
            {"name": "dx_url", "parameter": {"column": "url", "paras": ["path"]}},
            {"name": "dx_url",
             "parameter": {"column": "url", "paras": ["param:lang", "lang_param"]}},
        ])
        return out.select_columns(
            ["doc_id", "url", "url_host", "url_port", "url_path", "lang_param"]
        )

    def q_windowed_topk(sf_dir: str):
        """Top-3 event types per tumbling hour: composition of the
        tumbling tagger, one map-side-combining counts groupby, and the
        segment-vectorised per-group top-k (windows are the groups)."""
        from ray.data.aggregate import Count

        from go_datax_ray.stages.partition import bounded_groupby
        from go_datax_ray.stages.sampling import top_k_per_group
        from go_datax_ray.stages.windows import add_tumbling_window

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["ts", "event_type"])
        tagged = ev.map_batches(
            add_tumbling_window, fn_kwargs=dict(ts_col="ts", size_s=3600),
            batch_format="pyarrow",
        ).drop_columns(["ts"])
        counts = bounded_groupby(
            tagged, ["window_start", "event_type"]
        ).aggregate(Count(alias_name="n"))

        def conform(t):
            import pyarrow as _pa
            i = t.column_names.index("n")
            t = t.set_column(i, "n", t.column("n").cast(_pa.int64()))
            j = t.column_names.index("window_start")
            return t.set_column(
                j, "window_start",
                t.column("window_start").cast(_pa.timestamp("us")),
            )

        counts = counts.map_batches(conform, batch_format="pyarrow")
        return top_k_per_group(
            counts, group="window_start", order="n", k=3,
            tiebreak="event_type",
        )

    def q_tpch_q1_composed(sf_dir: str):
        """TPC-H Q1-shaped pricing summary from engine operators: filter
        -> per-row exact-cents derivation (disc_price/charge with the
        SQL oracle's exact float association order) -> ONE map-side
        combining groupby -> key sort. The classic wide-aggregate scan."""
        from ray.data.aggregate import Count, Sum

        from go_datax_ray.stages.partition import bounded_groupby

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem",
                 columns=["l_returnflag", "l_linestatus", "l_quantity",
                          "l_extendedprice", "l_discount", "l_tax",
                          "l_shipdate"])
        cutoff = pa.scalar(pd_ts("1998-09-02"))

        def cents(col):
            # RoundOptions built per call: the options object is not
            # picklable, so it must not live in the task closure
            return pc.cast(
                pc.round(pc.multiply(col, pa.scalar(100.0)),
                         options=pc.RoundOptions(round_mode="half_towards_infinity")),
                pa.int64(),
            )

        def prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
            disc_price = pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
            charge = pc.multiply(
                disc_price, pc.add(pa.scalar(1.0), t.column("l_tax"))
            )
            return pa.table({
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_cents": cents(t.column("l_quantity")),
                "base_cents": cents(t.column("l_extendedprice")),
                "disc_price_cents": cents(disc_price),
                "charge_cents": cents(charge),
            })

        agg = bounded_groupby(
            li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
            ["l_returnflag", "l_linestatus"],
        ).aggregate(
            Sum("qty_cents", alias_name="sum_qty_cents"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("charge_cents", alias_name="sum_charge_cents"),
            Count(alias_name="n"),
        )

        def conform(t: pa.Table) -> pa.Table:
            for name in ("sum_qty_cents", "sum_base_cents",
                         "sum_disc_price_cents", "sum_charge_cents", "n"):
                i = t.column_names.index(name)
                t = t.set_column(i, name, t.column(name).cast(pa.int64()))
            return t

        return agg.map_batches(conform, batch_format="pyarrow").sort(
            ["l_returnflag", "l_linestatus"]
        )

    def q_group_sample(sf_dir: str):
        """Deterministic k-per-group sample: membership is a pure
        function of md5(key), so resumed jobs and sibling tables pick
        consistent rows; one segment-vectorised top-k pass."""
        from go_datax_ray.stages.sampling import group_sample

        rd = rd_lazy()
        ds = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_totalprice"])
        return group_sample(ds, group="o_custkey", key="o_orderkey", k=2)

    def q_grouped_outliers(sf_dir: str):
        """Per-user 2-sigma outlier flags decided from exact integer
        moments ((n*x-s)^2 > 4*(n*q-s^2), evaluated float64 in the same
        expression order as the SQL) — group stats broadcast as
        object-store refs, flag vectorised per batch."""
        from go_datax_ray.stages.analytic import grouped_outliers

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "value"])
        return grouped_outliers(ev)

    def q_lake_view(sf_dir: str):
        """Incrementally-maintained aggregate view (sinks/views.py):
        replay the CDC log into a lake over several epochs with a
        per-event_type (count, exact-cents sum) view updated INSIDE each
        partition merge from the in-memory old/new states; the returned
        table is read from the epoch delta files, never recomputed from
        the lake."""
        import shutil

        import pyarrow as _pa
        import pyarrow.compute as _pc

        from go_datax_ray.pipelines.cdc_replay import (
            DatasetEventSource,
            ReplayConfig,
            replay,
        )
        from go_datax_ray.sinks.views import ViewSpec, read_view

        rd = rd_lazy()

        def derive(t):
            cents = _pc.cast(
                _pc.round(_pc.multiply(t.column("value"), _pa.scalar(100.0)),
                          options=_pc.RoundOptions(round_mode="half_towards_infinity")),
                _pa.int64(),
            )
            return t.append_column("value_cents", cents)

        spec = ViewSpec(name="type_stats", group_cols=("event_type",),
                        sum_cols=("value_cents",), derive=derive)
        lake = "/tmp/gdr_q_view_lake"
        shutil.rmtree(lake, ignore_errors=True)
        ev = _events_as_cdc(sf_dir)
        n = ev.count()
        replay(
            DatasetEventSource(ev, 0, n),
            ReplayConfig(lake_dir=lake, num_partitions=8,
                         epoch_size=max(n // 3, 1), views=(spec,)),
        )
        return rd.from_arrow(read_view(lake, spec))

    def q_flagship_final_state(sf_dir: str):
        from go_datax_ray.pipelines.flagship import run_flagship

        ds, _ = run_flagship(sf_dir, "/tmp/gdr_flagship_lake")
        return ds.map_batches(
            lambda t: t.select(["url", "lsn", "text", "lang"]),
            batch_format="pyarrow",
        )

    def q_partition_histogram(sf_dir: str):
        from go_datax_ray.stages.partition import partition_events

        rd = rd_lazy()
        ds = _rp(sf_dir, "events")
        ds = ds.map_batches(
            lambda t: t.append_column("key", pc.cast(t.column("user_id"), pa.string())),
            batch_format="pyarrow",
        )
        # md5 partitioner here: DuckDB md5_number_lower-checkable (the
        # pipeline default is the faster reference-exact crc32)
        ds = partition_events(ds, key="key", num_partitions=NUM_PARTS, hash_fn="md5")
        return ds.groupby("part_id").count().rename_columns({"count()": "n"})

    # -- dx_* transforms ---------------------------------------------------
    def q_dx_filter(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "lineitem",
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
        )
        return ds.map_batches(
            lambda t: dx_filter(t, "l_quantity", ">", "30"), batch_format="pyarrow"
        )

    def q_dx_substr(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])
        return ds.map_batches(lambda t: dx_substr(t, "c_name", 0, 10), batch_format="pyarrow")

    def q_dx_replace(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "part", columns=["p_partkey", "p_type"])
        return ds.map_batches(
            lambda t: dx_replace(t, "p_type", "[aeiou]", "_"), batch_format="pyarrow"
        )

    def q_dx_pad(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
        )
        return ds.map_batches(
            lambda t: dx_pad(t, "o_orderpriority", "left", 12, "*"), batch_format="pyarrow"
        )

    def q_dx_digest(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(lambda t: dx_digest(t, "text", "md5"), batch_format="pyarrow")

    def q_transformer_chain(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "documents")
        chain = [
            {"name": "dx_substr", "parameter": {"column": "text", "paras": ["0", "20"]}},
            {"name": "dx_replace", "parameter": {"column": "text", "paras": ["[aeiou]", "_"]}},
            {"name": "dx_pad", "parameter": {"column": "source", "paras": ["left", "8", "0"]}},
            {"name": "dx_digest", "parameter": {"column": "lang", "paras": ["md5"]}},
            {"name": "dx_filter", "parameter": {"column": "n_chars", "paras": ["<", "100"]}},
        ]
        return apply_transformers(ds, chain)

    # -- dedup -------------------------------------------------------------
    def q_exact_dedup(sf_dir: str):
        from go_datax_ray.stages.dedup import exact_dedup

        rd = rd_lazy()
        return exact_dedup(_rp(sf_dir, "documents"))

    def q_minhash_dedup(sf_dir: str):
        """Full in-cluster near-dup pipeline: LSH candidates -> distributed
        exact-Jaccard verify (text never reaches the driver) ->
        union-find -> keep each cluster's min-id representative. Returns
        the SURVIVOR ID SET, which is SQL-derivable (VERDICT r4 #9): the
        verify step uses exact word-3-gram Jaccard, so the survivors
        equal an all-pairs shingle-Jaccard >= 0.7 closure — expressible
        in DuckDB at oracle scale (O(N^2) only on shingle-sharing
        pairs). The LSH banding's only divergence risk is a missed true
        pair NEAR the threshold; this corpus's closest pair below
        threshold sits at J=0.067 and the weakest true pair at J=0.9
        (miss probability ~4e-8 with 16 bands x 4 rows), so the match
        is structural, not luck."""
        from go_datax_ray.stages.dedup import minhash_dedup_corpus

        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        deduped, _stats = minhash_dedup_corpus(ds, threshold=0.7)
        return deduped.select_columns(["doc_id"])

    def q_simhash(sf_dir: str):
        from go_datax_ray.stages.dedup import simhash_batch

        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(simhash_batch, batch_format="pyarrow").select_columns(
            ["doc_id", "simhash"]
        )

    def q_embedding_neardup(sf_dir: str):
        """Recall-complete near-dup check (SQL-oracle-checkable): the
        corpus is doubled with EXACT copies (vec_id + n), so every copy
        pair is a true near-dup that hyperplane LSH finds with
        STRUCTURAL recall 1.0 (identical vectors share every bucket),
        and the in-bucket verify is exact cosine (no false positives) —
        output == the brute-force cosine>=0.95 pair set, which DuckDB
        computes as a cross join."""
        from go_datax_ray.stages.dedup import embedding_neardup_pairs

        import pyarrow.parquet as pq

        md = pq.read_metadata(f"{sf_dir}/embeddings.parquet")
        n = md.num_rows
        dim = len(
            pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
            .column("embedding")[0]
        )

        def proj(t: pa.Table) -> pa.Table:
            return pa.table(
                {"vec_id": t.column("vec_id").cast(pa.int64()),
                 "embedding": t.column("embedding")}
            )

        def shifted(t: pa.Table) -> pa.Table:
            return pa.table(
                {"vec_id": pc.add(t.column("vec_id").cast(pa.int64()), pa.scalar(n)),
                 "embedding": t.column("embedding")}
            )

        base = _rp(sf_dir, "embeddings").map_batches(proj, batch_format="pyarrow")
        dup = _rp(sf_dir, "embeddings").map_batches(shifted, batch_format="pyarrow")
        pairs = embedding_neardup_pairs(base.union(dup), dim=dim, threshold=0.95)
        return pairs.map_batches(
            lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
        )

    def q_ngram_jaccard(sf_dir: str):
        """Pairwise word-3-gram Jaccard — the dedup verifier as a
        first-class op: each doc is paired with its successor
        (doc_id+1) via a bucketed self-join, and the pair emits EXACT
        INTEGER shingle-set cardinalities (n_a, n_b, n_inter; jaccard =
        inter/(n_a+n_b-inter)) so the driver hash is float-free. The
        shingle sets are unique word 3-grams (docs with <3 words
        collapse to one whole-text shingle; empty docs to none) —
        replicated in SQL with DuckDB list lambdas."""
        from go_datax_ray.stages.dedup import _shingle_hashes
        from go_datax_ray.stages.joins import bucket_hash_join

        def proj(side: str, shift: int):
            def fn(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").cast(pa.int64())
                return pa.table(
                    {
                        "k": pc.add(ids, pa.scalar(shift)),
                        f"id_{side}": ids,
                        f"_t{side}": t.column("text").cast(pa.large_string()),
                    }
                )

            return fn

        left = _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            proj("a", 0), batch_format="pyarrow"
        )
        right = _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            proj("b", -1), batch_format="pyarrow"
        )
        l_schema = pa.schema(
            [("k", pa.int64()), ("id_a", pa.int64()), ("_ta", pa.large_string())]
        )
        r_schema = pa.schema(
            [("k", pa.int64()), ("id_b", pa.int64()), ("_tb", pa.large_string())]
        )
        j = bucket_hash_join(left, right, on="k", schemas=(l_schema, r_schema))

        def counts(t: pa.Table) -> pa.Table:
            ia = t.column("id_a").to_pylist()
            ib = t.column("id_b").to_pylist()
            ta = t.column("_ta").to_pylist()
            tb = t.column("_tb").to_pylist()
            na, nb, ni = [], [], []
            for x, y in zip(ta, tb):
                a = _shingle_hashes(x or "", 3)
                b = _shingle_hashes(y or "", 3)
                na.append(len(a))
                nb.append(len(b))
                ni.append(int(np.intersect1d(a, b, assume_unique=True).size))
            return pa.table(
                {
                    "id_a": pa.array(ia, pa.int64()),
                    "id_b": pa.array(ib, pa.int64()),
                    "n_a": pa.array(na, pa.int64()),
                    "n_b": pa.array(nb, pa.int64()),
                    "n_inter": pa.array(ni, pa.int64()),
                }
            )

        return j.map_batches(counts, batch_format="pyarrow")

    # -- text analysis -----------------------------------------------------
    def q_token_stats(sf_dir: str):
        from go_datax_ray.stages.text import token_stats

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(token_stats, batch_format="pyarrow",
                              zero_copy_batch=True).map_batches(
            lambda t: t.select(["doc_id", "n_chars", "n_tokens_ws"]), batch_format="pyarrow"
        )

    def q_char_classes(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

        def counts(t: pa.Table) -> pa.Table:
            import re

            punct = re.compile(r"[^\w\s]")
            alpha = re.compile(r"[a-zA-Z]")
            texts = t.column("text").to_pylist()
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "punct_chars": pa.array(
                        [len(punct.findall(x or "")) for x in texts], pa.int64()
                    ),
                    "alpha_chars": pa.array(
                        [len(alpha.findall(x or "")) for x in texts], pa.int64()
                    ),
                }
            )

        return ds.map_batches(counts, batch_format="pyarrow")

    def q_quality_score(sf_dir: str):
        """Oracle-checked columns are the four exactly-SQL-expressible
        ratios (int-count divisions are IEEE-bit-exact across engines);
        the exp()-based composite `quality` is excluded from the driver
        hash (libm last-ulp risk) and pinned by a pytest golden instead."""
        # TASK-pool plain function (not an actor pool): the stage's only
        # state is lru-cached compiled regexes — see text.quality_score
        from go_datax_ray.stages.text import quality_score

        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(quality_score, batch_format="pyarrow",
                              zero_copy_batch=True).map_batches(
            lambda t: t.select(
                ["doc_id", "punct_ratio", "stopword_ratio", "mean_word_len", "alpha_ratio"]
            ),
            batch_format="pyarrow",
        )

    def q_lang_id(sf_dir: str):
        from go_datax_ray.stages.text import lang_id

        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(lang_id, batch_format="pyarrow",
                              zero_copy_batch=True).map_batches(
            lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
        )

    def q_lang_balanced_sample(sf_dir: str):
        """Language-balanced corpus sampling (the training-data mix
        step): lang-ID every doc, then take a DETERMINISTIC per-language
        sample of 5 docs — smallest md5(doc_id) first, so the sample is
        stable across runs, partitionings and engines. One lexsort per
        co-hash block picks every language's head at once."""
        import hashlib

        from go_datax_ray.stages.dedup import _segments
        from go_datax_ray.stages.partition import cohash_map_groups
        from go_datax_ray.stages.text import lang_id

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        ds = ds.map_batches(lang_id, batch_format="pyarrow",
                            zero_copy_batch=True).map_batches(
            lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
        )

        def add_h(t: pa.Table) -> pa.Table:
            h = [hashlib.md5(str(i).encode()).hexdigest()
                 for i in t.column("doc_id").to_pylist()]
            return t.append_column("_h", pa.array(h, pa.string()))

        ds = ds.map_batches(add_h, batch_format="pyarrow")

        def head_k(g: pa.Table) -> pa.Table:
            import numpy as np

            from go_datax_ray.stages.dedup import _col_np

            if g.num_rows == 0 or "lang_pred" not in g.column_names:
                return pa.table({"lang_pred": pa.array([], pa.string()),
                                 "doc_id": pa.array([], pa.int64())})
            order, bounds = _segments(g, ["lang_pred"], extra=_col_np(g, "_h"))
            keep = np.zeros(len(order), dtype=bool)
            for si in range(len(bounds) - 1):
                s = int(bounds[si])
                keep[s:min(s + 5, int(bounds[si + 1]))] = True
            return g.take(pa.array(order[keep])).select(["lang_pred", "doc_id"])

        return cohash_map_groups(ds, ["lang_pred"], head_k)

    def q_fingerprint(sf_dir: str):
        from go_datax_ray.stages.text import fingerprint_md5

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(fingerprint_md5, batch_format="pyarrow").select_columns(
            ["doc_id", "fp_md5"]
        )

    def q_token_freq(sf_dir: str):
        """Corpus-wide top-20 token frequencies (per-batch combiner ->
        small groupby-sum -> deterministic top-k)."""
        from go_datax_ray.stages.text import token_frequencies

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["text"])
        return token_frequencies(ds, top_k=20)

    def q_full_outer_join(sf_dir: str):
        """Full-outer bucketed join of per-customer order counts with
        per-user event counts (unmatched rows on either side survive,
        null-filled, dtypes intact)."""
        from go_datax_ray.stages.joins import bucket_hash_join

        rd = rd_lazy()
        orders = (
            _rp(sf_dir, "orders", columns=["o_custkey"])
            .groupby("o_custkey").count()
            .map_batches(lambda t: t.rename_columns(["k", "n_orders"]),
                         batch_format="pyarrow")
        )
        events = (
            _rp(sf_dir, "events", columns=["user_id"])
            .groupby("user_id").count()
            .map_batches(lambda t: t.rename_columns(["k", "n_events"]),
                         batch_format="pyarrow")
        )
        return bucket_hash_join(orders, events, on="k", n_buckets=16, how="full")

    # -- aggregation -------------------------------------------------------
    def q_groupby_events(sf_dir: str):
        rd = rd_lazy()
        from ray.data.aggregate import Count, Sum

        ds = _rp(sf_dir, "events", columns=["event_type", "value"])

        def cents(t: pa.Table) -> pa.Table:
            c = pc.cast(
                pc.round(pc.multiply(t.column("value"), pa.scalar(100.0)),
                         options=pc.RoundOptions(round_mode="half_towards_infinity")),
                pa.int64(),
            )
            return t.append_column("_cents", c)

        out = ds.map_batches(cents, batch_format="pyarrow").groupby("event_type").aggregate(
            Count(alias_name="n"), Sum("_cents", alias_name="sum_value_cents")
        )
        return out

    # -- similarity search -------------------------------------------------
    def q_ann_topk(sf_dir: str):
        from go_datax_ray.stages.ann import brute_force_topk

        rd = rd_lazy()
        import pyarrow.parquet as pq

        qt = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
        qids = qt.column("vec_id").to_pylist()[:ANN_NUM_QUERIES]
        queries_mat = np.asarray(
            qt.column("embedding").to_pylist()[:ANN_NUM_QUERIES], dtype=np.float64
        )
        ds = _rp(sf_dir, "embeddings")
        out = brute_force_topk(ds, queries_mat, k=ANN_K).to_pandas()
        out["query_id"] = out["query_id"].map(lambda i: qids[i])
        return pa.Table.from_pandas(
            out[["query_id", "vec_id", "rank"]], preserve_index=False
        )

    # -- windowed aggregates ----------------------------------------------
    def q_window_tumbling(sf_dir: str):
        from go_datax_ray.stages.windows import tumbling_aggregate

        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
        return tumbling_aggregate(ds, size_s=3600)

    def q_window_sliding(sf_dir: str):
        from go_datax_ray.stages.windows import sliding_aggregate

        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
        return sliding_aggregate(ds, size_s=3600, slide_s=900)

    def q_window_session(sf_dir: str):
        from go_datax_ray.stages.windows import session_windows

        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
        return session_windows(ds, gap_s=1800)

    def q_time_window_read(sf_dir: str):
        # tdenginereader's beginDateTime/endDateTime grammar
        # (tdengine_reader.go:146-168,349-355) over the parquet collapse
        # path: the window becomes a row-group-pruning filter at the read
        from go_datax_ray.registry import SOURCES

        ds = SOURCES["tdenginereader"](
            {"path": f"{sf_dir}/events.parquet",
             "column": ["event_type", "ts"],
             "tsColumn": "ts",
             "beginDateTime": "2024-01-10 00:00:00",
             "endDateTime": "2024-01-15 00:00:00",
             "allowCollapse": True},
            channel=4,
        )
        return ds.groupby("event_type").count().rename_columns(
            {"count()": "n"})

    # -- ordering / distinct ----------------------------------------------
    def q_topk_orders(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]
        )
        return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)

    def q_sample_k(sf_dir: str):
        """Fixed-SIZE deterministic uniform sample (vs hash_sample's
        fixed-RATE Bernoulli): the k docs with the smallest md5(doc_id)
        — every block keeps its local k candidates (select_k per batch),
        so only k rows per block reach the final cut; the sample is
        stable across runs, partitionings and engines."""
        import hashlib

        rd = rd_lazy()
        k = 25
        docs = _rp(sf_dir, "documents", columns=["doc_id", "lang"])

        def local_k(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc_id" not in t.column_names:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "lang": pa.array([], pa.string()),
                                 "_h": pa.array([], pa.string())})
            if "_h" not in t.column_names:  # final pass re-enters with _h
                h = pa.array([hashlib.md5(str(i).encode()).hexdigest()
                              for i in t.column("doc_id").to_pylist()])
                t = t.append_column("_h", h)
            idx = pc.select_k_unstable(t, k=min(k, t.num_rows),
                                       sort_keys=[("_h", "ascending")])
            return t.take(idx)

        cand = docs.map_batches(local_k, batch_format="pyarrow")
        final = local_k(pa.concat_tables(
            [pa.table(b) for b in cand.iter_batches(batch_format="pyarrow")]
        ))
        return final.select(["doc_id", "lang"])

    def q_distinct_event_types(sf_dir: str):
        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["event_type"])
        vals = sorted(ds.unique("event_type"))
        return pa.table({"event_type": pa.array(vals, pa.string())})

    def q_ann_ivf(sf_dir: str):
        """IVF (k-means cells + probes) approximate top-k with a
        recall-property oracle (VERDICT r1 #7): per query, recall@k vs
        the exact brute-force scan must clear 0.6 (observed >=0.8 with
        12/16 probes; the mean >=0.9 bar lives in pytest). k-means isn't
        SQL-expressible, but the property gate is driver-hashable."""
        from go_datax_ray.stages.ann import brute_force_topk, ivf_topk

        rd = rd_lazy()
        import pyarrow.parquet as pq

        qt = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
        qids = qt.column("vec_id").to_pylist()[:ANN_NUM_QUERIES]
        queries_mat = np.asarray(
            qt.column("embedding").to_pylist()[:ANN_NUM_QUERIES], dtype=np.float64
        )
        ivf = ivf_topk(
            _rp(sf_dir, "embeddings"), queries_mat,
            k=ANN_K, n_clusters=16, n_probes=12,
        ).to_pandas()
        bf = brute_force_topk(
            _rp(sf_dir, "embeddings"), queries_mat, k=ANN_K
        ).to_pandas()
        rows = []
        for q in range(ANN_NUM_QUERIES):
            hit = set(ivf[ivf["query_id"] == q]["vec_id"]) & set(
                bf[bf["query_id"] == q]["vec_id"]
            )
            rows.append({"query_id": qids[q], "recall_ok": len(hit) / ANN_K >= 0.6})
        import pandas as pd

        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    # -- joins / lookups ---------------------------------------------------
    def q_broadcast_join(sf_dir: str):
        import pyarrow.parquet as pq

        from go_datax_ray.stages.joins import broadcast_join

        rd = rd_lazy()
        orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
        cust = (
            pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
            .rename_columns(["o_custkey", "c_mktsegment"])
        )
        out = broadcast_join(orders, cust, on="o_custkey")
        return out.map_batches(
            lambda t: t.select(["o_orderkey", "c_mktsegment"]), batch_format="pyarrow"
        )

    def q_bucket_hash_join(sf_dir: str):
        from go_datax_ray.stages.joins import bucket_hash_join

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
        orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]
        ).map_batches(
            lambda t: t.rename_columns(["l_orderkey", "o_orderstatus"]), batch_format="pyarrow"
        )
        out = bucket_hash_join(li, orders, on="l_orderkey", n_buckets=16)
        return out.map_batches(
            lambda t: t.select(["l_orderkey", "l_linenumber", "o_orderstatus"]),
            batch_format="pyarrow",
        )

    def q_skew_join(sf_dir: str):
        """Skewed join through the auto-salted path: ~60% of events
        collapse onto key 0 (a planted hot key), the rest spread over
        500 cold keys. salt_keys="auto" detects the hot key with the
        one-pass skew sketch and fans ONLY it across 8 salts; output is
        byte-identical to the plain SQL join (at sf0.001 the hot key
        stays under the threshold and the unsalted plan runs — both
        paths are exercised across scale factors)."""
        import numpy as np

        from go_datax_ray.stages.joins import bucket_hash_join

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id"])

        def skew(t: pa.Table) -> pa.Table:
            u = t.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            k = np.where(u % 10 < 6, 0, u % 500)
            return pa.table({"event_id": t.column("event_id"),
                             "k": pa.array(k, pa.int64())})

        left = ev.map_batches(skew, batch_format="pyarrow")
        dim = pa.table({"k": pa.array(np.arange(500), pa.int64()),
                        "v": pa.array(np.arange(500) * 3, pa.int64())})
        out = bucket_hash_join(left, rd.from_arrow(dim), on="k", n_buckets=16,
                               n_salts=8, salt_keys="auto", hot_threshold=5000)
        return out.map_batches(
            lambda t: t.select(["event_id", "k", "v"]), batch_format="pyarrow"
        )

    def q_semi_join(sf_dir: str):
        import pyarrow.parquet as pq

        from go_datax_ray.stages.joins import semi_join

        rd = rd_lazy()
        rich = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
        keys = rich.filter(pc.greater(rich.column("c_acctbal"), pa.scalar(5000.0))).column(
            "c_custkey"
        ).to_pylist()
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id"])
        return semi_join(ev, keys, on="user_id")

    def q_anti_join(sf_dir: str):
        import pyarrow.parquet as pq

        from go_datax_ray.stages.joins import semi_join

        rd = rd_lazy()
        rich = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
        keys = rich.filter(pc.greater(rich.column("c_acctbal"), pa.scalar(5000.0))).column(
            "c_custkey"
        ).to_pylist()
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id"])
        return semi_join(ev, keys, on="user_id", anti=True)

    def q_asof_join(sf_dir: str):
        """Event-to-snapshot as-of join: each event picks up the customer's
        latest order price at or before the event time (bucketed
        co-group + sorted merge_asof per bucket)."""
        from go_datax_ray.stages.joins import asof_join

        ev = _rp(sf_dir, "events",
                             columns=["event_id", "user_id", "ts"])
        orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
        )
        # deterministic as-of pick WITHOUT a right-side pre-aggregation
        # shuffle: merge_asof matches the LAST right row per ts, and the
        # right_sort_tail=[price] orders duplicate (key, ts) rows so the
        # last one is the max price — exactly the oracle's
        # GROUP BY (key, ts) MAX(price) followed by ASOF
        right = orders.map_batches(
            lambda t: t.rename_columns(["user_id", "ts", "last_order_price"]),
            batch_format="pyarrow",
        )
        ev_schema = pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("ts", pa.timestamp("us"))]
        )
        r_schema = pa.schema(
            [("user_id", pa.int64()), ("ts", pa.timestamp("us")),
             ("last_order_price", pa.float64())]
        )
        out = asof_join(ev, right, by="user_id", on="ts",
                        right_sort_tail=["last_order_price"],
                        schemas=(ev_schema, r_schema))
        return out.map_batches(
            lambda t: t.select(["event_id", "user_id", "ts", "last_order_price"]),
            batch_format="pyarrow",
        )

    def q_range_join(sf_dir: str):
        """Interval join: events matched to overlapping value bands
        (binned replication + in-bin vectorized compare)."""
        from go_datax_ray.stages.joins import range_join

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "value"])
        bands = pa.table(
            {
                "band_id": pa.array(range(12), pa.int64()),
                "lo": pa.array([k * 10.0 for k in range(12)], pa.float64()),
                "hi": pa.array([k * 10.0 + 15.0 for k in range(12)], pa.float64()),
            }
        )
        out = range_join(
            ev, rd.from_arrow(bands), value_col="value", lo_col="lo", hi_col="hi",
            bin_width=10.0,
            schemas=(
                pa.schema([("event_id", pa.int64()), ("value", pa.float64())]),
                bands.schema,
            ),
        )
        return out.map_batches(
            lambda t: t.select(["event_id", "band_id"]), batch_format="pyarrow"
        )

    def q_partial_agg_revenue(sf_dir: str):
        from go_datax_ray.stages.joins import partial_agg_sum

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem",
            columns=["l_returnflag", "l_extendedprice", "l_discount"],
        )

        def cents(t: pa.Table):
            rev = pc.multiply(
                t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
            )
            # DuckDB ROUND is half-away-from-zero; Arrow defaults to
            # half-to-even — match explicitly (values are positive)
            rounded = pc.round(
                pc.multiply(rev, pa.scalar(100.0)),
                options=pc.RoundOptions(round_mode="half_towards_infinity"),
            )
            return pc.cast(rounded, pa.int64())

        return partial_agg_sum(li, key="l_returnflag", value_expr=cents, out_col="revenue_cents")

    def q_tpch_q3_composed(sf_dir: str):
        """TPC-H Q3-shaped composition from the engine's own operators:
        semi-join filter (BUILDING customers) -> bucket hash join
        (lineitem x orders) -> filtered partial aggregation (exact cents)
        -> top-10. Demonstrates operator composition, not a SQL planner."""
        import pyarrow.parquet as pq

        from go_datax_ray.stages.joins import bucket_hash_join, partial_agg_sum, semi_join

        rd = rd_lazy()
        cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
        building = cust.filter(
            pc.equal(cust.column("c_mktsegment"), pa.scalar("BUILDING"))
        ).column("c_custkey").to_pylist()
        orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
        )
        orders = semi_join(orders, building, on="o_custkey")
        cutoff = pa.scalar(pd_ts("1995-03-15"))
        orders = orders.map_batches(
            lambda t: t.filter(pc.less(t.column("o_orderdate"), cutoff)),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: t.rename_columns(["l_orderkey", "o_custkey", "o_orderdate"]),
            batch_format="pyarrow",
        )
        li = _rp(sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(
            lambda t: t.filter(pc.greater(t.column("l_shipdate"), cutoff)),
            batch_format="pyarrow",
        )
        joined = bucket_hash_join(li, orders, on="l_orderkey", n_buckets=16)

        def cents(t: pa.Table):
            rev = pc.multiply(
                t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
            )
            return pc.cast(
                pc.round(pc.multiply(rev, pa.scalar(100.0)),
                         options=pc.RoundOptions(round_mode="half_towards_infinity")),
                pa.int64(),
            )

        agg = partial_agg_sum(joined, key="l_orderkey", value_expr=cents, out_col="revenue_cents")
        return agg.sort(["revenue_cents", "l_orderkey"], descending=[True, False]).limit(10)

    def q_tpch_q18(sf_dir: str):
        """TPC-H Q18-shaped composition (large-volume customers): the
        HAVING gate is a map-side-combining groupby over lineitem (only
        (orderkey, qty) pairs cross the shuffle), the few qualifying
        orders join the orders table through the bucketed hash join,
        the customer dim broadcasts, and the top-100 sort runs over the
        already-HAVING-pruned rows. A deterministic o_orderkey tiebreak
        pins the limit."""
        import pyarrow.parquet as pq

        from go_datax_ray.stages.joins import broadcast_join, bucket_hash_join

        import numpy as np

        from go_datax_ray.stages.dedup import _col_np, _segments
        from go_datax_ray.stages.partition import cohash_map_groups

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

        def qty_empty() -> pa.Table:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "_q": pa.array([], pa.int64())})

        def qty_partial(t: pa.Table) -> pa.Table:
            # per-batch partial sums (cohash reduce pattern — the native
            # sort aggregate's pandas conversions cost 5.5 s here)
            if t.num_rows == 0 or "l_orderkey" not in t.column_names:
                return qty_empty()
            t = t.append_column(
                "_q", t.column("l_quantity").cast(pa.int64())
            ).select(["l_orderkey", "_q"])
            order, bounds = _segments(t, ["l_orderkey"])
            q = _col_np(t, "_q")[order]
            cq = np.concatenate([[0], np.cumsum(q)])
            out = t.take(pa.array(order[bounds[:-1]])).select(["l_orderkey"])
            return out.append_column(
                "_q", pa.array(cq[bounds[1:]] - cq[bounds[:-1]], pa.int64()))

        def qty_final(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or "l_orderkey" not in g.column_names:
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "total_qty": pa.array([], pa.int64())})
            order, bounds = _segments(g, ["l_orderkey"])
            q = _col_np(g, "_q")[order]
            cq = np.concatenate([[0], np.cumsum(q)])
            sums = cq[bounds[1:]] - cq[bounds[:-1]]
            keep = sums > 212  # the HAVING gate, applied in the reducer
            heads = order[bounds[:-1]][keep]
            out = g.take(pa.array(heads)).select(["l_orderkey"])
            return pa.table({
                "o_orderkey": out.column("l_orderkey").cast(pa.int64()),
                "total_qty": pa.array(sums[keep], pa.int64()),
            })

        qual = cohash_map_groups(
            li.map_batches(qty_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["l_orderkey"], qty_final,
        ).materialize()
        orders = _rp(sf_dir, "orders",
                     columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        # HAVING survivors are few — broadcast them into orders' map when
        # small; fall back to the bucketed join at pathological counts
        n_qual = qual.count()
        if n_qual <= 200_000:
            qual_tbl = pa.concat_tables(
                [pa.table(b) for b in qual.iter_batches(batch_format="pyarrow")]
            )
            big = broadcast_join(orders, qual_tbl, on="o_orderkey"
                                 )  # inner: keeps qualifying orders only
        else:
            big = bucket_hash_join(qual, orders, on="o_orderkey", n_buckets=16)
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_name"])
        cust = pa.table({"o_custkey": cust.column("c_custkey"),
                         "c_custkey": cust.column("c_custkey"),
                         "c_name": cust.column("c_name")})
        out = broadcast_join(big, cust, on="o_custkey")
        out = out.map_batches(
            lambda t: t.select(["c_name", "c_custkey", "o_orderkey",
                                "o_orderdate", "o_totalprice", "total_qty"]),
            batch_format="pyarrow",
        )

        def top100(t: pa.Table) -> pa.Table:
            # block-local then global top-100 by the deterministic
            # 3-key order — no global Sort operator
            if t.num_rows == 0:
                return t
            df = t.to_pandas().sort_values(
                ["o_totalprice", "o_orderdate", "o_orderkey"],
                ascending=[False, True, True],
            ).head(100)
            return pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)

        return (out.map_batches(top100, batch_format="pyarrow")
                   .repartition(1)
                   .map_batches(top100, batch_format="pyarrow"))

    def q_tpch_q5_composed(sf_dir: str):
        """TPC-H Q5-shaped composition: a 6-table join expressed with the
        engine's own scale idioms — tiny dims (region x nation) resolved
        driver-side, small sides (customer, supplier) BROADCAST, the one
        genuinely big x big pair (lineitem x orders) through the bucketed
        hash join, then exact-cents partial aggregation by nation. The
        co-located-nation predicate (c_nationkey = s_nationkey) filters
        AFTER the joins, map-side."""
        import pyarrow.parquet as pq

        from go_datax_ray.stages.joins import broadcast_join, bucket_hash_join
        from go_datax_ray.stages.partition import bounded_groupby
        from ray.data.aggregate import Sum

        rd = rd_lazy()
        region = pq.read_table(f"{sf_dir}/region.parquet")
        nation = pq.read_table(f"{sf_dir}/nation.parquet")
        asia = region.filter(pc.equal(region.column("r_name"), pa.scalar("ASIA")))
        nat = nation.filter(
            pc.is_in(nation.column("n_regionkey"),
                     value_set=asia.column("r_regionkey").combine_chunks())
        )
        asia_keys = nat.column("n_nationkey").combine_chunks()
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        cust = cust.filter(pc.is_in(cust.column("c_nationkey"), value_set=asia_keys))
        cust = cust.rename_columns(["o_custkey", "c_nationkey"])
        supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
        supp = supp.filter(pc.is_in(supp.column("s_nationkey"), value_set=asia_keys))
        supp = supp.rename_columns(["l_suppkey", "s_nationkey"])

        lo, hi = pa.scalar(pd_ts("1996-01-01")), pa.scalar(pd_ts("1997-01-01"))
        orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        orders = orders.map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t.column("o_orderdate"), lo),
                        pc.less(t.column("o_orderdate"), hi))
            ).select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow",
        )
        orders = broadcast_join(orders, cust, on="o_custkey")
        orders = orders.map_batches(
            lambda t: t.select(["o_orderkey", "c_nationkey"]).rename_columns(
                ["l_orderkey", "c_nationkey"]),
            batch_format="pyarrow",
        )
        li = _rp(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
        joined = bucket_hash_join(li, orders, on="l_orderkey", n_buckets=16)
        joined = broadcast_join(joined, supp, on="l_suppkey")
        names = dict(zip(nat.column("n_nationkey").to_pylist(),
                         nat.column("n_name").to_pylist()))
        nk = pa.array(sorted(names), pa.int64())
        nv = pa.array([names[k] for k in sorted(names)], pa.string())

        def cents_by_nation(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("c_nationkey"), t.column("s_nationkey")))
            rev = pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
            cents = pc.cast(
                pc.round(pc.multiply(rev, pa.scalar(100.0)),
                         options=pc.RoundOptions(round_mode="half_towards_infinity")),
                pa.int64(),
            )
            idx = pc.index_in(t.column("s_nationkey").cast(pa.int64()), value_set=nk)
            return pa.table({"n_name": nv.take(idx), "revenue_cents": cents})

        per_nation = joined.map_batches(cents_by_nation, batch_format="pyarrow")
        out = bounded_groupby(per_nation, "n_name").aggregate(
            Sum("revenue_cents", alias_name="revenue_cents")
        )
        return out.map_batches(
            lambda t: t.set_column(
                t.column_names.index("revenue_cents"), "revenue_cents",
                t.column("revenue_cents").cast(pa.int64())),
            batch_format="pyarrow",
        )

    def q_lineage(sf_dir: str):
        """Per-partition lineage of a multi-epoch replay: source offsets ->
        partition -> committed file + rows — now FULLY SQL-oracle-checked:
        the replay uses the md5 partition hash (placement auditable via
        md5_number_lower), epoch boundaries are event-count splits, the
        file names are the deterministic part/epoch pattern, and per-
        partition rows = cumulative distinct keys (tombstones included:
        a delete is a row until compaction)."""
        import shutil

        from go_datax_ray.pipelines.cdc_replay import (
            DatasetEventSource,
            ReplayConfig,
            replay,
        )
        from go_datax_ray.state.manifest import Manifest

        lake = "/tmp/gdr_lineage_lake"
        shutil.rmtree(lake, ignore_errors=True)
        ev = _events_as_cdc(sf_dir)
        n = ev.count()
        replay(
            DatasetEventSource(ev, 0, n),
            ReplayConfig(lake_dir=lake, num_partitions=8,
                         epoch_size=max(n // 3, 1), hash_fn="md5"),
        )
        rows = []
        for rec in Manifest.load(lake).lineage():
            for pid, ent in rec["partitions"].items():
                rows.append(
                    (rec["epoch"], rec["lsn_lo"], rec["lsn_hi"], int(pid),
                     ent["file"], ent["rows"], ent["events"])
                )
        cols = list(zip(*rows)) if rows else [[]] * 7
        return pa.table(
            {
                "epoch": pa.array(cols[0], pa.int64()),
                "lsn_lo": pa.array(cols[1], pa.int64()),
                "lsn_hi": pa.array(cols[2], pa.int64()),
                "partition": pa.array(cols[3], pa.int64()),
                "file": pa.array(cols[4], pa.string()),
                "rows": pa.array(cols[5], pa.int64()),
                "events": pa.array(cols[6], pa.int64()),
            }
        )

    # -- sampling / selection / sketches ----------------------------------
    def q_hash_sample(sf_dir: str):
        from go_datax_ray.stages.sampling import hash_sample

        rd = rd_lazy()
        ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
        return hash_sample(ds, key="o_orderkey", rate=0.1)

    def q_topk_per_group(sf_dir: str):
        from go_datax_ray.stages.sampling import top_k_per_group

        rd = rd_lazy()
        ds = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
        )
        return top_k_per_group(
            ds, group="o_custkey", order="o_totalprice", k=2, tiebreak="o_orderkey"
        )

    def q_approx_distinct(sf_dir: str):
        """Tolerance oracle (VERDICT r1 #7): emit the EXACT distinct count
        (distributed Ray unique — SQL-checkable) plus the property that
        the HLL estimate is within 5% of it; a drifting sketch flips the
        boolean and fails the driver hash."""
        from go_datax_ray.stages.sampling import approx_distinct

        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["user_id"])
        est = approx_distinct(ds, column="user_id")
        exact = len(_rp(sf_dir, "events", columns=["user_id"]).unique("user_id"))
        return pa.table(
            {
                "exact_distinct_users": pa.array([exact], pa.int64()),
                "est_within_5pct": pa.array([abs(est / exact - 1.0) < 0.05], pa.bool_()),
            }
        )

    def q_snapshot_diff(sf_dir: str):
        """CDC bootstrap: diff two deterministic 'versions' of orders
        (old = keys not divisible by 7; new = keys not divisible by 5,
        price bumped where divisible by 3) -> I/U/D ops per key."""
        from go_datax_ray.pipelines.snapshot_diff import diff_snapshots

        rd = rd_lazy()

        def old_side(t: pa.Table) -> pa.Table:
            keys = t.column("o_orderkey").to_numpy()
            return t.filter(pa.array(keys % 7 != 0))

        def new_side(t: pa.Table) -> pa.Table:
            keys = t.column("o_orderkey").to_numpy()
            t = t.filter(pa.array(keys % 5 != 0))
            keys = t.column("o_orderkey").to_numpy()
            bump = pa.array(keys % 3 == 0)
            newprice = pc.if_else(
                bump, pc.add(t.column("o_totalprice"), pa.scalar(1.5)), t.column("o_totalprice")
            )
            return t.set_column(
                t.column_names.index("o_totalprice"), "o_totalprice", newprice
            )

        cols = ["o_orderkey", "o_totalprice"]
        old_ds = _rp(sf_dir, "orders", columns=cols).map_batches(
            old_side, batch_format="pyarrow"
        )
        new_ds = _rp(sf_dir, "orders", columns=cols).map_batches(
            new_side, batch_format="pyarrow"
        )
        out = diff_snapshots(old_ds, new_ds, key="o_orderkey", n_buckets=8)
        return out.map_batches(
            lambda t: t.select(["o_orderkey", "op"]), batch_format="pyarrow"
        )

    # -- multimodal plumbing (stubbed codecs, real Ray stages) ------------
    def q_media_features(sf_dir: str):
        from go_datax_ray.stages.multimodal import ImageFeatures, make_media_table

        rd = rd_lazy()
        media = rd.from_arrow(make_media_table(240))
        out = media.map_batches(
            ImageFeatures, batch_format="pyarrow", batch_size=32, concurrency=2
        )
        return out.map_batches(
            lambda t: t.select(["media_id", "phash"]), batch_format="pyarrow"
        )

    # -- corpus curation ---------------------------------------------------
    def q_decontaminate(sf_dir: str):
        """Benchmark decontamination: docs with doc_id % 97 == 0 play the
        held-out eval set; every other doc is flagged with the count of
        its distinct word-3-grams that collide with the eval set's
        shingle union (FineWeb/Dolma-style n-gram decontamination).
        Integer outputs only — the oracle intersects STRING shingles,
        the engine md5_lower64 hashes; equal modulo md5 collisions."""
        from go_datax_ray.stages.curation import decontaminate

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

        def side(keep_eval: bool):
            def fn(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                m = (ids % 97 == 0) if keep_eval else (ids % 97 != 0)
                return t.filter(pa.array(m))

            return fn

        ev = docs.map_batches(side(True), batch_format="pyarrow")
        tr = docs.map_batches(side(False), batch_format="pyarrow")
        return decontaminate(tr, ev, k=3)

    def q_gopher_quality(sf_dir: str):
        """Gopher-style quality rules with corpus-calibrated thresholds
        (the synthetic fixture's vocabulary has no English stopwords, so
        the probe list is its own top words and the presence bar is 7 —
        the rule machinery, not the web-text constants, is under test)."""
        from go_datax_ray.stages.curation import gopher_quality

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        probes = ("join", "hash", "row", "batch", "scan", "column", "data", "merge")
        return ds.map_batches(
            gopher_quality,
            fn_kwargs=dict(stopwords=probes, min_words=40, min_stopwords=7),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def q_pii_mask(sf_dir: str):
        """dx_mask transformer over text with deterministically synthesised
        PII appended (the fixture corpus has none): email, phone and IPv4
        derived from doc_id, then redacted to fixed tokens. The oracle
        rebuilds the same string in SQL and applies the same RE2 patterns
        via regexp_replace(..., 'g')."""
        from go_datax_ray.stages.transforms import dx_mask

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

        def synth(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            texts = t.column("text").to_pylist()
            out = [
                f"{x or ''} contact user{i}@example.com or +1-555-{i % 10000:04d}"
                f" at 10.0.{i % 256}.{i % 100}"
                for i, x in zip(ids, texts)
            ]
            return pa.table(
                {"doc_id": t.column("doc_id").cast(pa.int64()),
                 "text": pa.array(out, pa.string())}
            )

        return ds.map_batches(synth, batch_format="pyarrow").map_batches(
            lambda t: dx_mask(t, "text"), batch_format="pyarrow"
        )

    def q_token_count_bpe(sf_dir: str):
        """GPT-2-style pre-tokenizer count via one RE2 scan (pyarrow
        count_substring_regex); DuckDB runs the SAME RE2 pattern, so
        the counts are bitwise-identical (see text.BPE_RE2_PATTERN for
        why dropping the lookahead preserves the count)."""
        from go_datax_ray.stages.text import bpe_token_count

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ds.map_batches(
            bpe_token_count, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            lambda t: t.select(["doc_id", "n_tokens_bpe"]), batch_format="pyarrow"
        )

    def q_inverted_index(sf_dir: str):
        """Distributed inverted index over the corpus tokenizer's
        tokens: one co-hashed exchange on token, segment-vectorised
        postings assembly; postings render as a comma-joined sorted
        string so the driver hash and the string_agg oracle see the
        same value."""
        from go_datax_ray.stages.text import inverted_index

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return inverted_index(ds, min_df=3)

    def q_tfidf_top_terms(sf_dir: str):
        """Per-document top-3 tf-idf terms, two in-cluster co-hash
        passes (token -> attach df; doc -> top-k). Integer-only output;
        ln() ranks but never lands in a column (numpy vs DuckDB ln
        differ in the last ulp — measured — so emitting the score
        would be hash-fragile)."""
        from go_datax_ray.stages.text import tfidf_top_terms

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return tfidf_top_terms(ds, k=3)

    def q_bm25_top_terms(sf_dir: str):
        """Per-document top-3 Okapi BM25 terms (k1=1.2, b=0.75): tf-idf
        extended with document-length normalisation; integer-only
        output, float score ranks with the literal expression the SQL
        oracle evaluates."""
        from go_datax_ray.stages.text import bm25_top_terms

        rd = rd_lazy()
        ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return bm25_top_terms(ds, k=3)

    def q_stratified_sample(sf_dir: str):
        """Per-stratum hash sampling: heavy event types sampled down
        hard, rare types kept whole — the deterministic
        md5-over-key predicate of hash_sample, with a per-stratum
        threshold resolved by dictionary decode (no per-row Python)."""
        from go_datax_ray.stages.sampling import stratified_sample

        rd = rd_lazy()
        ev = _rp(sf_dir, "events")
        return stratified_sample(
            ev, key="event_id", stratum="event_type",
            rates={"click": 0.5, "view": 0.1, "purchase": 1.0},
            default_rate=0.05,
        )

    def q_grouped_quantiles(sf_dir: str):
        """Exact per-event-type p50/p90/p99 of value (integer cents,
        percentile_disc rank = ceil(q*n)). The shuffle carries one row
        per DISTINCT (type, cents) — a histogram combiner, so the
        exchange size is value-domain-bounded, not row-bounded."""
        from go_datax_ray.stages.sampling import grouped_quantiles

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_type", "value"])
        return grouped_quantiles(ev, group="event_type", value_col="value")

    def q_window_rank(sf_dir: str):
        """ROW_NUMBER/RANK/DENSE_RANK/LAG/LEAD per user ordered by ts —
        the co-hashed map_groups shape: one coarse-bucket shuffle, one
        numpy lexsort per bucket segments every user at once (no
        per-key Python call, no global sort)."""
        from go_datax_ray.stages.analytic import ranked_window

        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
        return ranked_window(ds)

    def q_first_last(sf_dir: str):
        """Per-key FIRST_VALUE / LAST_VALUE over (ts, event_id) order —
        one lexsort per co-hash block, segment heads and tails; values
        pass through untouched so doubles hash bit-exactly."""
        import numpy as np

        from go_datax_ray.stages.dedup import _col_np, _segments
        from go_datax_ray.stages.partition import cohash_map_groups

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

        def fl_block(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or "user_id" not in g.column_names:
                return pa.table({"user_id": pa.array([], pa.int64()),
                                 "first_value": pa.array([], pa.float64()),
                                 "last_value": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            k = _col_np(g, "user_id")
            order = np.lexsort((_col_np(g, "event_id"), _col_np(g, "ts"), k))
            ks = k[order]
            bounds = np.concatenate(
                [[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1, [len(ks)]]
            ).astype(np.int64)
            heads, tails = order[bounds[:-1]], order[bounds[1:] - 1]
            vals = g.column("value").combine_chunks().to_numpy(zero_copy_only=False)
            out = g.take(pa.array(heads)).select(["user_id"])
            return (out.append_column("first_value",
                                      pa.array(vals[heads], pa.float64()))
                       .append_column("last_value",
                                      pa.array(vals[tails], pa.float64()))
                       .append_column("n", pa.array(np.diff(bounds), pa.int64())))

        return cohash_map_groups(ev, ["user_id"], fl_block)

    def q_rolling_frame(sf_dir: str):
        """Moving SUM/COUNT/AVG over a 4-row ROWS frame per user —
        segment-clamped cumsum, one lexsort per co-hash block; exact
        integer cents so the average is an IEEE division of the same
        two integers DuckDB divides."""
        from go_datax_ray.stages.analytic import rolling_frame

        rd = rd_lazy()
        ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

        def to_cents(t: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(t.column("value"), pa.scalar(100.0)),
                         options=pc.RoundOptions(round_mode="half_towards_infinity")),
                pa.int64(),
            )  # DuckDB ROUND is half-away-from-zero
            return t.drop_columns(["value"]).append_column("cents", cents)

        out = rolling_frame(ds.map_batches(to_cents, batch_format="pyarrow"),
                            window=4)
        return out.select_columns(
            ["event_id", "user_id", "roll_sum_cents", "roll_n", "roll_avg_cents"]
        )

    def q_rollup_revenue(sf_dir: str):
        """GROUP BY ROLLUP(l_returnflag, l_linestatus): finest level is
        the only raw-input shuffle; coarser levels re-aggregate the
        distinct-combo-sized base result."""
        from go_datax_ray.stages.analytic import rollup_aggregate

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem",
                 columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
        return rollup_aggregate(
            li, keys=["l_returnflag", "l_linestatus"], value_col="l_extendedprice"
        )

    def q_cube_revenue(sf_dir: str):
        """GROUP BY CUBE(l_returnflag, l_linestatus): all 2^k grouping
        sets; only the finest touches the raw input."""
        from go_datax_ray.stages.analytic import cube_aggregate

        rd = rd_lazy()
        li = _rp(sf_dir, "lineitem",
                 columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
        return cube_aggregate(
            li, keys=["l_returnflag", "l_linestatus"], value_col="l_extendedprice"
        )

    def q_pivot_events(sf_dir: str):
        """Pivot event_type into per-value exact-cents sum columns per
        user: conditional columns built vectorised per batch, ONE
        groupby with map-side partial aggregation."""
        from go_datax_ray.stages.analytic import pivot_aggregate

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["user_id", "event_type", "value"])
        return pivot_aggregate(ev)

    def q_explode_tokens(sf_dir: str):
        """UNNEST whitespace tokens: pure Arrow split/flatten kernels,
        zero Python per row, no shuffle."""
        from go_datax_ray.stages.analytic import explode_tokens

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return explode_tokens(docs)

    def q_normalize_text(sf_dir: str):
        """DuckDB-parity canonical normalization (NFC -> lower ->
        whitespace collapse -> trim): ASCII rows fully vectorised, only
        non-ASCII rows pay the exact unicodedata fallback."""
        from go_datax_ray.stages.curation import normalize_text_ds

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return normalize_text_ds(docs).select_columns(["doc_id", "norm"])

    def q_cluster_histogram(sf_dir: str):
        """Exact-duplicate cluster-size histogram: per-batch hash
        value_counts combiner -> cluster sizes -> size histogram; text
        never shuffles."""
        from go_datax_ray.stages.dedup import cluster_size_histogram

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["text"])
        return cluster_size_histogram(docs)

    def q_composite_join(sf_dir: str):
        """Composite-key (user_id, event_type) LEFT bucket join: attach
        per-(user, type) click counts to every event; non-click rows
        stay null — exercising multi-column bucketing AND the int64
        null-conformance path on the composite merge."""
        from ray.data.aggregate import Count

        from go_datax_ray.stages.joins import bucket_hash_join
        from go_datax_ray.stages.partition import bounded_groupby

        rd = rd_lazy()
        ev = _rp(sf_dir, "events",
                 columns=["event_id", "user_id", "event_type"])
        clicks = bounded_groupby(
            ev.filter(expr="event_type == 'click'")
            .select_columns(["user_id", "event_type"]),
            ["user_id", "event_type"],
        ).aggregate(Count(alias_name="n_clicks"))

        def conform(t):
            import pyarrow as _pa
            i = t.column_names.index("n_clicks")
            return t.set_column(
                i, "n_clicks", t.column("n_clicks").cast(_pa.int64())
            )

        clicks = clicks.map_batches(conform, batch_format="pyarrow")
        return bucket_hash_join(
            ev, clicks, on=["user_id", "event_type"], how="left"
        )

    def q_ngram_commonness(sf_dir: str):
        """Per-doc boilerplate score: sum of the corpus-global counts
        of the doc's bigrams — the canonical feature-lookup join
        ((id, feature) pairs x global feature frequencies)."""
        from go_datax_ray.stages.text import ngram_commonness

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        return ngram_commonness(docs)

    def q_json_extract(sf_dir: str):
        """Column-level JSON path extraction (dx_json + dx_cast through
        the config-driven transformer chain): RE2 fast path on flat
        documents, exact json.loads fallback elsewhere."""
        from go_datax_ray.stages.transforms import apply_transformers

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "props"])
        out = apply_transformers(ev, [
            {"name": "dx_json", "parameter": {"column": "props",
                                              "paras": ["$.k", "k"]}},
            {"name": "dx_cast", "parameter": {"column": "k",
                                              "paras": ["long", "lenient"]}},
        ])
        return out.select_columns(["event_id", "k"])

    def q_windowed_distinct(sf_dir: str):
        """Exact COUNT(DISTINCT user) per tumbling hour: within-batch
        pair combiner -> pair dedup groupby -> window count over the
        distinct-pair-sized remainder."""
        from go_datax_ray.stages.windows import windowed_count_distinct

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["ts", "user_id"])
        return windowed_count_distinct(ev, ts_col="ts", key_col="user_id",
                                       size_s=3600)

    def q_grouped_mode(sf_dir: str):
        """Per-user modal event type (ties -> smallest type): counts
        groupby with map-side partials, then segment-vectorised top-1."""
        from go_datax_ray.stages.analytic import grouped_mode

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["user_id", "event_type"])
        return grouped_mode(ev, group="user_id", value="event_type")

    def q_funnel(sf_dir: str):
        """Ordered funnel signup -> click -> purchase: per step one
        projected groupby-min over ONE event type; the prior step's
        (user, first_ts) frontier is broadcast as object-store refs and
        binary-searched per batch (worker-cached) — no corpus-wide
        shuffle, no driver-side frontier."""
        from go_datax_ray.stages.analytic import funnel_counts

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
        return funnel_counts(ev)

    def _setop_sides(sf_dir: str):
        from go_datax_ray.stages.windows import add_tumbling_window

        ev = _rp(sf_dir, "events", columns=["user_id", "event_type", "ts"])
        ev = ev.map_batches(
            add_tumbling_window,
            fn_kwargs=dict(ts_col="ts", size_s=86400, out_col="day"),
            batch_format="pyarrow",
        ).drop_columns(["ts"])
        return (
            ev.filter(expr="event_type == 'click'"),
            ev.filter(expr="event_type == 'purchase'"),
        )

    def q_set_intersect(sf_dir: str):
        """INTERSECT on (user, day): flag-tag both sides, one groupby
        with Max-flag aggregates — the shuffle carries keys + two ints,
        dup-safe under skew."""
        from go_datax_ray.stages.setops import set_op

        rd = rd_lazy()
        a, b = _setop_sides(sf_dir)
        return set_op(a, b, on=["user_id", "day"], op="intersect")

    def q_set_except(sf_dir: str):
        """EXCEPT on (user, day): click-days with no purchase."""
        from go_datax_ray.stages.setops import set_op

        rd = rd_lazy()
        a, b = _setop_sides(sf_dir)
        return set_op(a, b, on=["user_id", "day"], op="except")

    def q_approx_quantiles(sf_dir: str):
        """Bottom-k hash-sample quantile sketch (the scale path where the
        exact histogram's distinct-value shuffle would blow up); emits a
        per-group rank-property boolean per quantile, verified in-cluster
        against the full data — the oracle is `true` + COUNT(*)."""
        from go_datax_ray.stages.sampling import approx_grouped_quantiles

        rd = rd_lazy()
        ev = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
        return approx_grouped_quantiles(
            ev, group="event_type", value_col="value", id_col="event_id"
        )

    def q_bloom_semi_join(sf_dir: str):
        """Runtime-filter semi-join: the key side is broadcast as a BLOOM
        (1.25 B/key vs 8+ B raw), fact rows drop map-side before any
        shuffle, and an exact bucketed semi-join on the tiny remainder
        removes false positives — exact output, bandwidth-bounded.
        force_bloom exercises the bloom path at test scale (the adaptive
        default would broadcast raw keys this small)."""
        from go_datax_ray.stages.bloom import bloom_semi_join

        rd = rd_lazy()
        cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
        keys = cust.filter(expr="c_acctbal > 5000").map_batches(
            lambda t: pa.table({"user_id": t.column("c_custkey")}),
            batch_format="pyarrow",
        )
        ev = _rp(sf_dir, "events", columns=["event_id", "user_id"])
        return bloom_semi_join(ev, keys, on="user_id", force_bloom=True)

    def q_profile_table(sf_dir: str):
        """Single-pass column profile (n/nulls/min/max per column; string
        columns profile UTF-8 lengths, floats exact cents, timestamps
        epoch-us) — partial stats per batch, column-sized merge groupby."""
        from go_datax_ray.stages.profile import profile_columns

        rd = rd_lazy()
        return profile_columns(_rp(sf_dir, "orders"))

    def q_heavy_hitters(sf_dir: str):
        """Exact top-20 word bigrams by candidate-generation + exact
        re-count — the heavy-hitter path where the full distinct-bigram
        groupby (quadratic vocabulary) would be the bottleneck; the
        shuffle is bounded by candidates-per-block."""
        from go_datax_ray.stages.sampling import heavy_hitters_bigrams

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["text"])
        return heavy_hitters_bigrams(docs, k=20)

    def q_incremental_dedup(sf_dir: str):
        """Incremental dedup of a crawl increment against a PERSISTED
        signature index over the committed corpus (stages/dedup_index):
        exact copies (+100000) die at the anti-join against the index's
        content hashes, near copies (+200000: one out-of-vocabulary word
        appended) die at the exact-Jaccard verify against the committed
        doc their LSH bucket pairs them with, fresh docs (+300000:
        per-doc unique vocabulary) survive. Deterministic because every
        corpus doc has >= 8 distinct trigrams (verified at all sfs), so
        a near copy's J = n3/(n3+1) >= 8/9 >= the 0.8 threshold, and
        the one-appended-word signature shares an LSH band with its
        original except with probability < 1e-15. Oracle = the fresh
        ids."""
        import shutil

        from go_datax_ray.stages.dedup_index import (
            build_dedup_index,
            incremental_dedup,
        )

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
        idx = "/tmp/gdr_q_dedup_idx"
        shutil.rmtree(idx, ignore_errors=True)
        build_dedup_index(docs, idx)

        def increment(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            txt = t.column("text").to_pylist()
            out_i, out_t = [], []
            for i, x in zip(ids, txt):
                out_i.append(i + 100000)
                out_t.append(x)                       # exact copy
                out_i.append(i + 200000)
                out_t.append((x or "") + " zzqq")     # near copy
                out_i.append(i + 300000)
                out_t.append(" ".join(f"u{i}w{j}" for j in range(20)))  # fresh
            return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                             "text": pa.array(out_t, pa.string())})

        inc = docs.map_batches(increment, batch_format="pyarrow")
        surv, _stats = incremental_dedup(inc, idx, docs, threshold=0.8,
                                         update_index=False)
        return surv.select_columns(["doc_id"])

    def q_token_pack(sf_dir: str):
        """GPT-style sequence packing over the corpus: concat docs in
        doc_id order, cut every 512 tokens; each doc reports its first
        and last training sequence. The distributed ordered prefix sum
        runs range-partitioned (contiguous doc_id ranges, per-range
        totals scanned once, offsets broadcast) — no global sort."""
        from go_datax_ray.stages.curation import token_pack
        from go_datax_ray.stages.text import token_stats

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

        def lens(t: pa.Table) -> pa.Table:
            n = pc.list_value_length(pc.split_pattern_regex(
                pc.utf8_trim_whitespace(pc.fill_null(t.column("text"), "")),
                pattern=r"\s+"))
            n = pc.if_else(
                pc.equal(pc.utf8_length(
                    pc.utf8_trim_whitespace(pc.fill_null(t.column("text"), ""))
                ), pa.scalar(0)),
                pa.scalar(0), n)
            return pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_tokens": n.cast(pa.int64()),
            })

        ds = docs.map_batches(lens, batch_format="pyarrow")
        return token_pack(ds, seq_len=512, range_size=128)

    def q_para_dedup(sf_dir: str):
        """INTRA-document repeated-line removal (C4/Gopher in-doc
        repetition step; zero shuffle — a doc never leaves its batch).
        Lines are synthesised as 6-word windows with the first line
        re-appended (a guaranteed in-doc duplicate); the construction
        and the first-occurrence dedup are replayed verbatim in SQL."""
        from go_datax_ray.stages.curation import dedup_lines_in_doc

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

        def to_paras(t: pa.Table) -> pa.Table:
            new, keep = [], []
            for x in t.column("text").to_pylist():
                ws = (x or "").split()
                lines = [" ".join(ws[j * 6:j * 6 + 6])
                         for j in range((len(ws) + 5) // 6)]
                if lines:
                    lines.append(lines[0])
                    new.append("\n".join(lines))
                    keep.append(True)
                else:
                    keep.append(False)
            t = t.filter(pa.array(keep))
            return t.drop_columns(["text"]).append_column(
                "text", pa.array(new, pa.string())
            )

        ds = docs.map_batches(to_paras, batch_format="pyarrow")
        ds = ds.map_batches(dedup_lines_in_doc, batch_format="pyarrow")
        return ds.select_columns(["doc_id", "text_dedup", "n_removed"])

    def q_line_dedup(sf_dir: str):
        """C4-style corpus-global duplicate-line removal. Lines are
        synthesised deterministically (8-word windows joined with \\n)
        and the corpus is doubled with a doc_id+100000 shifted copy, so
        every copied line is a duplicate: the copies must vanish
        entirely and any intra-corpus duplicate lines keep only their
        first (doc_id, line_idx) occurrence."""
        from go_datax_ray.stages.curation import line_dedup

        rd = rd_lazy()
        docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

        def to_lines(shift: int):
            def fn(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                out = []
                for x in t.column("text").to_pylist():
                    ws = (x or "").split()
                    out.append(
                        "\n".join(
                            " ".join(ws[j : j + 8]) for j in range(0, len(ws), 8)
                        )
                    )
                return pa.table(
                    {"doc_id": pa.array(ids + shift, pa.int64()),
                     "text": pa.array(out, pa.string())}
                )

            return fn

        corpus = docs.map_batches(to_lines(0), batch_format="pyarrow").union(
            docs.map_batches(to_lines(100000), batch_format="pyarrow")
        )
        return line_dedup(corpus)

    return {
        "cdc_final_state": q_cdc_final_state,
        "lww_latest_event": q_lww_latest_event,
        "cdc_lake_replay": q_cdc_lake_replay,
        "lake_point_lookup": q_lake_point_lookup,
        "flagship_final_state": q_flagship_final_state,
        "partition_histogram": q_partition_histogram,
        "dx_filter": q_dx_filter,
        "dx_substr": q_dx_substr,
        "dx_replace": q_dx_replace,
        "dx_pad": q_dx_pad,
        "dx_digest": q_dx_digest,
        "transformer_chain": q_transformer_chain,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "decontaminate": q_decontaminate,
        "gopher_quality": q_gopher_quality,
        "pii_mask": q_pii_mask,
        "line_dedup": q_line_dedup,
        "para_dedup": q_para_dedup,
        "token_pack": q_token_pack,
        "incremental_dedup": q_incremental_dedup,
        "token_count_bpe": q_token_count_bpe,
        "inverted_index": q_inverted_index,
        "tfidf_top_terms": q_tfidf_top_terms,
        "bm25_top_terms": q_bm25_top_terms,
        "stratified_sample": q_stratified_sample,
        "grouped_quantiles": q_grouped_quantiles,
        "window_rank": q_window_rank,
        "rolling_frame": q_rolling_frame,
        "first_last": q_first_last,
        "rollup_revenue": q_rollup_revenue,
        "cube_revenue": q_cube_revenue,
        "pivot_events": q_pivot_events,
        "explode_tokens": q_explode_tokens,
        "funnel": q_funnel,
        "ntile": q_ntile,
        "regex_extract": q_regex_extract,
        "url_parse": q_url_parse,
        "unpivot_lineitem": q_unpivot_lineitem,
        "mongo_query": q_mongo_query,
        "global_quantiles": q_global_quantiles,
        "url_canonicalize": q_url_canonicalize,
        "url_dedup": q_url_dedup,
        "session_ids": q_session_ids,
        "length_filter": q_length_filter,
        "windowed_topk": q_windowed_topk,
        "tpch_q1_composed": q_tpch_q1_composed,
        "group_sample": q_group_sample,
        "grouped_outliers": q_grouped_outliers,
        "lake_view": q_lake_view,
        "normalize_text": q_normalize_text,
        "cluster_histogram": q_cluster_histogram,
        "composite_join": q_composite_join,
        "ngram_commonness": q_ngram_commonness,
        "json_extract": q_json_extract,
        "windowed_distinct": q_windowed_distinct,
        "grouped_mode": q_grouped_mode,
        "set_intersect": q_set_intersect,
        "set_except": q_set_except,
        "approx_quantiles": q_approx_quantiles,
        "bloom_semi_join": q_bloom_semi_join,
        "heavy_hitters": q_heavy_hitters,
        "profile_table": q_profile_table,
        "minhash_dedup": q_minhash_dedup,
        "simhash": q_simhash,
        "embedding_neardup": q_embedding_neardup,
        "token_stats": q_token_stats,
        "char_classes": q_char_classes,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "lang_balanced_sample": q_lang_balanced_sample,
        "fingerprint": q_fingerprint,
        "token_freq": q_token_freq,
        "full_outer_join": q_full_outer_join,
        "groupby_events": q_groupby_events,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "window_tumbling": q_window_tumbling,
        "window_sliding": q_window_sliding,
        "window_session": q_window_session,
        "time_window_read": q_time_window_read,
        "topk_orders": q_topk_orders,
        "sample_k": q_sample_k,
        "distinct_event_types": q_distinct_event_types,
        "media_features": q_media_features,
        "broadcast_join": q_broadcast_join,
        "bucket_hash_join": q_bucket_hash_join,
        "skew_join": q_skew_join,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "partial_agg_revenue": q_partial_agg_revenue,
        "snapshot_diff": q_snapshot_diff,
        "hash_sample": q_hash_sample,
        "topk_per_group": q_topk_per_group,
        "approx_distinct": q_approx_distinct,
        "lineage": q_lineage,
        "tpch_q3_composed": q_tpch_q3_composed,
        "tpch_q5_composed": q_tpch_q5_composed,
        "tpch_q18_composed": q_tpch_q18,
    }


def _stopword_patterns():
    """RE2/Python-compatible stopword alternations (verified count-exact on
    this corpus, incl. accented stopwords) for the quality/lang oracles."""
    from go_datax_ray.stages.text import _STOPWORDS

    def pat(stops):
        return r"\b(?:" + "|".join(sorted(stops, key=len, reverse=True)) + r")\b"

    return pat(set().union(*_STOPWORDS.values())), {
        lang: pat(s) for lang, s in _STOPWORDS.items() if lang != "ru"
    }


def _url_canonicalize_oracle() -> str:
    """url_canonicalize oracle: same construction as the query, then the
    canonicalization rules replayed with the engine's own RE2 patterns
    (transforms.url_pattern) + list_filter/list_sort."""
    from go_datax_ray.stages.curation import _TRACKING_PARAM_RE
    from go_datax_ray.stages.transforms import url_pattern

    sch, host = url_pattern("scheme"), url_pattern("host")
    port, path, qpat = url_pattern("port"), url_pattern("path"), url_pattern("query")
    return f"""
        WITH b AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
                 || '://' || upper(source) || '.Example.COM'
                 || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                          WHEN doc_id % 4 = 1 THEN ':8443' ELSE '' END)
                 || (CASE WHEN doc_id % 7 = 0 THEN ''
                          ELSE '/Docs/' || doc_id END)
                 || (CASE WHEN doc_id % 3 = 0
                          THEN '?utm_source=mail&z=' || (doc_id % 7)
                               || '&lang=' || lang
                          ELSE '' END)
                 || (CASE WHEN doc_id % 5 = 0 THEN '#Top' ELSE '' END) AS url
          FROM documents),
        p AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url, '{sch}', 1)) AS s,
                 lower(regexp_extract(url, '{host}', 1)) AS h,
                 regexp_extract(url, '{port}', 1) AS pt,
                 regexp_extract(url, '{path}', 1) AS pa,
                 COALESCE(array_to_string(list_sort(list_filter(
                     string_split(regexp_extract(url, '{qpat}', 1), '&'),
                     x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_PARAM_RE}')
                 )), '&'), '') AS ql
          FROM b)
        SELECT doc_id, url,
               CASE WHEN h = '' THEN url ELSE
                 s || '://' || h
                 || CASE WHEN pt = '' OR (s = 'http' AND pt = '80')
                              OR (s = 'https' AND pt = '443')
                         THEN '' ELSE ':' || pt END
                 || CASE WHEN pa = '' THEN '/' ELSE pa END
                 || CASE WHEN ql = '' THEN '' ELSE '?' || ql END
               END AS canon_url
        FROM p
    """


def _url_parse_oracle() -> str:
    """url_parse oracle — the RE2 patterns come from the SAME
    transforms.url_pattern() the engine runs, so engine and oracle can
    never drift."""
    from go_datax_ray.stages.transforms import url_pattern

    host, port = url_pattern("host"), url_pattern("port")
    path, lang = url_pattern("path"), url_pattern("param:lang")
    return f"""
        WITH b AS (
          SELECT doc_id,
                 'https://' || source || '.example.com'
                 || CASE WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0 THEN ''
                         ELSE '/docs/' || doc_id END
                 || CASE WHEN doc_id % 3 = 0
                         THEN '?lang=' || lang || '&v=' || (doc_id % 5)
                         ELSE '' END AS url
          FROM documents)
        SELECT doc_id, url,
               regexp_extract(url, '{host}', 1) AS url_host,
               regexp_extract(url, '{port}', 1) AS url_port,
               regexp_extract(url, '{path}', 1) AS url_path,
               regexp_extract(url, '{lang}', 1) AS lang_param
        FROM b
    """


def oracle_sql() -> dict[str, str]:
    all_stops_pat, lang_pats = _stopword_patterns()
    lang_scores = ",\n                   ".join(
        f"len(regexp_extract_all(lower(substr(coalesce(text,''),1,2000)), '{p}')) AS s_{l}"
        for l, p in lang_pats.items()
    )
    best = "greatest(s_en,s_de,s_fr,s_es,s_pt)"
    cdc_final = """
        SELECT user_id, event_id AS lsn, ts, event_type, value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events
        ) WHERE rn = 1 AND event_type <> 'error'
    """
    return {
        "cdc_final_state": cdc_final,
        "lww_latest_event": """
            SELECT user_id, event_id AS lsn, ts, event_type, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
              FROM events
            ) WHERE rn = 1
        """,
        "cdc_lake_replay": cdc_final,
        "lake_point_lookup": f"""
            SELECT * FROM ({cdc_final}) WHERE user_id IN (1, 7, 23, 42, 99)
        """,
        "lake_view": f"""
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM ({cdc_final}) GROUP BY event_type
        """,
        "flagship_final_state": """
            WITH k AS (
              SELECT doc_id, text, lang, source,
                     1 + CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 3 AS BIGINT) AS nv,
                     (md5_number_lower('del:' || CAST(doc_id AS VARCHAR)) % 10) = 0 AS deleted
              FROM documents)
            SELECT 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(doc_id * 4 + (nv - 1) AS BIGINT) AS lsn,
                   trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text,
                   lang
            FROM k WHERE NOT deleted
        """,
        "partition_histogram": f"""
            SELECT CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % {NUM_PARTS} AS BIGINT)
                     AS part_id,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "dx_filter": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem WHERE NOT (l_quantity > 30)
        """,
        "dx_substr": "SELECT c_custkey, substr(c_name, 1, 10) AS c_name FROM customer",
        "dx_replace": (
            "SELECT p_partkey, regexp_replace(p_type, '[aeiou]', '_', 'g') AS p_type FROM part"
        ),
        # NB: engine pad leaves overlong strings unchanged (DataX semantics);
        # DuckDB lpad truncates, so the oracle guards on length.
        "dx_pad": """
            SELECT o_orderkey,
                   CASE WHEN length(o_orderpriority) >= 12 THEN o_orderpriority
                        ELSE lpad(o_orderpriority, 12, '*') END AS o_orderpriority
            FROM orders
        """,
        "dx_digest": "SELECT doc_id, md5(text) AS text FROM documents",
        "transformer_chain": """
            SELECT doc_id,
                   regexp_replace(substr(text, 1, 20), '[aeiou]', '_', 'g') AS text,
                   md5(lang) AS lang,
                   lpad(source, 8, '0') AS source,
                   n_chars
            FROM documents WHERE NOT (n_chars < 100)
        """,
        "exact_dedup": """
            SELECT doc_id, text, lang, source, n_chars FROM (
              SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
              FROM documents) WHERE rn = 1
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws
            FROM documents
        """,
        "char_classes": """
            SELECT doc_id,
                   CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS BIGINT) AS punct_chars,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_md5
            FROM documents
        """,
        "token_freq": """
            WITH t AS (
              SELECT unnest(regexp_split_to_array(lower(text), '\\W+')) AS token
              FROM documents
            )
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM t WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
        """,
        "full_outer_join": """
            WITH l AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders
                       FROM orders GROUP BY 1),
                 r AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events
                       FROM events GROUP BY 1)
            SELECT COALESCE(l.k, r.k) AS k, l.n_orders, r.n_events
            FROM l FULL OUTER JOIN r ON l.k = r.k
        """,
        # NB every SUM is wrapped CAST(... AS BIGINT): DuckDB SUM(BIGINT)
        # returns HUGEINT (surfaced float64 driver-side) while the engine
        # correctly emits int64 (VERDICT r1 finding #2).
        "groupby_events": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events GROUP BY event_type
        """,
        "ann_topk": f"""
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   CAST(row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                              e.vec_id ASC) AS BIGINT) AS rank
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {ANN_NUM_QUERIES}) q
            CROSS JOIN embeddings e
            QUALIFY rank <= {ANN_K}
        """,
        "window_tumbling": """
            SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "window_sliding": """
            SELECT user_id,
                   time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
                     AS window_start,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
            GROUP BY 1, 2
        """,
        "window_session": """
            WITH d AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sess
              FROM d
            )
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM s GROUP BY user_id, sess
        """,
        "time_window_read": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <  TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY event_type
        """,
        "sample_k": """
            SELECT doc_id, lang FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 25
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "broadcast_join": """
            SELECT o_orderkey, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "skew_join": """
            WITH l AS (
              SELECT event_id,
                     CASE WHEN user_id % 10 < 6 THEN 0
                          ELSE user_id % 500 END AS k
              FROM events
            ),
            r AS (SELECT CAST(r AS BIGINT) AS k, CAST(r * 3 AS BIGINT) AS v
                  FROM range(0, 500) t(r))
            SELECT l.event_id, l.k, r.v FROM l JOIN r USING (k)
        """,
        "bucket_hash_join": """
            SELECT l_orderkey, l_linenumber, o_orderstatus
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "semi_join": """
            SELECT event_id, user_id FROM events
            WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        """,
        "anti_join": """
            SELECT event_id, user_id FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        """,
        "asof_join": """
            WITH r AS (
              SELECT o_custkey AS user_id, o_orderdate AS ts,
                     MAX(o_totalprice) AS last_order_price
              FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, e.ts, r.last_order_price
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts >= r.ts
        """,
        "range_join": """
            WITH bands AS (
              SELECT CAST(k AS BIGINT) AS band_id, k * 10.0 AS lo, k * 10.0 + 15.0 AS hi
              FROM (SELECT unnest(range(12)) AS k)
            )
            SELECT e.event_id, b.band_id
            FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        """,
        "partial_agg_revenue": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                                 AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM lineitem GROUP BY l_returnflag
        """,
        "snapshot_diff": """
            WITH o AS (
              SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
            ), n AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.5
                          ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 5 <> 0
            )
            SELECT * FROM (
              SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
                     CASE WHEN o.o_orderkey IS NULL THEN 'I'
                          WHEN n.o_orderkey IS NULL THEN 'D'
                          WHEN o.o_totalprice <> n.o_totalprice THEN 'U' END AS op
              FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
            ) WHERE op IS NOT NULL
        """,
        "tpch_q18_composed": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   CAST(SUM(l_quantity) AS BIGINT) AS total_qty
            FROM customer, orders, lineitem
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 GROUP BY 1 HAVING SUM(l_quantity) > 212)
              AND c_custkey = o_custkey AND o_orderkey = l_orderkey
            GROUP BY 1, 2, 3, 4, 5
            ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100
        """,
        "tpch_q5_composed": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(
                        l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "tpch_q3_composed": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                                 AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey
            ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10
        """,
        "hash_sample": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE md5_number_lower(CAST(o_orderkey AS VARCHAR)) % 1000000 < 100000
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rn
              FROM orders) WHERE rn <= 2
        """,
        # int-count divisions are IEEE-exact in both engines; the regexp
        # counts were verified identical (RE2 vs Python re) on this corpus
        "quality_score": f"""
            WITH c AS (
              SELECT doc_id,
                     greatest(length(coalesce(text,'')), 1) AS nc,
                     greatest(len(regexp_extract_all(lower(coalesce(text,'')), '\\w+')), 1) AS nw,
                     len(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS n_words,
                     len(regexp_extract_all(lower(coalesce(text,'')), '\\w')) AS word_chars,
                     len(regexp_extract_all(coalesce(text,''), '[^\\w\\s]')) AS punct,
                     len(regexp_extract_all(lower(coalesce(text,'')), '{all_stops_pat}')) AS stops,
                     len(regexp_extract_all(coalesce(text,''), '[^\\W\\d_]')) AS alpha
              FROM documents)
            SELECT doc_id,
                   CAST(punct AS DOUBLE) / nc AS punct_ratio,
                   CAST(stops AS DOUBLE) / nw AS stopword_ratio,
                   CASE WHEN n_words > 0 THEN CAST(word_chars AS DOUBLE) / nw
                        ELSE 0.0 END AS mean_word_len,
                   CAST(alpha AS DOUBLE) / nc AS alpha_ratio
            FROM c
        """,
        # replicates LangId exactly: stopword-vote idxmax (first-max wins in
        # en,de,fr,es,pt order), >=2 threshold, single-hit-en special case,
        # script overrides (kana > cjk > cyrillic), empty -> unk
        "lang_id": f"""
            WITH t AS (
              SELECT doc_id, substr(coalesce(text,''),1,2000) AS smp,
                   {lang_scores}
              FROM documents)
            SELECT doc_id,
                   CASE
                     WHEN length(smp) = 0 THEN 'unk'
                     WHEN regexp_matches(smp, '[぀-ヿ]') THEN 'ja'
                     WHEN regexp_matches(smp, '[一-鿿]') THEN 'zh'
                     WHEN regexp_matches(smp, '[Ѐ-ӿ]') THEN 'ru'
                     WHEN {best} >= 2 THEN
                       CASE WHEN s_en = {best} THEN 'en'
                            WHEN s_de = {best} THEN 'de'
                            WHEN s_fr = {best} THEN 'fr'
                            WHEN s_es = {best} THEN 'es'
                            ELSE 'pt' END
                     WHEN {best} = 1 AND s_en = 1 THEN 'en'
                     ELSE 'unk'
                   END AS lang_pred
            FROM t
        """,
        # same lang_id CASE, then a deterministic per-language head-5 by
        # md5(doc_id) — DuckDB md5() emits the same lowercase hex the
        # engine hashes
        "lang_balanced_sample": f"""
            WITH t AS (
              SELECT doc_id, substr(coalesce(text,''),1,2000) AS smp,
                   {lang_scores}
              FROM documents),
            lp AS (
              SELECT doc_id,
                   CASE
                     WHEN length(smp) = 0 THEN 'unk'
                     WHEN regexp_matches(smp, '[぀-ヿ]') THEN 'ja'
                     WHEN regexp_matches(smp, '[一-鿿]') THEN 'zh'
                     WHEN regexp_matches(smp, '[Ѐ-ӿ]') THEN 'ru'
                     WHEN {best} >= 2 THEN
                       CASE WHEN s_en = {best} THEN 'en'
                            WHEN s_de = {best} THEN 'de'
                            WHEN s_fr = {best} THEN 'fr'
                            WHEN s_es = {best} THEN 'es'
                            ELSE 'pt' END
                     WHEN {best} = 1 AND s_en = 1 THEN 'en'
                     ELSE 'unk'
                   END AS lang_pred
              FROM t),
            ranked AS (
              SELECT lang_pred, doc_id,
                     row_number() OVER (PARTITION BY lang_pred
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM lp)
            SELECT lang_pred, doc_id FROM ranked WHERE rn <= 5
        """,
        # exact half is a true SQL oracle; the boolean is the HLL 5%
        # tolerance property (engine-computed, driver-hashed)
        "approx_distinct": """
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
                   TRUE AS est_within_5pct
            FROM events
        """,
        # recall-property oracle: ids from SQL, recall@k>=0.6 as a hashed
        # boolean (k-means itself is not SQL-expressible)
        "ann_ivf": f"""
            SELECT vec_id AS query_id, TRUE AS recall_ok
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ANN_NUM_QUERIES})
        """,
        # exact word-3-gram Jaccard cardinalities per successor pair:
        # DuckDB list lambdas build the same unique-trigram sets the
        # python verifier hashes (md5 is collision-free at these sizes,
        # so cardinalities agree)
        "ngram_jaccard": """
            WITH d AS (
              SELECT doc_id,
                     list_distinct(CASE
                       WHEN len(ws) = 0 THEN []
                       WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                       ELSE list_transform(range(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                     END) AS sh
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\\W+'),
                                       x -> x != '') AS ws
                    FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(a.sh) AS BIGINT) AS n_a,
                   CAST(len(b.sh) AS BIGINT) AS n_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter
            FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        """,
        # n-gram decontamination: STRING shingle intersection (the engine
        # intersects md5_lower64 hashes — equal modulo md5 collisions)
        "decontaminate": """
            WITH d AS (
              SELECT doc_id,
                     list_distinct(CASE
                       WHEN len(ws) = 0 THEN []
                       WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                       ELSE list_transform(range(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                     END) AS sh
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\\W+'),
                                       x -> x != '') AS ws
                    FROM documents)
            ),
            ev AS (SELECT DISTINCT u.s FROM d, unnest(d.sh) AS u(s)
                   WHERE doc_id % 97 = 0),
            tr AS (SELECT doc_id, u.s FROM d, unnest(d.sh) AS u(s)
                   WHERE doc_id % 97 <> 0),
            hits AS (SELECT tr.doc_id, count(*) AS n
                     FROM tr JOIN ev ON tr.s = ev.s GROUP BY 1)
            SELECT d.doc_id, CAST(len(d.sh) AS BIGINT) AS n_shingles,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
                   coalesce(h.n, 0) > 0 AS contaminated
            FROM d LEFT JOIN hits h ON h.doc_id = d.doc_id
            WHERE d.doc_id % 97 <> 0
        """,
        "stratified_sample": """
            SELECT * FROM events
            WHERE md5_number_lower(CAST(event_id AS VARCHAR)) % 1000000 <
              CASE event_type
                WHEN 'click' THEN 500000
                WHEN 'view' THEN 100000
                WHEN 'purchase' THEN 1000000
                ELSE 50000 END
        """,
        # grouped_quantiles: percentile_disc via explicit rank so the
        # definition is pinned (rank ceil(q*n) of the ascending sort)
        "grouped_quantiles": """
            WITH c AS (SELECT event_type,
                              CAST(ROUND(value*100) AS BIGINT) AS cents
                       FROM events),
            r AS (SELECT event_type, cents,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY cents) AS rn,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM c)
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   MAX(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
                       THEN cents END) AS p50_cents,
                   MAX(CASE WHEN rn = CAST(ceil(0.9*n) AS BIGINT)
                       THEN cents END) AS p90_cents,
                   MAX(CASE WHEN rn = CAST(ceil(0.99*n) AS BIGINT)
                       THEN cents END) AS p99_cents
            FROM r GROUP BY event_type
        """,
        # window_rank: rn/lag/lead use the unique event_id tiebreak;
        # rank/dense_rank order by ts alone so ties share a rank —
        # deterministic either way
        "first_last": """
            SELECT user_id,
                   (ARRAY_AGG(value ORDER BY ts, event_id))[1] AS first_value,
                   (ARRAY_AGG(value ORDER BY ts, event_id))
                     [CAST(COUNT(*) AS INTEGER)] AS last_value,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        """,
        "rolling_frame": """
            WITH b AS (
              SELECT event_id, user_id, ts,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events
            )
            SELECT event_id, user_id,
                   CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum_cents,
                   CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
                   CAST(SUM(cents) OVER w AS BIGINT)
                     / CAST(COUNT(*) OVER w AS DOUBLE) AS roll_avg_cents
            FROM b
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "window_rank": """
            SELECT event_id, user_id, ts, value,
                   CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS rn,
                   CAST(RANK() OVER w1 AS BIGINT) AS rnk,
                   CAST(DENSE_RANK() OVER w1 AS BIGINT) AS drnk,
                   LAG(value) OVER w2 AS prev_value,
                   LEAD(value) OVER w2 AS next_value,
                   PERCENT_RANK() OVER w1 AS pct_rank,
                   CUME_DIST() OVER w1 AS cume_dist
            FROM events
            WINDOW w1 AS (PARTITION BY user_id ORDER BY ts),
                   w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "rollup_revenue": """
            SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_value_cents
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_value_cents
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "pivot_events": """
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            , CAST(SUM(CASE WHEN event_type = 'click' THEN
                CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_cents
            , CAST(SUM(CASE WHEN event_type = 'error' THEN
                CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS error_cents
            , CAST(SUM(CASE WHEN event_type = 'purchase' THEN
                CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents
            , CAST(SUM(CASE WHEN event_type = 'signup' THEN
                CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup_cents
            , CAST(SUM(CASE WHEN event_type = 'view' THEN
                CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_cents
            FROM events GROUP BY user_id
        """,
        "explode_tokens": r"""
            SELECT doc_id, token FROM (
              SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
              FROM documents
            ) WHERE token <> ''
        """,
        "ntile": """
            SELECT event_id, value,
                   CAST(NTILE(4) OVER (ORDER BY value, event_id) AS BIGINT)
                     AS bucket
            FROM events
        """,
        "regex_extract": r"""
            SELECT doc_id,
                   regexp_extract(text, '^(\w+)\s+(\w+)', 2) AS second_word
            FROM documents
        """,
        "url_parse": _url_parse_oracle(),
        "url_canonicalize": _url_canonicalize_oracle(),
        "session_ids": """
            SELECT event_id, user_id, ts,
                   CAST(SUM(CASE WHEN prev_ts IS NULL
                                 OR epoch_us(ts) - epoch_us(prev_ts)
                                    > 1800 * 1000000
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS BIGINT) AS session_idx
            FROM (
              SELECT event_id, user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events)
        """,
        "url_dedup": f"""
            WITH c AS ({_url_canonicalize_oracle()})
            SELECT doc_id, canon_url FROM c
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY canon_url ORDER BY doc_id) = 1
        """,
        "mongo_query": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE lang IN ('en', 'fr') AND n_chars >= 200
        """,
        "global_quantiles": """
            SELECT 0.25 AS q, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS value FROM documents
            UNION ALL SELECT 0.5, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) FROM documents
            UNION ALL SELECT 0.75, CAST(quantile_disc(n_chars, 0.75) AS BIGINT) FROM documents
            UNION ALL SELECT 0.9, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents
        """,
        "length_filter": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.25) FROM documents)
        """,
        "unpivot_lineitem": """
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS metric, l_quantity AS value FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber,
                   'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber,
                   'l_discount', l_discount FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber,
                   'l_tax', l_tax FROM lineitem
        """,
        "windowed_topk": """
            SELECT window_start, event_type, n FROM (
              SELECT window_start, event_type, n, ROW_NUMBER() OVER (
                PARTITION BY window_start ORDER BY n DESC, event_type) rn
              FROM (
                SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                       event_type, CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
              )
            ) WHERE rn <= 3
        """,
        "tpch_q1_composed": """
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)
                AS sum_qty_cents,
              CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                AS sum_base_cents,
              CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*100)
                AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
              CAST(SUM(CAST(ROUND(((l_extendedprice*(1-l_discount))*(1+l_tax))*100)
                AS BIGINT)) AS BIGINT) AS sum_charge_cents,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "group_sample": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY md5_number_lower(CAST(o_orderkey AS VARCHAR)),
                                o_orderkey) AS rn
              FROM orders
            ) WHERE rn <= 2
        """,
        "grouped_outliers": """
            WITH c AS (
              SELECT event_id, user_id,
                     CAST(ROUND(value * 100) AS BIGINT) AS x
              FROM events),
            s AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS s,
                     CAST(sum(x * x) AS BIGINT) AS q
              FROM c GROUP BY user_id)
            SELECT event_id, user_id,
                   (CAST(n*x - s AS DOUBLE) * CAST(n*x - s AS DOUBLE))
                     > 4.0 * CAST(n*q - s*s AS DOUBLE) AS is_outlier
            FROM c JOIN s USING (user_id)
        """,
        "normalize_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(lower(nfc_normalize(text)),
                                       '\s+', ' ', 'g')) AS norm
            FROM documents
        """,
        "cluster_histogram": """
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
            FROM (
              SELECT CAST(count(*) AS BIGINT) AS cluster_size
              FROM documents GROUP BY text
            ) GROUP BY cluster_size
        """,
        "composite_join": """
            SELECT e.event_id, e.user_id, e.event_type, s.n_clicks
            FROM events e LEFT JOIN (
              SELECT user_id, event_type,
                     CAST(count(*) AS BIGINT) AS n_clicks
              FROM events WHERE event_type = 'click' GROUP BY 1, 2
            ) s USING (user_id, event_type)
        """,
        "ngram_commonness": r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS arr
              FROM documents
            ),
            bg AS (
              SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bigram
              FROM d, unnest(range(1, len(arr))) AS t(i)
            ),
            cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(c) AS BIGINT) AS commonness
            FROM bg JOIN cnt USING (bigram) GROUP BY doc_id
        """,
        "json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "windowed_distinct": """
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
            FROM events GROUP BY 1
        """,
        "grouped_mode": """
            SELECT user_id, event_type, n FROM (
              SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type) AS rn
              FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        # funnel: chained first-qualifying-event CTEs; strict > matches
        # the engine's post-frontier filter
        "funnel": """
            WITH s0 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'signup' GROUP BY user_id),
            s1 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s0 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s0.t
              GROUP BY e.user_id),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s1.t
              GROUP BY e.user_id)
            SELECT 'signup' AS step,
                   (SELECT CAST(count(*) AS BIGINT) FROM s0) AS users
            UNION ALL SELECT 'click',
                   (SELECT CAST(count(*) AS BIGINT) FROM s1)
            UNION ALL SELECT 'purchase',
                   (SELECT CAST(count(*) AS BIGINT) FROM s2)
        """,
        "set_intersect": """
            SELECT user_id, date_trunc('day', ts) AS day FROM events
            WHERE event_type = 'click'
            INTERSECT
            SELECT user_id, date_trunc('day', ts) FROM events
            WHERE event_type = 'purchase'
        """,
        "set_except": """
            SELECT user_id, date_trunc('day', ts) AS day FROM events
            WHERE event_type = 'click'
            EXCEPT
            SELECT user_id, date_trunc('day', ts) FROM events
            WHERE event_type = 'purchase'
        """,
        "profile_table": """
            SELECT 'o_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS nulls,
                   CAST(MIN(o_orderkey) AS BIGINT) AS min_v,
                   CAST(MAX(o_orderkey) AS BIGINT) AS max_v FROM orders
            UNION ALL
            SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
                   CAST(MIN(o_custkey) AS BIGINT),
                   CAST(MAX(o_custkey) AS BIGINT) FROM orders
            UNION ALL
            SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
                   CAST(MIN(LENGTH(o_orderstatus)) AS BIGINT),
                   CAST(MAX(LENGTH(o_orderstatus)) AS BIGINT) FROM orders
            UNION ALL
            SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
                   CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
                   CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
                   CAST(MIN(epoch_us(o_orderdate)) AS BIGINT),
                   CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
                   CAST(MIN(LENGTH(o_orderpriority)) AS BIGINT),
                   CAST(MAX(LENGTH(o_orderpriority)) AS BIGINT) FROM orders
        """,
        # bloom_semi_join is EXACT (bloom false positives are removed by
        # the confirm join), so the oracle is the plain semi-join
        "bloom_semi_join": """
            SELECT event_id, user_id FROM events
            WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        """,
        "heavy_hitters": r"""
            WITH toks AS (
              SELECT list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS arr
              FROM documents),
            pairs AS (
              SELECT unnest(list_transform(range(1, len(arr)),
                                           i -> arr[i] || ' ' || arr[i+1]))
                     AS bigram
              FROM toks WHERE len(arr) >= 2)
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM pairs GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """,
        # approx_quantiles: property oracle (the ann_ivf pattern) — the
        # engine evaluates the rank property in-cluster; SQL pins the
        # group set, exact counts, and all-true verdicts
        "approx_quantiles": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   true AS p50_ok, true AS p90_ok, true AS p99_ok
            FROM events GROUP BY event_type
        """,
        "inverted_index": """
            WITH pairs AS (
              SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\\W+')) AS token
                FROM documents)
              WHERE token <> '')
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                     AS postings
            FROM pairs GROUP BY token HAVING COUNT(*) >= 3
        """,
        # tfidf_top_terms: the ln() score exists only inside ORDER BY —
        # output columns are integer-exact (see q_tfidf_top_terms)
        "tfidf_top_terms": """
            WITH pairs AS (
              SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\\W+')) AS token
                FROM documents)
              WHERE token <> '' GROUP BY doc_id, token),
            dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
                    FROM pairs GROUP BY token),
            scored AS (
              SELECT p.doc_id, p.token, p.tf, d.df,
                     ROW_NUMBER() OVER (PARTITION BY p.doc_id
                       ORDER BY p.tf * ln((SELECT COUNT(*) FROM documents)::DOUBLE
                                          / d.df) DESC,
                                p.token ASC) AS rn
              FROM pairs p JOIN dfs d USING (token))
            SELECT doc_id, token, tf, df FROM scored WHERE rn <= 3
        """,
        # same integer-output discipline as tfidf: the BM25 score ranks
        # (identical literal expression both sides) but never lands in a
        # column
        "bm25_top_terms": """
            WITH pairs AS (
              SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\\W+')) AS token
                FROM documents)
              WHERE token <> '' GROUP BY doc_id, token),
            dls AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                    FROM pairs GROUP BY doc_id),
            dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
                    FROM pairs GROUP BY token),
            consts AS (SELECT (SELECT COUNT(*) FROM documents)::DOUBLE AS n,
                              (SELECT SUM(tf) FROM pairs)::DOUBLE AS ntok),
            scored AS (
              SELECT p.doc_id, p.token, p.tf, d.df, l.dl,
                     ROW_NUMBER() OVER (PARTITION BY p.doc_id
                       ORDER BY ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                                  * (p.tf * 2.2)
                                  / (p.tf + 1.2 * (0.25 + 0.75 * l.dl * c.n / c.ntok))
                                DESC,
                                p.token ASC) AS rn
              FROM pairs p JOIN dfs d USING (token)
                           JOIN dls l USING (doc_id), consts c)
            SELECT doc_id, token, tf, df, dl FROM scored WHERE rn <= 3
        """,
        "token_count_bpe": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '''(?:[sdmt]|ll|ve|re)| ?\\w+| ?[^\\s\\w]+|\\s+'))
                     AS BIGINT) AS n_tokens_bpe
            FROM documents
        """,
        # line_dedup: keep-first by packed (doc_id * 2^20 + line_idx);
        # docs rebuilt with string_agg ordered by line_idx; empty docs drop
        "incremental_dedup": """
            SELECT doc_id + 300000 AS doc_id FROM documents
        """,
        "token_pack": """
            WITH l AS (
              SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(
                       trim(coalesce(text, '')), '\\s+'), x -> x <> ''))
                       AS BIGINT) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cp
              FROM l
            )
            SELECT doc_id, n_tokens,
                   CAST(cp // 512 AS BIGINT) AS first_seq,
                   CAST(CASE WHEN n_tokens > 0 THEN (cp + n_tokens - 1) // 512
                        ELSE cp // 512 END AS BIGINT) AS last_seq
            FROM c
        """,
        "para_dedup": """
            WITH base AS (
              SELECT doc_id,
                     array_to_string(list_concat(lines, [lines[1]]), chr(10))
                       AS text
              FROM (SELECT doc_id,
                           list_transform(range(0, (len(ws) + 5) // 6),
                             j -> array_to_string(ws[j*6+1 : j*6+6], ' '))
                             AS lines
                    FROM (SELECT doc_id,
                                 list_filter(string_split_regex(text, '\\s+'),
                                             x -> x != '') AS ws
                          FROM documents))
              WHERE len(lines) >= 1
            ),
            lns AS (
              SELECT doc_id, u.i - 1 AS idx, ls[u.i] AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                    FROM base),
                   unnest(range(1, len(ls) + 1)) AS u(i)
            ),
            firsts AS (
              SELECT doc_id, idx, line,
                     row_number() OVER (PARTITION BY doc_id, line
                                        ORDER BY idx) AS rn,
                     count(*) OVER (PARTITION BY doc_id) AS total
              FROM lns
            )
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY idx)
                     FILTER (WHERE rn = 1) AS text_dedup,
                   CAST(any_value(total) - count(*) FILTER (WHERE rn = 1)
                        AS BIGINT) AS n_removed
            FROM firsts GROUP BY doc_id
        """,
        "line_dedup": """
            WITH base AS (
              SELECT doc_id, array_to_string(
                       list_transform(range(0, (len(ws) + 7) // 8),
                         j -> array_to_string(ws[j*8+1 : j*8+8], ' ')),
                       chr(10)) AS text
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\\s+'),
                                       x -> x != '') AS ws
                    FROM documents)
            ),
            corpus AS (
              SELECT doc_id, text FROM base
              UNION ALL
              SELECT doc_id + 100000, text FROM base
            ),
            lines AS (
              SELECT doc_id, u.i - 1 AS line_idx, ls[u.i] AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                    FROM corpus),
                   unnest(range(1, len(ls) + 1)) AS u(i)
            ),
            win AS (SELECT line, min(doc_id * 1048576 + line_idx) AS mpos
                    FROM lines GROUP BY 1),
            keep AS (SELECT l.doc_id, l.line_idx, l.line
                     FROM lines l JOIN win w ON w.line = l.line
                     WHERE l.doc_id * 1048576 + l.line_idx = w.mpos)
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY line_idx) AS text
            FROM keep GROUP BY doc_id
        """,
        # gopher_quality: same tokenization, integer cross-multiplied rules
        "gopher_quality": """
            WITH ws AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\W+'),
                                 x -> x != '') AS w
              FROM documents
            ),
            flat AS (SELECT doc_id, u.x AS x FROM ws, unnest(w) AS u(x)),
            agg AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_words,
                     CAST(sum(len(x)) AS BIGINT) AS n_word_chars,
                     CAST(count(DISTINCT x) AS BIGINT) AS n_distinct_words,
                     CAST(count(DISTINCT CASE WHEN x IN
                       ('join','hash','row','batch','scan','column','data','merge')
                       THEN x END) AS BIGINT) AS n_stop_words
              FROM flat GROUP BY 1
            )
            SELECT ws.doc_id,
                   coalesce(n_words, 0) AS n_words,
                   coalesce(n_word_chars, 0) AS n_word_chars,
                   coalesce(n_distinct_words, 0) AS n_distinct_words,
                   coalesce(n_stop_words, 0) AS n_stop_words,
                   coalesce(n_words, 0) BETWEEN 40 AND 100000 AS ok_word_count,
                   coalesce(n_words, 0) > 0
                     AND 3 * n_words <= n_word_chars
                     AND n_word_chars <= 10 * n_words AS ok_mean_word_len,
                   coalesce(n_words, 0) > 0
                     AND 10 * (n_words - n_distinct_words) <= 3 * n_words
                     AS ok_dup_fraction,
                   coalesce(n_stop_words, 0) >= 7 AS ok_stopwords,
                   (coalesce(n_words, 0) BETWEEN 40 AND 100000)
                     AND (coalesce(n_words, 0) > 0
                          AND 3 * n_words <= n_word_chars
                          AND n_word_chars <= 10 * n_words)
                     AND (coalesce(n_words, 0) > 0
                          AND 10 * (n_words - n_distinct_words) <= 3 * n_words)
                     AND (coalesce(n_stop_words, 0) >= 7) AS keep
            FROM ws LEFT JOIN agg USING (doc_id)
        """,
        # pii_mask: identical RE2 patterns both sides (Arrow and DuckDB
        # both run RE2); apply order email -> phone -> ip
        "pii_mask": """
            WITH synth AS (
              SELECT doc_id,
                     coalesce(text, '') || ' contact user' || doc_id ||
                     '@example.com or +1-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                     ' at 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                       AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\+?[0-9][0-9() -]{6,}[0-9]', '<PHONE>', 'g'),
                     '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g')
                     AS text
            FROM synth
        """,
        # full simhash64 replica: word hash = md5_number_lower (the engine
        # deliberately uses md5 digest[8:16] LE so DuckDB can reproduce
        # it), TF-weighted bit votes, two's-complement int64 output
        "simhash": """
            WITH words AS (
              SELECT doc_id, w FROM documents,
                unnest(string_split_regex(lower(text), '\\W+')) AS t(w)
              WHERE w != ''
            ), wc AS (
              SELECT doc_id, w, count(*)::BIGINT AS c,
                     md5_number_lower(w)::UBIGINT AS h
              FROM words GROUP BY 1, 2
            ), bits AS (
              SELECT doc_id, b AS bit,
                SUM(CASE WHEN (h >> b) & 1 = 1 THEN c ELSE -c END) AS v
              FROM wc, (SELECT unnest(range(64)) AS b) GROUP BY 1, 2
            ), agg AS (
              SELECT doc_id,
                SUM(CASE WHEN v > 0 THEN (1::HUGEINT << bit)
                         ELSE 0::HUGEINT END) AS u
              FROM bits GROUP BY 1
            )
            SELECT d.doc_id,
              COALESCE(CASE WHEN a.u >= 9223372036854775808::HUGEINT
                            THEN a.u - 18446744073709551616::HUGEINT
                            ELSE a.u END, 0)::BIGINT AS simhash
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # brute-force truth for the duplicate-seeded corpus: LSH recall on
        # exact copies is structurally 1.0 and the in-bucket verify is
        # exact cosine, so the engine's pair set must EQUAL this
        "embedding_neardup": """
            WITH base AS (SELECT vec_id, embedding FROM embeddings),
            allv AS (
              SELECT vec_id, embedding FROM base
              UNION ALL
              SELECT vec_id + (SELECT count(*) FROM base), embedding FROM base
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM allv a JOIN allv b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        # lineage replica: md5 placement hash, count-split epochs (size =
        # n//3 over the event_id order), printf'd partition/epoch file
        # names, rows = cumulative distinct keys per partition (tombstones
        # count — a delete is a row until compaction), events = epoch's
        # event count per partition; partitions appear only in epochs
        # that committed them
        "lineage": """
            WITH params AS (
              SELECT count(*) AS n, greatest(count(*) // 3, 1) AS sz FROM events
            ), ev AS (
              SELECT user_id, event_id AS lsn,
                     CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % 8
                          AS BIGINT) AS p,
                     CAST((row_number() OVER (ORDER BY event_id) - 1)
                          // (SELECT sz FROM params) AS BIGINT) AS epoch
              FROM events
            ), ep AS (
              SELECT epoch, MIN(lsn) AS lsn_lo, MAX(lsn) AS lsn_hi
              FROM ev GROUP BY 1
            ), fe AS (
              SELECT user_id, p, MIN(epoch) AS first_epoch FROM ev GROUP BY 1, 2
            ), epp AS (
              -- events = RAW event count per (epoch, partition): the
              -- engine's combiner rolls superseded rows' counts into
              -- winners (_n_ev), so the lineage metric is exact and
              -- batch-structure independent
              SELECT epoch, p, CAST(COUNT(*) AS BIGINT) AS events
              FROM ev GROUP BY 1, 2
            )
            SELECT e.epoch, ep.lsn_lo, ep.lsn_hi, e.p AS partition,
                   printf('part-%05d/part-%05d-epoch-%06d.parquet',
                          e.p, e.p, e.epoch) AS file,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM fe
                    WHERE fe.p = e.p AND fe.first_epoch <= e.epoch) AS "rows",
                   e.events
            FROM epp e JOIN ep USING (epoch)
        """,
        # media_features: the planted pixels are md5-derived (kind =
        # md5(id)%3, pixel[idx] = md5(id||'-'||idx)%256, row-major
        # (16,16,3)), so DuckDB re-derives the 8x8 mean-pool phash the
        # engine computes from DECODED PNG bytes — the oracle checks the
        # whole encode->decode->feature path (VERDICT r3 #7). Engine
        # layout: idx = r*48 + c*3 + ch; pool cell = (r//2)*8 + (c//2);
        # bit = cell gray mean > mean of the 64 cell means.
        "media_features": """
            WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range(240) t(i)),
            imgs AS (
              SELECT media_id FROM ids
              WHERE md5_number_lower(CAST(media_id AS VARCHAR)) % 3 = 0
            ),
            px AS (
              SELECT media_id, CAST(j AS BIGINT) AS idx,
                     CAST(md5_number_lower(CAST(media_id AS VARCHAR) || '-'
                          || CAST(j AS VARCHAR)) % 256 AS DOUBLE) AS v
              FROM imgs, range(768) t(j)
            ),
            cells AS (
              SELECT media_id,
                     ((idx // 48) // 2) * 8 + (((idx // 3) % 16) // 2) AS cell,
                     AVG(v) AS gray
              FROM px GROUP BY 1, 2
            ),
            gm AS (SELECT media_id, AVG(gray) AS m FROM cells GROUP BY 1)
            SELECT c.media_id,
                   CAST(SUM(CASE WHEN c.gray > g.m
                                 THEN CAST(1 AS UBIGINT) << CAST(c.cell AS INTEGER)
                                 ELSE 0 END)
                        - CAST(9223372036854775808 AS HUGEINT) AS BIGINT) AS phash
            FROM cells c JOIN gm g USING (media_id)
            GROUP BY c.media_id
        """,
        # minhash_dedup's survivor set IS SQL-derivable (the verify step
        # is exact word-3-gram Jaccard): all-pairs shingle Jaccard >= 0.7
        # over shingle-sharing pairs, transitive closure via a recursive
        # CTE (min-label propagation), keep each component's min id.
        # The engine's LSH banding only risks missing a true pair NEAR
        # the threshold; this corpus's nearest below-threshold pair is
        # J=0.067 and the weakest true pair J=0.9 (see q_minhash_dedup).
        "minhash_dedup": """
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS ws
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 3 THEN
                       list_distinct(list_transform(range(1, len(ws) - 1),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                     ELSE [] END AS sset
              FROM w),
            s AS (SELECT doc_id, unnest(sset) AS sg FROM sh),
            sizes AS (SELECT doc_id, len(sset) AS n FROM sh),
            inter AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb,
                     CAST(COUNT(*) AS BIGINT) AS ni
              FROM s a JOIN s b ON a.sg = b.sg AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            edges AS (
              SELECT ida, idb FROM inter
              JOIN sizes sa ON sa.doc_id = ida
              JOIN sizes sb ON sb.doc_id = idb
              WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.7),
            bidir AS (SELECT ida AS a, idb AS b FROM edges
                      UNION ALL SELECT idb, ida FROM edges),
            rec AS (
              WITH RECURSIVE reach(id, r) AS (
                SELECT a, a FROM bidir
                UNION
                SELECT bd.b, reach.r FROM reach
                JOIN bidir bd ON bd.a = reach.id
              ) SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
            SELECT d.doc_id FROM documents d
            LEFT JOIN rec ON rec.id = d.doc_id
            WHERE rec.id IS NULL OR rec.rep = d.doc_id
        """,
    }
