"""Flagship entry pipeline: CDC replay derived from the testdata
``documents`` table, applied through the full exactly-once lake path.

Each document deterministically expands to 1-3 versioned change events
(md5-derived version count, ~10% of documents end deleted), the event
log replays through partition -> LWW -> merge-apply -> manifest commit,
and the final lake state is returned. Every derivation rule uses
``md5_number_lower`` so the END STATE is expressible in DuckDB SQL —
the driver's oracle checks the whole engine path, not a shortcut.
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa

from ..hashing import md5_lower64
from ..pipelines.cdc_replay import DatasetEventSource, ReplayConfig, replay
from ..schema import CDC_EVENT_SCHEMA
from ..sinks.lake import read_lake
from ..synth import extract_text

_BASE_TS_US = 1672531200_000_000  # 2023-01-01T00:00:00Z
_VERSIONS_PER_DOC = 4  # lsn stride per doc (max 3 versions used)


def docs_to_events(batch: pa.Table) -> pa.Table:
    """documents row -> 1..3 CDC events (deterministic, md5-derived).

    url       = https://{source}.example.org/doc/{doc_id}
    n_versions= 1 + md5_number_lower(doc_id) % 3
    deleted   = md5_number_lower('del:' || doc_id) % 10 == 0
                (the LAST version becomes a tombstone)
    lsn       = doc_id * 4 + version ; warc_ts = base + lsn seconds
    html      = fixed template wrapping the document text; text column =
                extract_text(html) (the byte-identity invariant).
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()

    lsns, ops, urls, tss, htmls, out_texts, out_langs = [], [], [], [], [], [], []
    for did, text, lang, source in zip(doc_ids, texts, langs, sources):
        nv = 1 + md5_lower64(str(did)) % 3
        deleted = md5_lower64(f"del:{did}") % 10 == 0
        url = f"https://{source}.example.org/doc/{did}"
        for v in range(nv):
            lsn = did * _VERSIONS_PER_DOC + v
            is_last = v == nv - 1
            op = "D" if (deleted and is_last) else ("I" if v == 0 else "U")
            lsns.append(lsn)
            ops.append(op)
            urls.append(url)
            tss.append(_BASE_TS_US + lsn * 1_000_000)
            if op == "D":
                htmls.append(None)
                out_texts.append(None)
                out_langs.append(None)
            else:
                h = f"<html><body><p>{text}</p></body></html>".encode("utf-8")
                htmls.append(h)
                out_texts.append(extract_text(h))
                out_langs.append(lang)
    return pa.Table.from_pydict(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "src_offset": pa.array(lsns, pa.int64()),
            "op": pa.array(ops, pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.large_binary()),
            "text": pa.array(out_texts, pa.large_string()),
            "lang": pa.array(out_langs, pa.string()),
        },
        schema=CDC_EVENT_SCHEMA,
    )


def run_flagship(sf_dir: str, lake_dir: str, *, num_partitions: int = 16,
                 epoch_size: int = 1_000_000, fresh: bool = True):
    """Replay the document-derived event log into ``lake_dir`` and return
    (final-state Dataset, ReplayResult)."""
    import ray.data as rd

    if fresh:
        shutil.rmtree(lake_dir, ignore_errors=True)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    events = docs.map_batches(docs_to_events, batch_format="pyarrow")
    source = DatasetEventSource(events, 0, n_docs * _VERSIONS_PER_DOC)
    res = replay(
        source,
        ReplayConfig(lake_dir=lake_dir, num_partitions=num_partitions, epoch_size=epoch_size),
    )
    return read_lake(lake_dir), res
