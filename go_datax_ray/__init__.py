"""go_datax_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of longkeyy/go-datax
(reference at /root/reference, a reader->channel->writer batch sync tool)
as an idiomatic Ray Data streaming pipeline, re-targeted at a CDC workload:

    WAL/binlog-style change events over Common-Crawl-style web pages
    -> url-hash partition (salted for hot domains)
    -> per-key (warc_ts, lsn) last-writer-wins dedup
    -> merge-apply upsert into a partitioned Parquet lake
    -> exactly-once commit (partition-epoch manifest + atomic rename)
    -> checkpoint-resumable replay with per-partition lineage + metrics.

Nothing here calls ray.init(); the embedding process owns the Ray session.
"""

__version__ = "0.1.0"
