"""streamreader: synthetic typed generator -> Dataset.

Mirrors /root/reference/plugins/reader/streamreader/stream_reader.go:
N slices (channel) x sliceRecordCount rows; per column either a constant
``value`` or a random value by type — randInt 0..1e6, random float,
random date within the past year, random 5-20-char strings (:150-249).
The reference seeds with wall-clock (:99-104); ours derives every value
from splitmix64(seed, row index) so output is deterministic and
batch-boundary independent.
"""

from __future__ import annotations

import string
from typing import Any

import numpy as np
import pyarrow as pa

from ..hashing import mix_streams, uniform01
from ..stages.render import strings_to_typed

_CHARS = np.array(list(string.ascii_letters + string.digits))
_BASE_TS_US = 1704067200_000_000  # 2024-01-01; "past year" anchor, fixed for determinism


def gen_column(indices: np.ndarray, cfg: dict[str, Any], col_id: int, seed: int) -> pa.Array:
    ctype = cfg.get("type", "string")
    n = len(indices)
    if "value" in cfg:
        const = pa.array([str(cfg["value"])] * n, pa.string())
        return strings_to_typed(const, ctype, cfg.get("format", ""))
    stream = 1000 + col_id
    if ctype == "long":
        vals = (mix_streams(indices, seed, stream) % np.uint64(1_000_001)).astype(np.int64)
        return pa.array(vals, pa.int64())
    if ctype == "double":
        return pa.array(uniform01(indices, seed, stream) * 1e6, pa.float64())
    if ctype in ("bool", "boolean"):
        return pa.array(uniform01(indices, seed, stream) < 0.5, pa.bool_())
    if ctype == "date":
        offs = (mix_streams(indices, seed, stream) % np.uint64(365 * 86400)).astype(np.int64)
        return pa.array(_BASE_TS_US - offs * 1_000_000, pa.timestamp("us"))
    if ctype == "bytes":
        lens = 5 + (mix_streams(indices, seed, stream) % np.uint64(16)).astype(np.int64)
        seeds = mix_streams(indices, seed, stream + 5000)
        out = []
        for ln, sd in zip(lens, seeds):
            sub = mix_streams(np.arange(ln, dtype=np.uint64), int(sd) & 0x7FFFFFFF, 1)
            out.append(bytes((sub % np.uint64(256)).astype(np.uint8).tobytes()))
        return pa.array(out, pa.binary())
    # string: 5-20 chars
    lens = 5 + (mix_streams(indices, seed, stream) % np.uint64(16)).astype(np.int64)
    seeds = mix_streams(indices, seed, stream + 5000)
    out = []
    for ln, sd in zip(lens, seeds):
        sub = mix_streams(np.arange(ln, dtype=np.uint64), int(sd) & 0x7FFFFFFF, 2)
        out.append("".join(_CHARS[(sub % np.uint64(len(_CHARS))).astype(np.int64)]))
    return pa.array(out, pa.string())


def read(param: dict[str, Any], *, channel: int = 1, seed: int = 42):
    """Dataset for a streamreader parameter block: channel x sliceRecordCount
    rows, columns named column_0..n-1."""
    import ray.data as rd

    columns = param["column"]
    total = int(param.get("sliceRecordCount", 1000)) * max(channel, 1)

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy().astype(np.uint64)
        return pa.table(
            {
                f"column_{ci}": gen_column(idx, cfg, ci, seed)
                for ci, cfg in enumerate(columns)
            }
        )

    return rd.range(total, override_num_blocks=max(channel, 1)).map_batches(
        gen, batch_format="pyarrow", batch_size=8192
    )
