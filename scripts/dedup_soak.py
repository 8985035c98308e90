"""MinHash corpus-dedup soak: scale the documents table Nx, run the full
in-cluster pipeline (candidates -> distributed verify -> filter), and
report wall time, pair counts, and peak driver RSS.

The round-1 verdict's acceptance test for de-drivering the verify step:
at >=10x sf0.1 the driver RSS must stay flat (ids/edges only — no
document text on the driver), and verified_pairs at 1x must match the
pre-rewrite count.

Usage: python scripts/dedup_soak.py [multiplier] [sf_dir]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scaled_docs(sf_dir: str, mult: int):
    """documents table tiled ``mult`` times with shifted doc_ids and a
    deterministic word-level perturbation on the copies (so copies are
    NEAR-dups of the originals — the realistic web-corpus profile —
    rather than exact dups of everything)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    base = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_base = base.count()

    def make_copy(i: int):
        def shift(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy() + i * n_base
            texts = t.column("text").to_pylist()
            if i > 0:
                # drop one word per doc, position varies by copy index
                out = []
                for d, x in zip(ids, texts):
                    w = (x or "").split()
                    if len(w) > 3:
                        w.pop(int(d) % len(w))
                    out.append(" ".join(w))
                texts = out
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.large_string()
                                     if t.column("text").type == pa.large_string()
                                     else pa.string()),
                }
            )

        return base.map_batches(shift, batch_format="pyarrow")

    ds = make_copy(0)
    for i in range(1, mult):
        ds = ds.union(make_copy(i))
    # Land the scaled corpus as parquet ONCE and read from there: the
    # dedup pipeline consumes its input THREE times (signatures,
    # candidate-doc filter, loser removal), and production inputs are
    # parquet re-reads (cheap, streaming) — not re-executions of this
    # python perturbation generator. Lazy re-execution of the generator
    # tripled the soak wall and doubled driver RSS while measuring
    # nothing about the engine.
    scratch = f"/dev/shm/gdr_dedup_soak/docs_{os.path.basename(sf_dir.rstrip('/'))}_{mult}x"
    if not os.path.exists(scratch + "/_DONE"):
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
        ds.write_parquet(scratch)
        open(scratch + "/_DONE", "w").write("ok")
    import ray.data as rd

    return rd.read_parquet(scratch), n_base


def exact_loser_soak(n_docs: int, n_uniq: int) -> None:
    """VERDICT r3 acceptance: exact_dedup with >=10^6 losers removed via
    the FORCED bucketed anti-join (broadcast_limit=0) must keep driver
    RSS flat — no loser keys on the driver or in task closures."""
    import resource
    import time as _t

    import pyarrow as pa

    import ray.data as rd

    from go_datax_ray.stages.dedup import exact_dedup

    def gen_np(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("id").to_numpy()
        uniq = (ids % n_uniq).astype(np.int64)
        texts = np.char.add("document body ", uniq.astype(str))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
        )

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    ds = rd.range(n_docs, override_num_blocks=64).map_batches(
        gen_np, batch_format="pyarrow"
    )
    t0 = _t.perf_counter()
    out = exact_dedup(ds, broadcast_limit=0)
    n_out = out.count()
    wall = _t.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(
        json.dumps(
            {
                "metric": "exact_dedup_loser_soak",
                "docs_in": n_docs,
                "docs_out": n_out,
                "losers_removed": n_docs - n_out,
                "wall_sec": round(wall, 2),
                "driver_peak_rss_mb": round(rss1 / 1024, 1),
                "driver_rss_growth_mb": round((rss1 - rss0) / 1024, 1),
                "path": "bucketed anti-join (broadcast_limit=0)",
            }
        )
    )


def incremental_soak(mult: int, sf_dir: str) -> None:
    """Incremental-dedup scale probe: index a mult-x committed corpus
    once, then dedup a base-sized increment (half near-dups of committed
    docs, half fresh) against it, and compare against the full
    recompute over committed ∪ increment. The incremental path must (a)
    not re-hash the committed corpus (wall ≪ full recompute) and (b)
    keep driver RSS in the ids/edges class."""
    import shutil

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from go_datax_ray.stages.dedup import minhash_dedup_corpus
    from go_datax_ray.stages.dedup_index import build_dedup_index, incremental_dedup

    # committed corpus = mult-x tiles made UNIQUE (every 3rd word
    # replaced with a copy-unique token -> trigram Jaccard between
    # copies ~0.2, far under threshold): a real committed corpus is
    # already deduped; the near-dup tiling of the main soak would make
    # every increment doc collide with ~mult committed tiles and
    # measure the generator's pathology, not the engine
    base_docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"])
    n_base = base_docs.count()

    def uniq_copy(i: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy() + i * n_base
            out = []
            for d, x in zip(ids, t.column("text").to_pylist()):
                w = (x or "").split()
                if i > 0:
                    for p in range(0, len(w), 3):
                        w[p] = f"c{i}p{p}"
                out.append(" ".join(w))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(out, pa.string())})
        return base_docs.map_batches(fn, batch_format="pyarrow")

    scratch = f"/dev/shm/gdr_dedup_soak/uniq_{os.path.basename(sf_dir.rstrip('/'))}_{mult}x"
    if not os.path.exists(scratch + "/_DONE"):
        ds = uniq_copy(0)
        for i in range(1, mult):
            ds = ds.union(uniq_copy(i))
        shutil.rmtree(scratch, ignore_errors=True)
        ds.write_parquet(scratch)
        open(scratch + "/_DONE", "w").write("ok")
    committed = rd.read_parquet(scratch)
    n_committed = n_base * mult

    def make_inc(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        out_i, out_t = [], []
        for d, x in zip(ids, texts):
            if d % 2 == 0:  # near-dup of a committed doc: drop one word
                w = (x or "").split()
                if len(w) > 3:
                    w.pop((int(d) // 2) % len(w))
                out_i.append(int(d) + 10_000_000)
                out_t.append(" ".join(w))
            else:  # fresh: per-doc unique vocabulary
                out_i.append(int(d) + 20_000_000)
                out_t.append(" ".join(f"inc{d}w{j}" for j in range(40)))
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    inc = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"]).map_batches(
        make_inc, batch_format="pyarrow"
    ).materialize()

    idx = "/dev/shm/gdr_dedup_soak/idx"
    shutil.rmtree(idx, ignore_errors=True)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    build_dedup_index(committed, idx)
    t_index = time.perf_counter() - t0

    t0 = time.perf_counter()
    surv, stats = incremental_dedup(inc, idx, committed, threshold=0.7,
                                    update_index=False)
    t_inc = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    t0 = time.perf_counter()
    _full, full_stats = minhash_dedup_corpus(committed.union(inc), threshold=0.7)
    n_full = _full.count()
    t_full = time.perf_counter() - t0
    print(json.dumps({
        "metric": "incremental_dedup_soak",
        "committed_docs": n_committed,
        "increment_docs": inc.count(),
        "index_build_sec": round(t_index, 2),
        "incremental_sec": round(t_inc, 2),
        "full_recompute_sec": round(t_full, 2),
        "speedup_vs_full": round(t_full / t_inc, 2),
        "survivors": stats.get("survivors"),
        "full_survivors": n_full,
        "driver_rss_growth_mb": round((rss1 - rss0) / 1024, 1),
        **{f"inc_{k}": v for k, v in stats.items() if k != "survivors"},
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--exact-losers":
        import ray

        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
        n_uniq = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
        exact_loser_soak(n_docs, n_uniq)
        ray.shutdown()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        import ray

        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        incremental_soak(mult, sf_dir)
        ray.shutdown()
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from go_datax_ray.stages.dedup import minhash_dedup_corpus

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    ds, n_base = scaled_docs(sf_dir, mult)
    t0 = time.perf_counter()
    deduped, stats = minhash_dedup_corpus(ds, threshold=0.7)
    n_out = deduped.count()
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(
        json.dumps(
            {
                "metric": "minhash_dedup_soak",
                "multiplier": mult,
                "docs_in": n_base * mult,
                "docs_out": n_out,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_base * mult / wall, 1),
                "driver_peak_rss_mb": round(rss1 / 1024, 1),
                "driver_rss_growth_mb": round((rss1 - rss0) / 1024, 1),
                **stats,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
