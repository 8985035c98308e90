"""Quick co-tenant weather probe: aggregate ALU + memory bandwidth at 8
Ray workers (same kernels as bench.py's _host_probe). Idle reference on
this sandbox: ~68 GB/s membw, ~95-105 Mops ALU at 8 workers; readings
well below that mean a neighbor VM is burning the memory controllers and
bandwidth-bound bench numbers are not comparable to BASELINE.md's
idle-window records. Usage: python scripts/host_probe.py
"""
import time

import numpy as np
import ray


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    @ray.remote
    def _bw() -> float:
        a = np.ones(16 * 1024 * 1024, dtype=np.float64)
        b = np.empty_like(a)
        np.multiply(a, 1.0000001, out=b)  # untimed first-touch warmup
        t0 = time.perf_counter()
        n = 0
        while n < 3 or time.perf_counter() - t0 < 1.0:
            np.multiply(a, 1.0000001, out=b)
            n += 1
        return n * 2 * a.nbytes / (time.perf_counter() - t0) / 1e9

    @ray.remote
    def _alu(k: int) -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(k):
            x += i * i
        return k / (time.perf_counter() - t0)

    bw = sum(ray.get([_bw.remote() for _ in range(8)]))
    alu = sum(ray.get([_alu.remote(2 * 10**7) for _ in range(8)])) / 1e6
    print(f"membw_gbs={bw:.1f} alu_mops={alu:.1f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
