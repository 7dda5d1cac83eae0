"""Raw multiprocessing scaling probe: same total sketch work split over
8 vs 32 worker processes. Separates hardware/memory effects from Spark."""
import multiprocessing as mp
import sys
import time


def work(seed):
    import numpy as np
    from algebird_spark.sketches import (CMS, HLL, KLL, BloomFilter,
                                         MultiSketch, TDigest)
    rng = np.random.default_rng(seed)
    m = MultiSketch({"hll": HLL(14),
                     "cms": CMS(0.001, 1e-6, heavy_hitters_pct=0.001),
                     "kll": KLL(200), "tdigest": TDigest(200),
                     "bloom": BloomFilter(300_000, 0.01)})
    for _ in range(4):
        m.update_batch(rng.integers(0, 1_000_000, size=1_250_000, dtype=np.int64))
    return 1


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    TOTAL = 32  # 32 tasks x 5M tokens
    for procs in (8, 32):
        t0 = time.time()
        with mp.get_context("fork").Pool(procs) as pool:
            pool.map(work, range(TOTAL))
        el = time.time() - t0
        print(f"procs={procs}: {el:.1f}s -> {TOTAL*5_000_000/el/1e6:.1f} M tok/s")
