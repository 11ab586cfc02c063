"""Extra benchmarks (guide §1.4): noop-sink isolation + A/B variant
timing for individual queries and crawl-engine legs.

NOT part of the driver contract — bench.py is the frozen measurement
harness; this file exists so optimization decisions in
OPTIMIZATION_r06.md cite interleaved repeated measurements instead of
single noisy runs (this VM drifts ±25-50% within the hour, see
BENCH/AB_R3R4.md).

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --reps 5 name[=variant] ...

Each listed query is timed under a noop sink; when several variants of
the same name are listed they run INTERLEAVED (a,b,a,b,...) so box
drift cannot bias the comparison.  Prints per-variant median seconds.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from shaman_scraping_spark.driver_queries import QUERIES
    from shaman_scraping_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=4 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import bench_variants  # experimental variants live next door

    def resolve(spec: str):
        if "=" in spec:
            name, var = spec.split("=", 1)
            return spec, getattr(bench_variants, f"q_{name}_{var}")
        return spec, QUERIES[spec]

    fns = [resolve(s) for s in args.names]
    # warmup: run each once, discarded
    for _, fn in fns:
        fn(spark, args.sf).write.mode("overwrite").format("noop").save()
    times: dict[str, list[float]] = {s: [] for s, _ in fns}
    for _ in range(args.reps):
        for spec, fn in fns:     # interleaved
            spark.sparkContext.setJobDescription(f"bench_extra:{spec}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            times[spec].append(time.monotonic() - t0)
    for spec, ts in times.items():
        print(f"{spec}: median {statistics.median(ts):.3f}s "
              f"min {min(ts):.3f}s all {[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
