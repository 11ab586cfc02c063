"""Measure this box's aggregate memory bandwidth vs worker count.

Why this exists (VERDICT r4 item 2 / BENCH/DECOMP.md §5): after the
per-wave fixed costs were decomposed and cut, the residual 8->32-thread
scaling inefficiency was ATTRIBUTED to the sandbox being one
shared-memory box — 32 threads compete for the same DRAM channels,
whereas the north rule's real N->4N executor scale-out multiplies
memory channels 4x.  That attribution was an argument.  This probe
makes it a measurement: if the box's aggregate triad bandwidth at 32
workers is B32 and at 8 workers is B8, then NO bandwidth-bound stage
can exceed a thread-mode scaling efficiency of B32 / (4 * B8) on this
machine, no matter how the Spark plan is shaped.

Method: K independent OS processes (no GIL, no shared JVM) each run a
NumPy triad a = b * s + c over arrays far larger than LLC, for a fixed
wall interval after a warmup pass, synchronized by a barrier.
Aggregate GB/s = sum over workers of bytes_moved / interval.  The triad
moves 24 bytes per element (read b, read c, write a); write-allocate
traffic is ignored, which is fine because it cancels in the ratio.

Usage:  python tools/membw.py [--workers 1,8,32] [--seconds 6]
Writes BENCH/MEMBW.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ELEMS = 24_000_000  # 3 float64 arrays x 192 MB/worker >> any LLC


def _worker(barrier, out, idx, seconds: float) -> None:
    import numpy as np

    rng = np.random.default_rng(idx)
    b = rng.random(ELEMS)
    c = rng.random(ELEMS)
    a = np.empty_like(b)
    np.multiply(b, 1.000001, out=a)
    a += c  # warmup: faults pages, warms caches/TLB
    barrier.wait()
    t0 = time.monotonic()
    iters = 0
    while True:
        np.multiply(b, 1.000001, out=a)
        a += c
        iters += 1
        if time.monotonic() - t0 >= seconds:
            break
    dt = time.monotonic() - t0
    # a=b*s (read b, write a) then a+=c (read a, read c, write a):
    # 5 x 8 bytes per element per iteration
    out[idx] = (iters * ELEMS * 5 * 8, dt)


def measure(workers: int, seconds: float) -> float:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(workers)
    out = ctx.Manager().dict()
    procs = [
        ctx.Process(target=_worker, args=(barrier, out, i, seconds))
        for i in range(workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return sum(by / dt for by, dt in out.values()) / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,8,32")
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    counts = [int(w) for w in args.workers.split(",")]
    results = {}
    for k in counts:
        best = max(measure(k, args.seconds) for _ in range(args.reps))
        results[k] = best
        print(f"workers={k}: {best:.1f} GB/s aggregate", flush=True)
    payload = {"aggregate_gbps": results}
    if 8 in results and 32 in results:
        ceiling = results[32] / (4 * results[8])
        payload["ceiling_eff_8_to_32"] = round(ceiling, 3)
        payload["per_worker_32_vs_1"] = (
            round(results[32] / 32 / results[1], 3) if 1 in results else None
        )
    print(json.dumps(payload), flush=True)

    lines = [
        "# BENCH/MEMBW — the box's memory-bandwidth scaling ceiling",
        "",
        "NumPy triad (`a = b*s; a += c`, 192 MB of arrays per worker,",
        f"{args.reps} reps of {args.seconds:.0f} s each, best-of) run in",
        "K independent OS processes; aggregate GB/s vs K.  This bounds the",
        "8→32-thread efficiency ANY bandwidth-bound stage can reach on",
        "this single shared-memory box, independent of the Spark plan:",
        "",
        "| workers | aggregate GB/s | per-worker GB/s |",
        "| --- | --- | --- |",
    ]
    for k in counts:
        lines.append(f"| {k} | {results[k]:.1f} | {results[k] / k:.2f} |")
    if "ceiling_eff_8_to_32" in payload:
        lines += [
            "",
            f"**Hardware ceiling** for 8→32 thread-mode scaling efficiency"
            f" of a bandwidth-bound stage: `B32 / (4 * B8)` = "
            f"**{payload['ceiling_eff_8_to_32']:.3f}**.",
            "",
            "A real N→4N executor scale-out multiplies memory channels 4×;",
            "this box cannot, so crawl efficiency measured here must be",
            "compared against this ceiling, not against 1.0.",
        ]
    md = Path(REPO, "BENCH", "MEMBW.md")
    md.write_text("\n".join(lines) + "\n")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
