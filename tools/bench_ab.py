"""Interleaved A/B bench adjudication (VERDICT r4 item 3).

BENCH_r04.json's headline slipped 73.8 -> 82.6 s vs BENCH_r03.json
(crawl 107.1 -> 94.7 urls/s) with no config or bench change; the
round-4 hypothesis "epoch noise" was an inference from
BENCH/EXECUTORS_TMPFS.md's documented same-work drift, not a
measurement.  This tool settles it: two git worktrees pinned at the
round-3 and round-4 code, `bench.py` run ALTERNATELY from each in its
own fresh JVM (A/B/A/B...), same hour, same box, shared warm corpus
cache — so any epoch-level environment drift hits both arms equally
and only a real code regression can separate the medians.

Usage:
  python tools/bench_ab.py --pairs 3            # -> BENCH/AB_R3R4.md
  python tools/bench_ab.py --pairs 3 --rev-a <sha> --rev-b <sha>
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

R3 = "a5fe8f9"  # round-3 final code (BENCH_r03.json measured here)
R4 = "3add8d1"  # round-4 final code (BENCH_r04.json measured here)


def ensure_worktree(rev: str) -> Path:
    d = Path("/tmp") / f"ssspark_ab_{rev}"
    if not (d / "bench.py").exists():
        subprocess.run(
            ["git", "-C", str(REPO), "worktree", "add", "--detach",
             str(d), rev],
            check=True, capture_output=True, text=True,
        )
    return d


def run_bench(tree: Path) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=str(tree),
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"bench failed in {tree}")
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench in {tree}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--rev-a", default=R3)
    ap.add_argument("--rev-b", default=R4)
    ap.add_argument("--out", default="AB_R3R4.md")
    # within-pair run order: the box drifts slower over an epoch, so a
    # fixed A-then-B order systematically penalizes B — "ba" reverses
    # it; run half the pairs each way and combine for a balanced design
    ap.add_argument("--order", choices=("ab", "ba"), default="ab")
    args = ap.parse_args()

    trees = {args.rev_a: ensure_worktree(args.rev_a),
             args.rev_b: ensure_worktree(args.rev_b)}
    results: dict[str, list[dict]] = {args.rev_a: [], args.rev_b: []}
    t_start = time.strftime("%Y-%m-%d %H:%M:%S")
    order = (args.rev_a, args.rev_b) if args.order == "ab" \
        else (args.rev_b, args.rev_a)
    for i in range(args.pairs):
        for rev in order:
            r = run_bench(trees[rev])
            results[rev].append(r)
            print(f"pair {i} {rev}: suite {r['value']:.1f}s "
                  f"crawl {r['crawl']['wall_sec']:.1f}s "
                  f"({r['crawl']['urls_per_sec']:.1f} urls/s)",
                  flush=True)

    def med(rev, key):
        if key == "suite":
            xs = [r["value"] for r in results[rev]]
        elif key == "crawl":
            xs = [r["crawl"]["wall_sec"] for r in results[rev]]
        else:
            xs = [r["queries"][key] for r in results[rev]]
        return statistics.median(xs), min(xs), max(xs)

    keys = ["suite", "crawl", "minhash_neardup", "simhash"]
    lines = [
        "# BENCH/AB — interleaved r3-vs-r4 bench adjudication "
        "(VERDICT r4 item 3)",
        "",
        f"`bench.py` run alternately from worktrees at `{args.rev_a}` "
        f"(round-3 code) and `{args.rev_b}` (round-4 code), "
        f"{args.pairs} pairs, one fresh JVM per run, started "
        f"{t_start}, shared warm corpus cache.  Any environment epoch "
        "drift hits both arms; only a code regression separates the "
        "medians.",
        "",
        f"| metric | {args.rev_a} median (min–max) "
        f"| {args.rev_b} median (min–max) | recorded r3→r4 |",
        "| --- | --- | --- | --- |",
    ]
    recorded = {"suite": "73.8 → 82.6 s", "crawl": "56.8 → 64.2 s",
                "minhash_neardup": "3.27 → 3.80 s",
                "simhash": "3.50 → 3.82 s"}
    for k in keys:
        ma, mna, mxa = med(args.rev_a, k)
        mb, mnb, mxb = med(args.rev_b, k)
        lines.append(
            f"| {k} | {ma:.2f} ({mna:.2f}–{mxa:.2f}) "
            f"| {mb:.2f} ({mnb:.2f}–{mxb:.2f}) | {recorded.get(k, '')} |"
        )
    sa, _, _ = med(args.rev_a, "suite")
    sb, _, _ = med(args.rev_b, "suite")
    ca, _, _ = med(args.rev_a, "crawl")
    cb, _, _ = med(args.rev_b, "crawl")
    lines += [
        "",
        f"Interleaved deltas: suite {100 * (sb - sa) / sa:+.1f}%, "
        f"crawl {100 * (cb - ca) / ca:+.1f}% (recorded r3→r4 deltas "
        "were +12% / +13%).",
        "",
        "Raw runs (suite s / crawl s):",
        "",
        "```json",
        json.dumps({rev: [
            {"suite": r["value"], "crawl": r["crawl"]["wall_sec"],
             "urls_per_sec": r["crawl"]["urls_per_sec"]}
            for r in results[rev]] for rev in results}, indent=2),
        "```",
    ]
    out = REPO / "BENCH" / args.out
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
