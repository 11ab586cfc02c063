"""Produce the committed golden fixtures (FIXTURES.md §B.4) from the
deterministic corpus + the sequential oracle simulator — pure Python,
no Spark.  Commit the outputs under tests/goldens/ so future rounds
detect behavioral drift even if the simulator itself changes.

Usage: python tools/make_goldens.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from shaman_scraping_spark.config import CrawlConfig  # noqa: E402
from shaman_scraping_spark.corpus.generator import TINY, generate_corpus  # noqa: E402
from shaman_scraping_spark.corpus.simulator import simulate  # noqa: E402
from shaman_scraping_spark.functions.url import canonicalize_url_py  # noqa: E402

GOLDEN_WAVES = 6


def golden_config(corpus) -> CrawlConfig:
    """THE pinned config for golden equality (must match
    tests/test_goldens.py)."""
    return CrawlConfig(
        seeds=tuple(corpus.seeds), max_waves=GOLDEN_WAVES,
        wave_seconds=10.0, bucket_cap=100.0, max_depth=16,
    )


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "tests" / "goldens"
    out.mkdir(parents=True, exist_ok=True)
    corpus = generate_corpus(TINY)
    sim = simulate(corpus, golden_config(corpus))

    w, r, u, d, h = zip(*sim.emissions)
    pq.write_table(
        pa.table({"wave": list(w), "emit_rank": list(r), "url": list(u),
                  "depth": list(d), "host": list(h)}),
        out / "golden_emission.parquet",
    )
    pq.write_table(
        pa.table({"url_canon": sorted(sim.seen)}),
        out / "golden_seen.parquet",
    )
    hq, wq, qq, eq = zip(*sim.quota_log)
    pq.write_table(
        pa.table({"host": list(hq), "wave": list(wq), "quota": list(qq),
                  "emitted": list(eq)}),
        out / "golden_quota.parquet",
    )
    wv, uu, bb = zip(*sim.wave_totals)
    pq.write_table(
        pa.table({"wave": list(wv), "urls_emitted": list(uu),
                  "bytes_fetched": list(bb)}),
        out / "golden_wave_totals.parquet",
    )
    # sanity: every emitted url canonicalizes to itself (already canonical)
    assert all(canonicalize_url_py(x) == x for x in u)
    print(f"goldens written to {out}: {len(u)} emissions, "
          f"{len(sim.seen)} seen, {len(hq)} quota rows")


if __name__ == "__main__":
    main()
