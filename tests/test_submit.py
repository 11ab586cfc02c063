"""The north rule's literal ship path: `spark-submit --py-files
shaman_scraping_spark.zip` on a multi-executor master (local-cluster —
separate executor JVMs — in this sandbox).  The package must reach
executors through --py-files alone (no PYTHONPATH), the driver session
must inherit spark-submit's --master, and the crawl's seen set must
match the sequential oracle."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit():
    home = os.environ.get("SPARK_HOME", "/opt/spark")
    p = Path(home) / "bin" / "spark-submit"
    return p if p.exists() else None


@pytest.mark.slow
@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit")
def test_spark_submit_pyfiles_crawl(tiny_corpus, tiny_corpus_dir,
                                    tmp_path_factory):
    from shaman_scraping_spark.config import CrawlConfig
    from shaman_scraping_spark.corpus.simulator import simulate

    state = tmp_path_factory.mktemp("submit_state")
    seeds = tmp_path_factory.mktemp("submit_seeds") / "seeds.txt"
    seeds.write_text("\n".join(tiny_corpus.seeds))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "submit_crawl.py"),
         "--pages", str(tiny_corpus_dir / "pages.parquet"),
         "--seeds", str(seeds), "--state", str(state),
         "--waves", "6", "--master", "local-cluster[2,2,2048]"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=str(REPO / "tools"),  # NOT the repo root: the package must
                                  # come from the --py-files zip
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "seen-set size" in out.stdout

    # seen-set parity with the sequential oracle, read straight off
    # the committed state (no Spark needed)
    cfg = CrawlConfig(seeds=tuple(tiny_corpus.seeds), max_waves=6)
    sim = simulate(tiny_corpus, cfg)
    manifest = json.loads((state / "seen" / "latest.json").read_text())
    m = json.loads(
        (state / "seen" / f"manifest-{manifest['wave']:06d}.json")
        .read_text()
    )
    got = set()
    for d in m["data_dirs"]:
        for f in (state / "seen" / d).glob("*.parquet"):
            got.update(pq.read_table(f, columns=["url_canon"])
                       .column("url_canon").to_pylist())
    assert got == sim.seen
