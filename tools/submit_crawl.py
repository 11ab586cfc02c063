"""The ship path named by BASELINE.json's north rule: run the crawl
via ``spark-submit --py-files shaman_scraping_spark.zip`` on a
multi-executor master.

Builds the package zip, writes a thin launcher, and execs spark-submit
so the engine runs EXACTLY the way a cluster deployment runs it — the
package reaches executors through --py-files (not PYTHONPATH), and the
driver session inherits spark-submit's --master.

Usage (sandbox evidence run; any spark master works):
  python tools/submit_crawl.py --pages /path/pages.parquet \
      --seeds /path/seeds.txt --state /path/state \
      --master 'local-cluster[2,4,4096]' [-- extra cli args...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "shaman_scraping_spark"

LAUNCHER = """\
import sys

from shaman_scraping_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
"""


def build_zip(out_dir: Path) -> Path:
    """Package zip for --py-files (source files only, no caches)."""
    zpath = out_dir / "shaman_scraping_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(PKG.rglob("*.py")):
            zf.write(f, f.relative_to(REPO))
    return zpath


def spark_submit_bin() -> str:
    home = os.environ.get("SPARK_HOME", "/opt/spark")
    cand = Path(home) / "bin" / "spark-submit"
    return str(cand) if cand.exists() else "spark-submit"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument("--waves", type=int, default=20)
    ap.add_argument("--emission-log", action="store_true")
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args(argv)

    tmp = Path(tempfile.mkdtemp(prefix="ssspark_submit_"))
    zpath = build_zip(tmp)
    launcher = tmp / "main.py"
    launcher.write_text(LAUNCHER)
    cmd = [
        spark_submit_bin(),
        "--master", args.master,
        "--py-files", str(zpath),
        # the same payload-aware defaults session.py sets; explicit
        # here because spark-submit owns the session bootstrap
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=1024",
        "--conf", "spark.sql.shuffle.partitions=16",
        str(launcher), "crawl",
        "--pages", args.pages, "--seeds", args.seeds,
        "--state", args.state, "--waves", str(args.waves),
        # the launcher's session must inherit spark-submit's master
        "--master", "submit",
    ]
    if args.emission_log:
        cmd.append("--emission-log")
    cmd += args.rest
    print(" ".join(cmd), flush=True)
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
