"""TableIO — snapshot tables with atomic manifest commits.

The design target is Iceberg (``df.writeTo(name).append()`` /
time-travel to a wave snapshot, as BASELINE.json's north_star names);
no Iceberg runtime jar exists in this sandbox (SURVEY.md §0), so this
seam reproduces the semantics the engine relies on over plain parquet:

  * **atomic snapshot commit per wave** — data files are written to a
    versioned directory, then a JSON manifest is renamed into place
    (``os.rename`` is atomic on POSIX).  A reader never observes a
    half-written snapshot; a killed writer leaves the previous manifest
    intact → resume-safe (SURVEY.md §2A op 5).
  * **time travel** — every wave's manifest is kept
    (``manifest-<wave>.json``); ``latest`` is a pointer file.
  * **write-read barrier** — each wave reads back the files it wrote,
    truncating DataFrame lineage across iterations (the known Spark
    iterative-algorithm failure mode, SURVEY.md §4).

Swapping to real Iceberg on a cluster is one code path:
``spark.read.format("iceberg")`` + ``writeTo`` in place of the
parquet+manifest pair below.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Versioned snapshot tables rooted at *root* (one subdir per table).

    ``table_format="iceberg"`` dispatches to real Iceberg tables
    (``writeTo(...).append()`` / ``VERSION AS OF``) under the catalog
    named by *iceberg_catalog* — the documented one-line swap for
    clusters that ship the Iceberg runtime jar.  The sandbox has no
    such jar (SURVEY.md §0), so that branch is import-guarded and its
    test skips unless the catalog class is present.
    """

    def __init__(self, spark: SparkSession, root: str | Path,
                 table_format: str = "parquet",
                 iceberg_catalog: str = "crawl"):
        if table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported table_format: {table_format}")
        self.spark = spark
        self.table_format = table_format
        self.iceberg_catalog = iceberg_catalog
        if table_format == "iceberg":
            jvm_has = spark.conf.get(
                f"spark.sql.catalog.{iceberg_catalog}", None
            )
            if not jvm_has:
                raise RuntimeError(
                    f"table_format='iceberg' needs spark.sql.catalog."
                    f"{iceberg_catalog} configured (Iceberg runtime jar "
                    "+ catalog conf on the cluster)"
                )
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # --- iceberg dispatch (cluster path; jar-gated) --------------------------

    def _iceberg_name(self, table: str) -> str:
        return f"{self.iceberg_catalog}.crawl_{table}"

    @staticmethod
    def _iceberg_manifest_obj(table: str, wave: int, mode: str,
                              snap, parent, summary: dict) -> dict:
        """Pure manifest-bookkeeping kernel for the Iceberg branch —
        snapshot-id chaining + num_rows extraction from the snapshot
        summary — factored out so it is unit-testable without the
        runtime jar (VERDICT r3 item 8): a cluster swap then fails
        loudly only on real Iceberg behavior, never on this logic."""
        n_key = "added-records" if mode == "append" else "total-records"
        num_rows = int(summary[n_key]) if summary.get(n_key) else 0
        return {"table": table, "wave": wave, "mode": mode,
                "iceberg_snapshot_id": snap,
                "iceberg_parent_snapshot_id": parent,
                "num_rows": num_rows}

    def _commit_iceberg(self, table: str, df: DataFrame, wave: int,
                        mode: str) -> None:
        name = self._iceberg_name(table)
        writer = df.writeTo(name)
        if mode == "append" and self.spark.catalog.tableExists(name):
            writer.append()
        else:
            writer.createOrReplace()
        # snapshot-id ↔ wave mapping for time travel; parent id bounds
        # the incremental read that load_delta() issues; num_rows comes
        # from the snapshot summary, so callers never need a Spark
        # count() job — same contract as the parquet branch
        snap, parent, summary = self.spark.sql(
            f"SELECT snapshot_id, parent_id, summary FROM {name}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()[0]
        self._atomic_write_json(
            self._manifest_path(table, wave),
            self._iceberg_manifest_obj(table, wave, mode, snap, parent,
                                       summary),
        )
        self._atomic_write_json(self._latest_pointer(table), {"wave": wave})

    def _load_iceberg(self, table: str, wave: int | None) -> DataFrame | None:
        m = self.read_manifest(table, wave)
        if m is None:
            return None
        snap = m["iceberg_snapshot_id"]
        return (
            self.spark.read.option("snapshot-id", snap)
            .table(self._iceberg_name(table))
        )

    @staticmethod
    def _delta_read_options(snap, parent) -> dict:
        """Reader options for "rows committed AT this snapshot" (pure,
        unit-tested without the jar).  Iceberg REJECTS end-snapshot-id
        without start-snapshot-id, so the table's first commit (parent
        None — e.g. 'fetched' at wave 0) must read the snapshot in
        full instead: its entire contents ARE the delta (ADVICE r3)."""
        if parent is None:
            return {"snapshot-id": snap}
        return {"start-snapshot-id": parent, "end-snapshot-id": snap}

    def _load_delta_iceberg(self, table: str, wave: int) -> DataFrame | None:
        """Only the rows committed AT *wave*: an Iceberg incremental
        read bounded by (parent snapshot, wave snapshot], or a full
        snapshot read at the table's first commit.  Append-only
        snapshots only — exactly the tables load_delta is used on."""
        m = self.read_manifest(table, wave)
        if m is None:
            return None
        reader = self.spark.read.format("iceberg")
        for k, v in self._delta_read_options(
            m["iceberg_snapshot_id"], m.get("iceberg_parent_snapshot_id")
        ).items():
            reader = reader.option(k, v)
        return reader.load(self._iceberg_name(table))

    # --- bucketed append tables (the 10^10-row anti-join layout) -------------

    def _bucketed_name(self, table: str) -> str:
        import hashlib

        key = hashlib.md5(str(self.root.resolve()).encode()).hexdigest()[:10]
        return f"ssspark_{key}_{table}"

    def commit_bucketed(self, table: str, df: DataFrame, wave: int,
                        n_buckets: int, cols: list[str]) -> None:
        """Append-mode commit into a wave-partitioned, (*cols*)-bucketed
        catalog table instead of a plain data dir.

        Why: a plain append table SHUFFLES its whole accumulated row set
        into every equi-join against it — at a 10^10-row seen set that
        shuffle dominates the wave.  Files laid out as
        ``data/__wave=N/bucket_files`` give (a) the same per-wave
        atomicity as the dir layout — a crashed wave's partition is
        invisible because every read filters ``__wave <=`` the last
        MANIFESTED wave, and an idempotent re-run deletes the partial
        partition before re-appending — and (b) an exchange-free seen
        side in every SMJ anti-join (bucket spec == join key, verified
        by plan test).  The cluster analogue is an Iceberg table with a
        bucket partition transform.
        """
        name = self._bucketed_name(table)
        tdir = self._tdir(table)
        data = tdir / "data"
        part_dir = data / f"__wave={wave}"
        if part_dir.exists():
            # idempotent re-run of a crashed (un-manifested) wave
            import shutil
            shutil.rmtree(part_dir)
            if self.spark.catalog.tableExists(name):
                self.spark.sql(f"REFRESH TABLE {name}")
        from pyspark.sql import functions as F

        # repartition on the bucket cols first: each writer task then
        # holds exactly one bucket's rows → one file per bucket per
        # wave (bucketBy's hash == repartition's Murmur3)
        out = df.withColumn("__wave", F.lit(wave)) \
            .repartition(n_buckets, *cols)
        writer = (
            out.write.mode("append").partitionBy("__wave")
            .bucketBy(n_buckets, *cols).sortBy(*cols)
            .option("path", str(data))
        )
        self._ensure_bucketed_table(table, df, n_buckets, cols)
        writer.saveAsTable(name)
        num_rows = self._dir_row_count(part_dir) if part_dir.exists() else 0
        self._atomic_write_json(
            self._manifest_path(table, wave),
            {"table": table, "wave": wave, "mode": "append",
             "bucketed": {"name": name, "n_buckets": n_buckets,
                          "cols": cols},
             "num_rows": num_rows,
             "snapshot_id": uuid.uuid5(
                 uuid.NAMESPACE_URL, f"{table}/{wave}").hex},
        )
        self._atomic_write_json(self._latest_pointer(table), {"wave": wave})

    def _ensure_bucketed_table(self, table: str, df: DataFrame,
                               n_buckets: int, cols: list[str]) -> None:
        """Re-register the catalog entry for an on-disk bucketed layout
        (a resumed crawl in a fresh session has files but no catalog)."""
        name = self._bucketed_name(table)
        data = self._tdir(table) / "data"
        if self.spark.catalog.tableExists(name) or not data.exists():
            return
        col_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
        ) + ", `__wave` int"
        sort_ddl = ", ".join(cols)
        self.spark.sql(
            f"CREATE TABLE {name} ({col_ddl}) USING parquet "
            f"PARTITIONED BY (__wave) "
            f"CLUSTERED BY ({sort_ddl}) SORTED BY ({sort_ddl}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{data}'"
        )
        self.spark.sql(f"ALTER TABLE {name} RECOVER PARTITIONS")

    def _load_bucketed(self, table: str, m: dict,
                       wave: int) -> DataFrame:
        name = m["bucketed"]["name"]
        if not self.spark.catalog.tableExists(name):
            df = self.spark.read.parquet(
                str(self._tdir(table) / "data")
            ).drop("__wave")
            self._ensure_bucketed_table(
                table, df, m["bucketed"]["n_buckets"],
                m["bucketed"]["cols"],
            )
        from pyspark.sql import functions as F

        return (
            self.spark.table(name)
            .where(F.col("__wave") <= F.lit(wave))
            .drop("__wave")
        )

    # --- manifest plumbing -------------------------------------------------

    def _tdir(self, table: str) -> Path:
        d = self.root / table
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _manifest_path(self, table: str, wave: int) -> Path:
        return self._tdir(table) / f"manifest-{wave:06d}.json"

    def _latest_pointer(self, table: str) -> Path:
        return self._tdir(table) / "latest.json"

    def commit(self, table: str, df: DataFrame, wave: int,
               mode: str = "snapshot") -> None:
        """Write *df* as the snapshot of *table* at *wave*, atomically.

        mode="snapshot": this wave's data IS the table state (frontier,
        host_state, seen).  mode="append": table state is the union of
        all waves' data dirs up to this wave (fetched, lineage) — the
        WARC-archive append-only pattern.
        """
        if self.table_format == "iceberg":
            self._commit_iceberg(table, df, wave, mode)
            return
        import os as _os
        import sys as _sys
        import time as _time

        profile = _os.environ.get("SSSPARK_PROFILE") == "1"
        t0 = _time.monotonic()
        tdir = self._tdir(table)
        data_dir = tdir / f"data-{wave:06d}"
        df.write.mode("overwrite").parquet(str(data_dir))
        t1 = _time.monotonic()
        num_rows = self._dir_row_count(data_dir)
        if profile:
            print(f"[tableio {table}/{wave}] write: {t1 - t0:.2f}s "
                  f"count: {_time.monotonic() - t1:.2f}s",
                  file=_sys.stderr, flush=True)

        if mode == "append":
            # chain from the newest manifest *strictly before* this wave —
            # never "latest" — so an idempotent re-run of a crashed wave
            # overwrites its own delta instead of double-appending it
            prev = self._newest_manifest_before(table, wave)
            dirs = (prev["data_dirs"] if prev else []) + [data_dir.name]
        else:
            dirs = [data_dir.name]
        manifest = {
            "table": table,
            "wave": wave,
            "mode": mode,
            "data_dirs": dirs,
            # the table's TRUE column list: an append chain can mix
            # plain dirs with commit_multi superset dirs, and parquet
            # schema inference over such a mix can leak a foreign
            # group column (e.g. partition_id into seen) when the
            # NEWEST manifest came from a plain commit — recording
            # columns on EVERY manifest makes load()'s projection
            # unconditional
            "columns": list(df.columns),
            # rows written AT this wave (the delta for append tables,
            # the whole snapshot otherwise) — read driver-side from the
            # parquet footers, so callers never need a Spark count()
            # job (the r1 wave loop burned an isEmpty() + a collect()
            # action per wave on exactly this information)
            "num_rows": num_rows,
            "snapshot_id": uuid.uuid5(
                uuid.NAMESPACE_URL, f"{table}/{wave}"
            ).hex,
        }
        self._atomic_write_json(self._manifest_path(table, wave), manifest)
        self._atomic_write_json(self._latest_pointer(table), {"wave": wave})

    def commit_multi(self, parts: list[tuple[str, DataFrame, str, int]],
                     group_wave: int) -> None:
        """Commit several tables' wave data in ONE Spark job.

        *parts* is ``[(table, df, mode, wave), ...]`` with the same
        semantics as per-table :meth:`commit` calls (waves may differ
        per part — e.g. lineage commits at the executing wave while
        seen/frontier commit their wave+1 inputs); *group_wave* names
        the shared data directory.  Why: the end-of-wave state
        commits (lineage/seen/frontier/host_state, + quota_log/emission
        under record_emission) are independent writes of mostly-small
        DataFrames, so their wall cost is dominated by per-JOB fixed
        cost — driver scheduling, commit protocol, Py4J round-trips —
        not by data.  Running them as concurrent jobs (the r1→r4
        design) still pays that fixed cost once per table per wave;
        at 1000-executor scale the per-wave driver latency is the one
        term that does NOT shrink with cluster size (BENCH/DECOMP.md
        §5).  This folds them into one job: every part's rows are
        written through a single ``partitionBy("__table")`` sink under
        ``root/_multi/data-<wave>``, and each table's manifest then
        points at its partition subdirectory via a relative path — the
        manifest chain, atomicity and resume semantics are IDENTICAL
        to per-table commits (twin-tested).

        Mechanics:
        * the union needs one superset schema; each part contributes
          its own columns and nulls for the others'.  Same-named
          columns must agree on type across parts (checked) — true for
          the engine's state tables by construction.
        * written files therefore carry superset columns (all-null for
          foreign fields, ~free in parquet); each manifest records the
          table's TRUE column list and readers project to it, so
          schema-on-read is unchanged.
        * a part with zero rows writes no partition directory
          (dynamic-partition write); it falls back to a plain
          :meth:`commit` — schema preserved, cost one tiny job, rare
          at steady state.
        * crash/idempotency: the multi dir is overwritten whole on a
          wave re-run, and manifests chain from waves strictly before
          this one, exactly as :meth:`commit` does.
        """
        from pyspark.sql import functions as F

        # superset schema: first-seen order, types must agree
        super_fields: dict[str, str] = {}
        for table, df, _mode, _w in parts:
            for f in df.schema.fields:
                ddl = f.dataType.simpleString()
                prev = super_fields.get(f.name)
                if prev is not None and prev != ddl:
                    raise ValueError(
                        f"commit_multi: column {f.name!r} has type {ddl} "
                        f"in {table!r} but {prev} in an earlier part"
                    )
                super_fields.setdefault(f.name, ddl)
        frames = []
        for table, df, _mode, _w in parts:
            have = set(df.columns)
            cols = [
                F.col(n) if n in have else F.lit(None).cast(t).alias(n)
                for n, t in super_fields.items()
            ]
            frames.append(df.select(*cols).withColumn(
                "__table", F.lit(table)))
        unioned = frames[0]
        for fr in frames[1:]:
            unioned = unioned.unionByName(fr)
        multi_dir = self.root / "_multi" / f"data-{group_wave:06d}"
        (
            unioned.write.mode("overwrite")
            .partitionBy("__table")
            .parquet(str(multi_dir))
        )
        for table, df, mode, wave in parts:
            part_dir = multi_dir / f"__table={table}"
            if not part_dir.exists():
                # empty delta: dynamic-partition write emitted nothing —
                # plain commit preserves the exact schema at ~no cost
                self.commit(table, df, wave, mode=mode)
                continue
            rel = os.path.relpath(part_dir, self._tdir(table))
            if mode == "append":
                prev = self._newest_manifest_before(table, wave)
                dirs = (prev["data_dirs"] if prev else []) + [rel]
            else:
                dirs = [rel]
            self._atomic_write_json(
                self._manifest_path(table, wave),
                {
                    "table": table,
                    "wave": wave,
                    "mode": mode,
                    "data_dirs": dirs,
                    # readers project to the table's true columns —
                    # multi part-files carry the superset (see above)
                    "columns": df.schema.fieldNames(),
                    "num_rows": self._dir_row_count(part_dir),
                    "snapshot_id": uuid.uuid5(
                        uuid.NAMESPACE_URL, f"{table}/{wave}"
                    ).hex,
                },
            )
            self._atomic_write_json(
                self._latest_pointer(table), {"wave": wave}
            )

    def compact(self, table: str, transform=None) -> bool:
        """Rewrite an append table's accumulated data_dirs into ONE
        directory and repoint the latest manifest at it (VERDICT r2
        item 6) — the manual analogue of an Iceberg rewrite_data_files.

        *transform* optionally maps the unioned DataFrame before the
        rewrite (e.g. frontier: seen-filter + dedup; host_state:
        latest row per host) — the table's logical content under its
        reader is unchanged, only materialized.

        Crash-safe via the same atomic-rename pattern as commit():
        data files land in ``data-NNNNNNc`` first; the manifest rename
        is the only publish point, so a crash mid-compaction leaves
        the previous manifest (and its dirs) fully intact.  Superseded
        dirs are NOT deleted — older manifests still reference them
        (time travel / load_delta read-back), exactly Iceberg's
        snapshot-expiry separation.  Returns True if a rewrite ran.
        """
        if self.table_format == "iceberg":
            return False  # Iceberg compacts via its own maintenance
        m = self.read_manifest(table)
        if m is None or "bucketed" in m:
            # bucketed layout: per-wave partitions ARE the layout (the
            # scan stays bucketed across them); file-count maintenance
            # is the cluster's rewrite_data_files job
            return False
        if len(m["data_dirs"]) <= 1 and transform is None:
            return False
        wave = m["wave"]
        df = self.load(table, wave)
        if transform is not None:
            df = transform(df)
        cdir = self._tdir(table) / f"data-{wave:06d}c"
        df.write.mode("overwrite").parquet(str(cdir))
        m2 = {**m, "data_dirs": [cdir.name], "compacted": True,
              "total_rows": self._dir_row_count(cdir)}
        self._atomic_write_json(self._manifest_path(table, wave), m2)
        return True

    @staticmethod
    def _dir_row_count(data_dir: Path) -> int:
        """Row count of a parquet dir from file footers (no Spark job)."""
        import pyarrow.parquet as pq

        total = 0
        for f in data_dir.glob("*.parquet"):
            total += pq.ParquetFile(f).metadata.num_rows
        return total

    def row_count(self, table: str, wave: int | None = None) -> int | None:
        """Rows committed AT *wave* (manifest-recorded; None if unknown,
        e.g. a manifest written by an older engine version)."""
        m = self.read_manifest(table, wave)
        if m is None:
            return None
        return m.get("num_rows")

    def _newest_manifest_before(self, table: str, wave: int) -> dict | None:
        waves = sorted(
            int(p.stem.split("-")[1])
            for p in self._tdir(table).glob("manifest-*.json")
        )
        prior = [w for w in waves if w < wave]
        return self.read_manifest(table, prior[-1]) if prior else None

    @staticmethod
    def _atomic_write_json(path: Path, obj: dict) -> None:
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(obj, indent=1, sort_keys=True))
        os.rename(tmp, path)  # atomic on POSIX

    def read_manifest(self, table: str, wave: int | None = None) -> dict | None:
        if wave is None:
            ptr = self._latest_pointer(table)
            if not ptr.exists():
                return None
            wave = json.loads(ptr.read_text())["wave"]
        mp = self._manifest_path(table, wave)
        if not mp.exists():
            return None
        return json.loads(mp.read_text())

    def latest_wave(self, table: str) -> int | None:
        m = self.read_manifest(table)
        return None if m is None else m["wave"]

    # --- reads -------------------------------------------------------------

    def load(self, table: str, wave: int | None = None) -> DataFrame | None:
        """Table state at *wave* (default: latest committed snapshot)."""
        if self.table_format == "iceberg":
            return self._load_iceberg(table, wave)
        m = self.read_manifest(table, wave)
        if m is None:
            return None
        if "bucketed" in m:
            return self._load_bucketed(table, m, m["wave"])
        paths = [str(self._tdir(table) / d) for d in m["data_dirs"]]
        df = self.spark.read.parquet(*paths)
        if "columns" in m:
            # commit_multi part-files carry the write group's superset
            # schema — project to this table's true columns (parquet
            # column resolution is name-based, so chains mixing plain
            # and multi dirs read fine either way)
            if not set(m["columns"]) <= set(df.columns):
                # an append chain can mix PRE-UPGRADE dirs lacking a
                # newly added column (e.g. warc_index gained digest/
                # record_type) with new dirs that have it; plain
                # parquet infers the schema from one sampled footer,
                # so sampling an old file would make the projection
                # below raise — and otherwise silently read the new
                # column only where present.  mergeSchema resolves the
                # union schema across all footers (ADVICE r5 medium);
                # only paid on the rare mixed-chain resume.
                df = self.spark.read.option(
                    "mergeSchema", "true"
                ).parquet(*paths)
            df = df.select(*m["columns"])
        return df

    def load_delta(self, table: str, wave: int) -> DataFrame | None:
        """Only the data written at *wave* (append tables' per-wave
        slice) — the engine's write-read barrier reads this back."""
        if self.table_format == "iceberg":
            return self._load_delta_iceberg(table, wave)
        m = self.read_manifest(table, wave)
        if m is not None and "bucketed" in m:
            from pyspark.sql import functions as F

            return (
                self.spark.table(m["bucketed"]["name"])
                .where(F.col("__wave") == F.lit(wave)).drop("__wave")
            )
        d = self._tdir(table) / f"data-{wave:06d}"
        if d.exists():
            return self.spark.read.parquet(str(d))
        # no plain per-wave dir — a commit_multi wave: its delta is the
        # manifest's dir set minus the previous manifest's (for append
        # chains; a snapshot's delta IS the snapshot).  Caveat: not
        # compaction-aware for waves before a compacted manifest — the
        # engine only load_delta's the never-compacted `fetched` table.
        m = self.read_manifest(table, wave)
        if m is None or "data_dirs" not in m:
            return None
        prev_dirs: set = set()
        if m["mode"] == "append":
            prev = self._newest_manifest_before(table, wave)
            if prev is not None:
                prev_dirs = set(prev.get("data_dirs", ()))
        dirs = [x for x in m["data_dirs"] if x not in prev_dirs]
        if not dirs:
            return None
        df = self.spark.read.parquet(
            *[str(self._tdir(table) / x) for x in dirs]
        )
        if "columns" in m:
            df = df.select(*m["columns"])
        return df

    def exists(self, table: str) -> bool:
        return self._latest_pointer(table).exists()
