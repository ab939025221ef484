"""Thin table catalog: Iceberg when the runtime has the jars,
partitioned/bucketed Parquet otherwise — one API either way.

BASELINE.json mandates Iceberg-style tables; this sandbox image ships
no Iceberg artifacts (verified: no iceberg/delta jars in the pyspark
distribution), so the shim keeps the engine's storage calls behind a
single seam. On a cluster with ``iceberg-spark-runtime`` on the
classpath, ``use_iceberg=True`` switches writes to the v2 connector
and MERGE-based upsert without touching operator code (SURVEY.md §7.3).

Bucketing note (the zero-shuffle path): ``save_bucketed`` stores a
table bucketed by url so downstream window/join stages read
HashPartitioning(url, n_buckets) straight off the scan — no exchange
at all for the flagship pipeline. This is the Parquet stand-in for
Iceberg's bucket partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


class Catalog:
    def __init__(self, spark: SparkSession, use_iceberg: bool | None = None):
        self.spark = spark
        self.iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )

    def save(self, df: DataFrame, name: str, path: str, partition_by: list[str] | None = None) -> None:
        if self.iceberg:  # pragma: no cover - needs iceberg jars
            writer = df.writeTo(name).using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(path)

    def save_bucketed(
        self, df: DataFrame, name: str, n_buckets: int, bucket_cols: list[str],
        sort_cols: list[str] | None = None,
    ) -> None:
        """Bucketed managed table: later scans expose hash partitioning
        on ``bucket_cols`` so per-key windows/joins need no exchange.

        A stale warehouse directory with no catalog entry (a previous
        session killed mid-write) makes saveAsTable fail with
        LOCATION_ALREADY_EXISTS even in overwrite mode. Deletion is
        OWNERSHIP-SCOPED (ADVICE r3): before every write this method
        records a write-intent marker under
        ``<warehouse>/_engine_tables/<db>.<table>``; an orphan dir is
        cleared only when (a) it sits at the computed location inside
        THIS session's warehouse and (b) the marker proves this engine
        created it. A dir without a marker — e.g. a managed table
        registered in a metastore this session isn't connected to, or
        a table with a custom LOCATION — is never touched: we raise
        with a hint instead of silently destroying live data."""
        from med_doi_feature_extraction_spark import fsutil

        warehouse = self.spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        )
        # managed-table layout: <warehouse>/<db>.db/<table> except
        # the default database, which sits at <warehouse>/<table>
        if "." in name:
            db, _, table = name.lower().rpartition(".")
        else:
            db = self.spark.catalog.currentDatabase().lower()
            table = name.lower()
        loc = (
            f"{warehouse}/{table}"
            if db == "default"
            else f"{warehouse}/{db}.db/{table}"
        )
        marker = f"{warehouse}/_engine_tables/{db}.{table}"
        if not self.spark.catalog.tableExists(name) and fsutil.exists(
            self.spark, loc
        ):
            if fsutil.exists(self.spark, marker):
                fsutil.delete(self.spark, loc)
            else:
                raise RuntimeError(
                    f"save_bucketed({name!r}): directory {loc} exists but "
                    "the current catalog has no such table and this engine "
                    "has no write-intent marker for it. Refusing to delete "
                    "— it may be live data managed by another metastore. "
                    "If it is truly orphaned, remove it (or create "
                    f"{marker}) and retry."
                )
        # record intent BEFORE the write so a killed session leaves
        # proof of ownership for the next run's cleanup
        fsutil.write_text(self.spark, marker, f"managed by engine: {name}\n")
        w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.format("parquet").saveAsTable(name)

    def load(self, name: str, path: str | None = None) -> DataFrame:
        if self.iceberg:  # pragma: no cover
            return self.spark.table(name)
        # point lookup, not an O(catalog) listTables scan
        if self.spark.catalog.tableExists(name):
            return self.spark.table(name)
        return self.spark.read.parquet(path)

    def upsert(self, name: str, path: str, delta: DataFrame, keys: list[str]) -> None:
        """MERGE INTO on Iceberg; anti-join + atomic rewrite on Parquet
        (reference upsert semantics, output_handler.py:57-71)."""
        if self.iceberg:  # pragma: no cover
            delta.createOrReplaceTempView("_delta")
            cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            self.spark.sql(
                f"MERGE INTO {name} t USING _delta s ON {cond} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        else:
            from med_doi_feature_extraction_spark.operators.upsert import upsert

            from med_doi_feature_extraction_spark import fsutil

            existing = self.spark.read.parquet(path)
            merged = upsert(existing, delta, keys)
            # write-then-swap via the Hadoop FileSystem API (one code
            # path for local/HDFS/S3A; rename is atomic on HDFS,
            # best-effort on object stores — same guarantee Spark's
            # own committers give there)
            tmp = path.rstrip("/") + "._staging"
            merged.write.mode("overwrite").parquet(tmp)
            fsutil.delete(self.spark, path, recursive=True)
            fsutil.rename(self.spark, tmp, path)


# -------------------------------------------- snapshot versioning

def _versions_dir(path: str) -> str:
    return path.rstrip("/") + "/_versions"


def _data_dir(path: str, version: int) -> str:
    return f"{path.rstrip('/')}/v={version}"


class VersionedTable:
    """Iceberg-style snapshot commits on the plain-Parquet fallback:
    every write lands in its own ``v=<n>`` data directory and becomes
    visible ONLY when its manifest file commits under ``_versions/``
    — manifest creation is the atomic commit point, so a session
    killed mid-write leaves an invisible orphan data dir, never a
    half-readable table (the miniature of Iceberg's snapshot +
    metadata-pointer design; `manifest.py` applies the same
    crash-visibility rule to the flagship sink). Readers resolve the
    LATEST committed version, or time-travel to any retained one —
    the capability BASELINE.json's Iceberg framing actually needs
    from the storage layer (jar-gated Iceberg path untouched;
    this is the fallback's equivalent).

    No clocks anywhere: versions are dense integers, manifests carry
    deterministic content (version + row count).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # -- commit log ----------------------------------------------------
    def versions(self) -> list[int]:
        """Committed versions, ascending (uncommitted dirs invisible)."""
        from med_doi_feature_extraction_spark import fsutil

        vdir = _versions_dir(self.path)
        if not fsutil.exists(self.spark, vdir):
            return []
        out = []
        for name, _sz in fsutil.list_files(self.spark, vdir):
            base = name.rsplit("/", 1)[-1]
            if base.endswith(".json"):
                try:
                    out.append(int(base[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # -- write ---------------------------------------------------------
    def write(self, df: DataFrame) -> int:
        """Append a new snapshot; returns its version number. The
        data write happens FIRST, the manifest commit LAST."""
        import json

        from med_doi_feature_extraction_spark import fsutil

        v = (self.latest() or 0) + 1
        data = _data_dir(self.path, v)
        df.write.mode("overwrite").parquet(data)
        rows, nbytes = fsutil.parquet_rows_and_bytes(self.spark, data)
        fsutil.mkdirs(self.spark, _versions_dir(self.path))
        manifest = f"{_versions_dir(self.path)}/{v}.json"
        # commit = write-to-temp + rename: a crash mid-write leaves a
        # .tmp file that versions() never lists, so the docstring's
        # atomicity claim holds on the local FS too (write_text alone
        # writes the target in place). A manifest already present
        # means another writer claimed this version — single-writer
        # is the contract, and a conflict must FAIL, not overwrite.
        if fsutil.exists(self.spark, manifest):
            raise RuntimeError(
                f"versioned table {self.path}: version {v} already "
                "committed by a concurrent writer (single-writer "
                "contract)"
            )
        tmp = f"{manifest}.tmp"
        fsutil.write_text(
            self.spark,
            tmp,
            json.dumps({"version": v, "rows": rows, "bytes": nbytes}),
        )
        if not fsutil.rename(self.spark, tmp, manifest):
            raise RuntimeError(
                f"versioned table {self.path}: commit rename failed "
                f"for version {v} (concurrent writer?)"
            )
        return v

    # -- read ----------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to ``version``."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(
                f"versioned table {self.path}: no committed versions"
            )
        if version is None:
            version = vs[-1]
        if version not in vs:
            raise ValueError(
                f"versioned table {self.path}: version {version} not in "
                f"committed set {vs}"
            )
        return self.spark.read.parquet(_data_dir(self.path, version))

    def manifest(self, version: int) -> dict:
        import json

        from med_doi_feature_extraction_spark import fsutil

        return json.loads(
            fsutil.read_text(
                self.spark, f"{_versions_dir(self.path)}/{version}.json"
            )
        )
