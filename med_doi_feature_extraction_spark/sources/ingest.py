"""CSV/Parquet ingestion — the reference's input path (S1/S3–S7).

The reference is CSV-first (``/root/reference/src/services/
input_handler.py:32-75``, ``src/cli/helpers.py:98-104``): a migrating
user's first action is pointing the CLI at a CSV of records. This
source reads CSV (header, quoted multiline fields, escaped quotes) or
Parquet behind one call and wires in the reference's row-shaping
chain: column_map rename (S4), key coalesce + sanitize (S5),
NaN→"" fill (S6), required-key filter (S7), and deterministic
skip/limit under a total order (S3). Excel (S2) stays out of scope
per SURVEY §2's disposition — convert xlsx → csv upstream.

Scale note: ``multiLine=True`` CSV is NOT splittable (quoted newlines
make record boundaries context-dependent) — fine for the reference's
operational CSVs; at corpus scale the data lives in parquet and CSV is
only the control-plane input, so this is not a hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.plans.compile import coalesce_key


def _infer_format(path: str) -> str:
    lower = path.rstrip("/").lower()
    if lower.endswith((".csv", ".csv.gz", ".tsv")):
        return "csv"
    if lower.endswith((".json", ".jsonl", ".ndjson")):
        return "json"
    return "parquet"


def read_input(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    column_map: dict[str, str] | None = None,
    id_column: str = "DOI",
    require_key: bool = False,
    fill_empty: list[str] | None = None,
    skip: int = 0,
    limit: int | None = None,
    order_by: list[str] | None = None,
    infer_schema: bool = False,
    delimiter: str = ",",
) -> DataFrame:
    """Read + shape an input table the way the reference ingests CSVs.

    With ``infer_schema=False`` (default) every CSV column arrives as
    string — byte parity with the reference's ``dtype=str`` pandas
    read. ``skip``/``limit`` require ``order_by`` (a deterministic
    offset over a distributed scan needs a total order; the reference
    relies on file row order, which doesn't exist after a parallel
    scan)."""
    fmt = fmt or _infer_format(path)
    if fmt == "csv":
        df = (
            spark.read.option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .option("sep", delimiter)
            .option("inferSchema", infer_schema)
            .csv(path)
        )
    elif fmt == "json":
        df = spark.read.json(path)
    else:
        df = spark.read.parquet(path)

    if column_map:
        df = df.withColumnsRenamed(column_map)
    df = coalesce_key(df, id_column)
    if require_key:
        df = df.filter(F.col("key").isNotNull() & (F.length("key") > 0))
    if fill_empty:
        df = df.fillna("", subset=[c for c in fill_empty if c in df.columns])
    if skip or limit is not None:
        if not order_by:
            raise ValueError("skip/limit require order_by for determinism")
        df = df.orderBy(*order_by)
        if skip:
            df = df.offset(skip)
        if limit is not None:
            df = df.limit(limit)
    return df
