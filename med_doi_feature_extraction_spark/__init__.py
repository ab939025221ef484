"""med_doi_feature_extraction_spark — a PySpark-native feature-engineering engine.

A from-scratch re-expression of the capabilities of
``zerofcs/med-doi-feature-extraction`` (reference surveyed in SURVEY.md)
as idiomatic Spark dataflow: vectorized pandas/Arrow UDF kernels,
point-in-time (as-of) joins, windowed feature engineering (lag/lead,
backfill, sessionization, rolling aggregates), checkpoint-manifest
resume with per-partition lineage, plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Design principles (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst does the optimizing.
- Pandas/Arrow UDFs only where built-ins can't express the kernel
  (HTML parsing, minhash); never row-at-a-time Python UDFs.
- Explicit partitioning/salting/AQE for the shuffle-heavy operators.
- One kernel module shared by the Spark UDF and the pandas oracle so
  golden tests are byte-identical by construction.
"""

__version__ = "0.1.0"
