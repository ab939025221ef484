"""Deterministic, versioned feature kernels.

Each kernel is a pure pandas Series→Series (or DataFrame→DataFrame)
function usable both as the Spark pandas UDF body and as the
single-threaded golden oracle — one implementation, byte-identical by
construction (SURVEY.md §4.3.3).
"""

from med_doi_feature_extraction_spark.kernels.registry import KERNELS, register_kernel  # noqa: F401
