"""Recrawl priority scheduler (operators/crawl.py). DuckDB twin: the
`crawl_priority` contract query (full churn+pagerank+formula
recompute)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_priority_formula_and_null_contracts(spark):
    from med_doi_feature_extraction_spark.operators.crawl import (
        crawl_priority,
    )

    churn = spark.createDataFrame(
        [
            # λ = 0.5/100 changes/sec, age = 200s → p = 1 - e^-1
            (1, 0.5, 100.0, "2024-01-01 00:00:00"),
            (2, None, None, None),            # singleton: undefined churn
            (3, 0.25, 50.0, "2024-01-01 00:03:20"),  # no authority row
        ],
        "node: long, change_rate: double, mean_gap_sec: double,"
        " last_change_ts: string",
    ).withColumn("last_change_ts", F.to_timestamp("last_change_ts"))
    authority = spark.createDataFrame(
        [(1, 0.4), (2, 0.1)], "node: long, rank: double"
    )
    out = {
        r["node"]: r
        for r in crawl_priority(
            churn, authority, as_of="2024-01-01 00:03:20"
        ).collect()
    }
    expect = 0.4 * (1 - math.exp(-(0.5 / 100.0) * 200))
    assert abs(out[1]["priority"] - round(expect, 6)) < 1e-9
    assert out[2]["priority"] is None          # undefined churn stays NULL
    assert out[3]["authority"] == 0.0 and out[3]["priority"] == 0.0
