"""Per-query noop-sink isolation bench (optimization guide §1.4).

Times a named subset of the declared queries (plus the bench-direct
operator builds) through the noop sink with the same adaptive
best-of-N methodology as ``bench.py``, without touching the frozen
``bench.py``. Optionally dumps ``.explain("formatted")`` plans.

Usage::

    python bench_extra.py [--explain DIR] [--runs N] [--sf SF_DIR] q1 q2 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
SPARK_GRAFT_CPUS (master local[N]).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F


def _time_noop(df, max_runs: int = 5) -> float:
    best = float("inf")
    for i in range(max_runs):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t = time.time() - t0
        still_warming = t < best * 0.85
        best = min(best, t)
        if i >= 1 and not still_warming:
            break
    return round(best, 3)


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    runs = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--explain":
            explain_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod
    from med_doi_feature_extraction_spark.operators import dedup, similarity
    from med_doi_feature_extraction_spark.session import get_spark

    qs = entrymod.queries()

    def _docs(s):
        return s.read.parquet(f"{sf_dir}/documents.parquet")

    def _emb(s):
        return s.read.parquet(f"{sf_dir}/embeddings.parquet")

    direct = {
        "minhash_neardup": lambda s, d: dedup.minhash_dedup(
            _docs(s), "doc_id", "text", threshold=0.5
        ),
        "simhash_pairs": lambda s, d: dedup.simhash_candidates(
            _docs(s), "doc_id", "text", max_hamming=8
        ),
        "incremental_neardup": lambda s, d: dedup.incremental_minhash_dedup(
            _docs(s).filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0),
            _docs(s).filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) != 0),
            "doc_id", "text", threshold=0.5,
        ),
        "lsh_topk": lambda s, d: similarity.lsh_topk(
            _emb(s), _emb(s).filter(F.col("vec_id") < 8), k=5
        ),
        "sketch_stats": lambda s, d: __import__(
            "med_doi_feature_extraction_spark.operators.sketches",
            fromlist=["approx_stats"],
        ).approx_stats(
            s.read.parquet(f"{d}/events.parquet"),
            ["event_type"], "user_id", "value",
        ),
    }

    unknown = [n for n in names if n not in qs and n not in direct]
    if unknown:
        print(f"error: unknown queries {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("bench_extra")

    # same worker warm-up as bench.py so first timed query is steady-state
    from med_doi_feature_extraction_spark.operators.dedup import with_minhash

    n_workers = spark.sparkContext.defaultParallelism
    warm = spark.range(n_workers * 4).repartition(n_workers).selectExpr(
        "cast(id as string) as id", "concat('warm up text ', id) as text"
    )
    with_minhash(warm, "text").write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in names:
        build = direct.get(name, qs.get(name))
        df = build(spark, sf_dir)
        if explain_dir:
            Path(explain_dir).mkdir(parents=True, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (Path(explain_dir) / f"{name}.txt").write_text(plan)
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        timings[name] = _time_noop(df, max_runs=runs)
        spark.sparkContext.setJobDescription(None)

    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
