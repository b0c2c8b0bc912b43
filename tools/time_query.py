#!/usr/bin/env python
"""Time individual registered queries with the bench methodology (noop
sink, cold + N steady runs, caches cleared between runs) in one process.

Usage: python tools/time_query.py <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_TQ_RUNS (default 3)

Prints one JSON line per query: {"name", "cold", "steady": [...], "median"}.
This is the A/B harness for optimization work — same timed region as
bench.py, without the 53-query sweep, so before/after pairs land in the
same host-noise window.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trail_condition_etl_spark.session import get_spark  # noqa: E402
from trail_condition_etl_spark import registry  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_TQ_RUNS", "3"))
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from trail_condition_etl_spark import catalog
    from trail_condition_etl_spark.operators import artifacts

    for t in ("lineitem", "events", "documents", "embeddings"):
        catalog.load_table(spark, sf_dir, t).count()
    warm = (
        spark.range(10_000)
        .withColumn("g", F.col("id") % 7)
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
        )
        .groupBy("g")
        .agg(F.sum("rn").alias("s"))
    )
    warm.write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import pandas_udf

    _warm_udf = pandas_udf(lambda s: s * 2.0, "double")
    spark.range(1000).select(
        _warm_udf(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    qs = registry.queries()

    def one_run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        artifacts.clear_caches(spark)
        return dt

    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        fn = qs[name]
        cold = one_run(fn)
        steady = [one_run(fn) for _ in range(n_runs)]
        print(
            json.dumps(
                {
                    "name": name,
                    "cold": round(cold, 3),
                    "steady": [round(s, 3) for s in steady],
                    "median": round(median(steady), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
