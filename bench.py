"""Benchmark driver: runs the headline query inventory at sf0.1 and prints
ONE JSON line ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Queries are materialized JVM-side via the ``noop`` sink (full execution, no
driver-side collect), matching how a cluster run would measure engine
throughput rather than result-transfer time.

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from realtime_olap_spark import suite  # noqa: E402

# Representative headline set: one per operator family (selection, filter,
# scalar agg, group-by/top-N/having, transforms, multi-value, PQL front end,
# hybrid table, rollup routing, training-data extensions).
HEADLINE = [
    "flagship_q1",
    "sel_order_by_offset",
    "filter_and_or_tree",
    "agg_scalar_all",
    "agg_distinctcounthll",
    "agg_groupby_topn",
    "agg_having",
    "tf_datetimeconvert_bucket",
    "mv_groupby",
    "pql_agg_groupby_top",
    "hybrid_time_boundary",
    "rollup_routed_agg",
    "rollup_fasthll",
    "ext_join_star",
    "ext_window_running",
    "dedup_exact",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_topk_ivf",
    "text_token_budget",
    "mm_byte_histogram",
]


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("realtime-olap-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in suite.QUERIES]

    # Warm the JVM (codegen, parquet reader, shuffle paths) untimed: the
    # flagship pipeline at the smallest SF plus a footer read at bench SF.
    suite.QUERIES["flagship_q1"](spark, "/root/testdata/sf0.001").collect()
    suite.QUERIES["agg_metadata_count"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        start = time.perf_counter()
        df = suite.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
