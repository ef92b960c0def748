"""Micro-benchmarks keeping the reference's only measured comparisons
(BASELINE.md):

1. chord-vs-group (Celery: group fan-out 0.849 s vs chord barrier
   ~1.1 s on 3 stocks — `Chapter 3 - Complex Task Chains.ipynb:329,
   :407`). Engine analog: the SURVEY §3.1 verdict says a Celery group
   over stocks becomes ONE DataFrame with the fan-out parameter as a
   grouping column. Measured here against the literal translation —
   one Spark job per key + driver-side merge (what a port of the
   reference's orchestration would do). The single-plan version wins by
   an order of magnitude because the per-key variant pays scheduling +
   scan per key; at 1000 keys on 100 TB the per-key variant is simply
   not runnable.

2. stopword hoist (SURVEY §4.1 caching row: the reference evaluates
   `stopwords.words('english')` INSIDE the per-row loop — Learning Dask
   Bags.ipynb:155). Engine: broadcast anti-join / literal isin, JVM-side.
   Measured against the faithful per-row Python UDF.

Run: python micro_bench.py   (sf dir via $SPARK_GRAFT_SF_DIR, default sf0.1)
Prints one JSON line {"micro": {...}} — not part of the driver's bench
contract (bench.py is), just evidence for the two design decisions.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.session import get_spark

STOPWORDS = (
    "the a an and or of to in is it for on with as by at this that be are"
).split()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="engine-micro-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    # -- 1. group fan-out: one plan vs job-per-key ------------------------
    li = load(spark, sf_dir, "lineitem")
    keys = [r[0] for r in li.select("l_returnflag").distinct().collect()]
    aggs = [f(c).alias(f"{c} {n}")
            for c in ("l_quantity", "l_extendedprice", "l_discount")
            for n, f in (("min", F.min), ("max", F.max), ("mean", F.avg))]

    def single_plan():
        rows = li.groupBy("l_returnflag").agg(*aggs).collect()
        return sorted(rows, key=lambda r: r["l_quantity mean"])

    def job_per_key():  # the literal Celery-group translation
        rows = [li.filter(F.col("l_returnflag") == k).agg(*aggs).collect()[0]
                for k in keys]
        return sorted(rows, key=lambda r: r["l_quantity mean"])

    single_plan(); job_per_key()  # warm
    out["group_single_plan"] = _timed(single_plan)
    out["group_job_per_key"] = _timed(job_per_key)

    # -- 2. stopword filter: broadcast/isin vs per-row Python UDF ---------
    tokens = (load(spark, sf_dir, "documents")
              .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                      .alias("word"))
              .filter(F.col("word") != ""))

    def jvm_isin():
        return tokens.filter(~F.col("word").isin(STOPWORDS)).count()

    def broadcast_anti():
        stop = F.broadcast(
            tokens.sparkSession.createDataFrame(
                [(w,) for w in STOPWORDS], ["word"]))
        return tokens.join(stop, "word", "left_anti").count()

    @F.udf(T.BooleanType())
    def keep_py(word: str) -> bool:  # per-row path the reference takes
        return word not in STOPWORDS

    def python_udf():
        return tokens.filter(keep_py("word")).count()

    jvm_isin(); broadcast_anti(); python_udf()  # warm
    out["stopword_jvm_isin"] = _timed(jvm_isin)
    out["stopword_broadcast_anti"] = _timed(broadcast_anti)
    out["stopword_python_udf"] = _timed(python_udf)

    print(json.dumps({"micro": out, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
