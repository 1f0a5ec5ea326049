"""The spark-submit job for the two-cluster-size scaling benchmark
(north_rule: same job at N and 4N executors). Builds the full inverted
index over a parquet transcript corpus and runs BM25 top-10 queries;
prints one JSON line with wall times.

Run via:
  spark-submit --master local[N] --py-files ftse_pkg.zip \
      scripts/bench_job.py <corpus.parquet> <out.json>
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    corpus, out_path = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism

    from fulltextsearchengine_spark.operators.index_build import build_and_save_index, load_index
    from fulltextsearchengine_spark.operators.search import Searcher

    workdir = tempfile.mkdtemp(prefix="ftse_scale_")
    df = spark.read.parquet(corpus)
    n_turns = df.count()

    # JIT/codegen warm-up: untimed small build (cold-JVM compilation and
    # codegen otherwise dominate and mask parallel scaling)
    build_and_save_index(df.limit(20000), f"{workdir}/warmup")

    # two timed reps, report the min (steady-state throughput)
    build_sec = float("inf")
    stage_times: dict = {}
    for rep in range(2):
        tm: dict = {}
        t0 = time.perf_counter()
        build_and_save_index(df, f"{workdir}/index", timings=tm)
        dt = time.perf_counter() - t0
        if dt < build_sec:
            build_sec, stage_times = dt, tm

    idx = load_index(spark, f"{workdir}/index")
    s = Searcher(idx)
    s._stats = idx.stats_row()
    top_terms = [r["term"] for r in idx.terms.orderBy(F.desc("df")).limit(30).collect()]
    queries = [top_terms[i : i + 3] for i in range(0, 30, 3)]
    t0 = time.perf_counter()
    for q in queries:
        s.bm25_search(q, 10).collect()
    query_sec = time.perf_counter() - t0

    shutil.rmtree(workdir, ignore_errors=True)
    result = {
        "cores": cores,
        "n_turns": n_turns,
        "build_sec": round(build_sec, 3),
        "build_turns_per_sec": round(n_turns / build_sec, 1),
        "n_queries": len(queries),
        "bm25_latency_sec": round(query_sec / len(queries), 4),
        "stage_times": {k: round(v, 2) for k, v in stage_times.items()},
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
