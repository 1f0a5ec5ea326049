"""One-shot diagnostic build for scaling investigations: warmup + ONE
timed build with per-stage timings, printed as JSON. Keeps iterations
fast while tuning shuffle-partition / memory configs (bench_job.py runs
2 timed reps + queries and is the evidentiary job).

Run: taskset -c 0-15 spark-submit --master local[16] \
    --conf spark.sql.shuffle.partitions=64 --py-files pkg.zip \
    scripts/diag_job.py <corpus.parquet>
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    corpus = sys.argv[1]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from fulltextsearchengine_spark.operators.index_build import build_and_save_index

    workdir = tempfile.mkdtemp(prefix="ftse_diag_")
    df = spark.read.parquet(corpus)
    n_turns = df.count()
    build_and_save_index(df.limit(20000), f"{workdir}/warmup")

    tm: dict = {}
    t0 = time.perf_counter()
    build_and_save_index(df, f"{workdir}/index", timings=tm)
    dt = time.perf_counter() - t0
    shutil.rmtree(workdir, ignore_errors=True)
    print(
        "DIAG "
        + json.dumps(
            {
                "cores": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "n_turns": n_turns,
                "build_sec": round(dt, 3),
                "turns_per_sec": round(n_turns / dt, 1),
                "stage_times": {k: round(v, 2) for k, v in tm.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
