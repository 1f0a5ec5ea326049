"""Front-coded term dictionary segments — the Dictionary/terms.txt analog
(dictionary/Dictionary.java:31-46, compression/FrontCodingEncoder.java:
33-81; k=4 per Dictionary.java:26).

The columnar terms table (term, df, cf) is already queryable; this
artifact is the COMPACT dictionary the north_star names explicitly: the
sorted term vocabulary front-coded in (k−1)-in-k blocks, segmented so
the build parallelizes and a reader can binary-search segments by their
(first_term, last_term) range, then decode one segment (< seg_size
terms) to locate a term — the reference's two-level
blocked-binary-search design (Dictionary.java:145-165) with segments as
the outer level.

Build: one range-exchange on term (global sort), then a vectorized
front-coding pass per partition via applyInPandas. Each segment row:
(seg_id, first_term, last_term, n_terms, suffix blob, prefix_lens,
suffix_lens, dfs, cfs).
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import front_code, front_decode

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("seg_id", T.LongType()),
        T.StructField("first_term", T.StringType()),
        T.StructField("last_term", T.StringType()),
        T.StructField("n_terms", T.IntegerType()),
        T.StructField("stream", T.BinaryType()),
        T.StructField("prefix_lens", T.ArrayType(T.IntegerType())),
        T.StructField("suffix_lens", T.ArrayType(T.IntegerType())),
        T.StructField("dfs", T.ArrayType(T.LongType())),
        T.StructField("cfs", T.ArrayType(T.LongType())),
    ]
)


def build_dictionary_segments(
    terms: DataFrame, seg_size: int = 1024, k: int = 4, num_partitions: int | None = None
) -> DataFrame:
    """terms(term, df, cf) → front-coded segment table. Globally sorted:
    repartitionByRange(term) + in-partition sort, so segment term ranges
    are disjoint and ordered; seg_id = partition_id * segs_per_partition
    + local index preserves global order without a second exchange."""
    spark = terms.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("term", kind="mergesort")
        pid = int(pdf["pid"].iat[0])
        out = []
        rows = len(pdf)
        segs_per_partition = 1 << 32  # seg ordering key spread; ids stay unique
        for j, s in enumerate(range(0, rows, seg_size)):
            chunk = pdf.iloc[s : s + seg_size]
            ts = chunk["term"].tolist()
            stream, plens, slens = front_code(ts, k=k)
            out.append(
                (
                    pid * segs_per_partition + j,
                    ts[0],
                    ts[-1],
                    len(ts),
                    stream,
                    np.asarray(plens, dtype=np.int32).tolist(),
                    np.asarray(slens, dtype=np.int32).tolist(),
                    chunk["df"].astype("int64").tolist(),
                    chunk["cf"].astype("int64").tolist(),
                )
            )
        return pd.DataFrame(out, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    ranged = (
        terms.repartitionByRange(num_partitions, "term")
        .withColumn("pid", F.spark_partition_id())
    )
    return ranged.groupBy("pid").applyInPandas(encode, schema=SEGMENT_SCHEMA)


class DictionaryReader:
    """Driver-side two-level lookup over collected segments (the
    in-memory Dictionary analog, Dictionary.java:74-79). For 100 TB the
    same structure lives sharded on serving nodes."""

    def __init__(self, segments: DataFrame):
        rows = sorted(segments.collect(), key=lambda r: r["first_term"])
        self.firsts = [r["first_term"] for r in rows]
        self.rows = rows
        self._decoded: dict[int, tuple[list[str], list, list]] = {}

    def lookup(self, term: str) -> tuple[int, int] | None:
        """term → (df, cf) or None; binary search segments, then decode
        one segment (front_decode) and binary search within."""
        term = term.lower()
        i = bisect.bisect_right(self.firsts, term) - 1
        if i < 0:
            return None
        row = self.rows[i]
        if term > row["last_term"]:
            return None
        if i not in self._decoded:
            terms = front_decode(row["stream"], row["prefix_lens"], row["suffix_lens"])
            self._decoded[i] = (terms, row["dfs"], row["cfs"])
        terms, dfs, cfs = self._decoded[i]
        j = bisect.bisect_left(terms, term)
        if j < len(terms) and terms[j] == term:
            return int(dfs[j]), int(cfs[j])
        return None

    def all_terms(self) -> list[str]:
        out: list[str] = []
        for r in self.rows:
            out.extend(front_decode(r["stream"], r["prefix_lens"], r["suffix_lens"]))
        return out
