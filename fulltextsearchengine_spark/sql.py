"""SQL surface: register the index star as temp views so every engine
structure is queryable via ``spark.sql`` (the DataFrame plans and SQL
compile to the same Catalyst plans — this is the "or just write SQL"
half of the API).

Example, after ``register_index_views(spark, index)``:

    SELECT p.doc_id,
           SUM( LN((s.num_docs - t.df + 0.5) / (t.df + 0.5) + 1.0)
                * p.tf * 2.2
                / (p.tf + 1.2 * (0.25 + 0.75 * p.doc_len
                                 / (CAST(s.total_tokens AS DOUBLE) / s.num_docs))) ) AS score
    FROM ftse_postings p
    JOIN ftse_terms t USING (term)
    CROSS JOIN ftse_stats s
    WHERE p.term IN ('spark', 'join', 'fast')
    GROUP BY p.doc_id
    ORDER BY score DESC, doc_id
    LIMIT 10
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.index_build import InvertedIndex

BM25_SQL_TEMPLATE = """
SELECT p.doc_id,
       SUM( LN((s.num_docs - t.df + 0.5) / (t.df + 0.5) + 1.0)
            * p.tf * {k1_plus_1}
            / (p.tf + {k1} * ({one_minus_b} + {b} * p.doc_len
                              / (CAST(s.total_tokens AS DOUBLE) / s.num_docs))) ) AS score
FROM ftse_postings p
JOIN ftse_terms t USING (term)
CROSS JOIN ftse_stats s
WHERE p.term IN ({terms})
GROUP BY p.doc_id
ORDER BY score DESC, doc_id
LIMIT {k}
"""


def register_index_views(spark: SparkSession, index: InvertedIndex, prefix: str = "ftse_") -> None:
    index.docs.createOrReplaceTempView(f"{prefix}docs")
    index.postings.createOrReplaceTempView(f"{prefix}postings")
    index.terms.createOrReplaceTempView(f"{prefix}terms")
    index.conv_ranges.createOrReplaceTempView(f"{prefix}conv_ranges")
    index.stats.createOrReplaceTempView(f"{prefix}stats")


def bm25_sql(query_terms: list[str], k: int, k1: float = 1.2, b: float = 0.75) -> str:
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in sorted(set(query_terms)))
    return BM25_SQL_TEMPLATE.format(
        terms=terms, k=k, k1=k1, k1_plus_1=k1 + 1.0, one_minus_b=1.0 - b, b=b
    )
