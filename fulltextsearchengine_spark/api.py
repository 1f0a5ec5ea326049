"""Reference-shaped facade: the three public classes of the reference
engine (`webdata.IndexWriter`, `webdata.IndexReader`,
`webdata.ReviewSearch` — SURVEY.md §3) re-expressed over the Spark
engine, so a reference user can switch with the same call shapes.

Naming maps (review-domain → transcript-domain):
- review → transcript turn (docID = dense 1-based arrival/turn order)
- productId → conv_id
- getReviewsWithToken → posting iteration [(docId, tf), ...]

Methods that surface reference quirks intentionally deviate where
SURVEY.md documents the deviation (int64 token counters — no
getTokenSizeOfReviews int-cast overflow; doc_len uncapped).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.index_build import build_and_save_index, load_index
from .operators.search import Searcher
from .sources.transcripts import read_transcripts


class IndexWriter:
    """IndexWriter.write(inputFile, dir) analog (IndexWriter.java:26-64)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def write(self, transcripts: DataFrame | str, index_dir: str) -> None:
        if isinstance(transcripts, str):
            transcripts = read_transcripts(self.spark, transcripts)
        build_and_save_index(transcripts, index_dir)

    def remove_index(self, index_dir: str) -> None:
        """removeIndex analog (IndexWriter.java:69-75)."""
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)


class IndexReader:
    """IndexReader analog (IndexReader.java:13-163): df/cf/posting/
    metadata lookups over a built index."""

    def __init__(self, spark: SparkSession, index_dir: str, preload_terms: bool = True):
        self.index = load_index(spark, index_dir)
        self.searcher = Searcher(self.index, preload_terms=preload_terms)

    # --- term statistics (IndexReader.java:89-103, 105-121) -----------
    def get_token_frequency(self, token: str) -> int:
        """df: number of turns containing token (0 if absent)."""
        st = self.searcher.term_stats([token])
        return next(iter(st.values()), (0, 0))[0]

    def get_token_collection_frequency(self, token: str) -> int:
        """cf: total occurrences of token across the corpus."""
        st = self.searcher.term_stats([token])
        return next(iter(st.values()), (0, 0))[1]

    def get_reviews_with_token(self, token: str) -> Iterator[tuple[int, int]]:
        """Posting iteration: (docId, tf) pairs, docId ascending
        (IndexReader.java:125-137 returns the same interleaved)."""
        rows = (
            self.searcher.postings_for([token])
            .select("doc_id", "tf")
            .orderBy("doc_id")
            .collect()
        )
        return iter((r["doc_id"], r["tf"]) for r in rows)

    # --- corpus statistics (IndexReader.java:139-152) ------------------
    def get_number_of_reviews(self) -> int:
        return self.searcher.stats["num_docs"]

    def get_token_size_of_reviews(self) -> int:
        """Σ tokens — int64, deliberately NOT replicating the reference's
        int-cast overflow (Dictionary.java:173-175, SURVEY.md §1.2)."""
        return self.searcher.stats["total_tokens"]

    # --- per-doc metadata (IndexReader.java:36-86) ---------------------
    def get_review_length(self, doc_id: int) -> int:
        m = self.searcher.doc_meta(doc_id)
        return m["doc_len"] if m else -1

    def get_conv_id(self, doc_id: int) -> str | None:
        m = self.searcher.doc_meta(doc_id)
        return m["conv_id"] if m else None

    def get_turn_meta(self, doc_id: int) -> dict | None:
        return self.searcher.doc_meta(doc_id)

    # --- conv (product) lookups (ProductIdToDocIdMapper.java:205-216) --
    def get_product_reviews(self, conv_id: str) -> list[int]:
        return [r["doc_id"] for r in self.searcher.conv_doc_ids(conv_id).collect()]


class ReviewSearch:
    """ReviewSearch analog (ReviewSearch.java:11-284): the three ranked
    searches plus BM25 (the scale path)."""

    def __init__(self, reader: IndexReader):
        self.searcher = reader.searcher

    def vector_space_search(self, query: list[str], k: int) -> list[tuple[int, float]]:
        rows = self.searcher.vector_space_search(query, k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def language_model_search(
        self, query: list[str], lam: float, k: int
    ) -> list[tuple[int, float]]:
        scores = self.searcher.lm_scores(query, lam=lam)
        rows = Searcher.topk(scores, k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def bm25_search(self, query: list[str], k: int) -> list[tuple[int, float]]:
        rows = self.searcher.bm25_search(query, k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def product_search(self, query: list[str], k: int) -> list[str]:
        """productSearch analog: ranked conv_ids (ReviewSearch.java:274-283)."""
        return [r["conv_id"] for r in self.searcher.conv_search(query, k).collect()]
