"""fulltextsearchengine_spark — a PySpark-native SPIMI-style inverted-index +
top-k search engine over tables of multi-turn conversation transcripts.

Brand-new implementation (NOT a port) with the query semantics of the
reference engine nmdanny/FullTextSearchEngine (see SURVEY.md):

- tokenize: split on ``[^A-Za-z0-9]+``, drop empties, lowercase
  (reference: src/main/java/webdata/parsing/Tokenizer.java:9,17-22)
- dense 1-based docIDs over stable (conv_id, turn_idx) ordering
  (reference: src/main/java/webdata/IndexWriter.java:47-58)
- postings: doc-gap + varint-compressed blocks, front-coded dictionary
  (reference: src/main/java/webdata/inverted_index/PostingListWriter.java:41-61)
- scorers: lnn.ltc vector space, Jelinek–Mercer unigram LM, conv-level
  two-stage search (reference: src/main/java/webdata/ReviewSearch.java:11-284)
  plus BM25 top-k with block-max WAND pruning (the scale path).

Architecture is Spark-first: DataFrame/SQL plans that Catalyst optimizes,
vectorized Arrow/pandas UDFs for the codec hot paths, no per-row Python.
"""

__version__ = "0.1.0"
