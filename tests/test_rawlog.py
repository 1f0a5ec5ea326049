"""Raw-text parser stack (sources/rawlog): round-trip, coercion, and
splittable-file parity with the reference parsers
(parsing/LinesMemoryParser.java, SequentialReviewParser.java,
Review.java:41-88)."""

from __future__ import annotations

from fulltextsearchengine_spark.sources.rawlog import (
    parse_transcript_blocks,
    parse_transcript_log_lines,
    read_transcript_blocks,
    write_transcript_blocks,
)
from fulltextsearchengine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _as_tuples(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in df.collect()
    )


def test_block_roundtrip(spark, tiny_transcripts_pdf, tmp_path):
    src = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    path = str(tmp_path / "blocks")
    write_transcript_blocks(src, path)
    back = read_transcript_blocks(spark, path)
    assert back.schema == TRANSCRIPT_SCHEMA
    assert _as_tuples(back) == _as_tuples(src)


def test_block_parse_parallelizes(spark, tiny_transcripts_pdf, tmp_path):
    # the datasource, not the driver, splits records: many files -> many
    # input partitions, same rows (SequentialReviewParser's single-thread
    # scan is the thing this replaces)
    src = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA).repartition(4)
    path = str(tmp_path / "blocks_many")
    write_transcript_blocks(src, path)
    back = read_transcript_blocks(spark, path)
    assert back.rdd.getNumPartitions() >= 2
    assert back.count() == len(tiny_transcripts_pdf)


def test_field_coercion_defaults(spark):
    # Review.fromFields policy (Review.java:41-88): malformed -> default,
    # out-of-range -> clamped, record never dropped
    blocks = [
        # bad turn_idx -> 0; unknown role -> user
        "conv/id: c1\nturn/idx: xx\nturn/role: wizard\nturn/text: hello",
        # negative turn_idx -> clamped to 0; role case-folded
        "conv/id: c2\nturn/idx: -3\nturn/role: ASSISTANT\nturn/text: hi",
        # missing optional fields -> null tool/ts, missing text -> ''
        "conv/id: c3\nturn/idx: 7\nturn/role: tool",
        # unparsable ts -> null, not an error
        "conv/id: c4\nturn/idx: 1\nturn/role: user\nturn/ts: not-a-time\nturn/text: t",
        # no conv/id at all -> not a record, dropped
        "turn/idx: 9\nturn/text: orphan",
    ]
    df = parse_transcript_blocks(spark.createDataFrame([(b,) for b in blocks], ["value"]))
    rows = {r["conv_id"]: r for r in df.collect()}
    assert set(rows) == {"c1", "c2", "c3", "c4"}
    assert (rows["c1"]["turn_idx"], rows["c1"]["role"]) == (0, "user")
    assert (rows["c2"]["turn_idx"], rows["c2"]["role"]) == (0, "assistant")
    assert rows["c3"]["text"] == "" and rows["c3"]["tool"] is None and rows["c3"]["ts"] is None
    assert rows["c4"]["ts"] is None and rows["c4"]["text"] == "t"


def test_log_line_parser(spark):
    lines = [
        "2026-01-01 00:03:00 | conv_42#3 | assistant | tool=search | find the docs",
        "2026-01-01 00:04:00 | conv_42#4 | user | tool= | thanks | with | pipes",
        "garbage line with no structure",
    ]
    df = parse_transcript_log_lines(spark.createDataFrame([(l,) for l in lines], ["value"]))
    rows = sorted(df.collect(), key=lambda r: r["turn_idx"])
    assert len(rows) == 2
    assert rows[0]["tool"] == "search" and rows[0]["text"] == "find the docs"
    # greedy last group keeps pipes inside the text field
    assert rows[1]["tool"] is None and rows[1]["text"] == "thanks | with | pipes"
    assert rows[0]["ts"] is not None


def test_parsed_blocks_feed_index_build(spark, tiny_transcripts_pdf, tmp_path):
    # end-to-end: raw text -> parser -> same index as the structured path
    from fulltextsearchengine_spark import oracle
    from fulltextsearchengine_spark.operators.index_build import build_index

    src = spark.createDataFrame(tiny_transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    path = str(tmp_path / "blocks_e2e")
    write_transcript_blocks(src, path)
    idx = build_index(read_transcript_blocks(spark, path))
    golden = oracle.build_index(tiny_transcripts_pdf)
    assert idx.docs.count() == golden["num_docs"]
    got_terms = {r["term"]: (r["df"], r["cf"]) for r in idx.terms.collect()}
    want_terms = {
        t: (golden["term_to_document_frequency"][t], golden["term_to_collection_frequency"][t])
        for t in golden["term_to_postings"]
    }
    assert got_terms == want_terms
