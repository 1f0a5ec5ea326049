"""Materialize the golden files of FIXTURES.md §2-§3 (the analog of the
reference's datasets/100.json built by datasets/testScenarioBuilder.py):
expected index contents + expected top-k per scorer for the reference
query set, for the tiny (100-turn) and small (1000-turn) corpora.

Usage: python scripts/make_goldens.py  → tests/goldens/*.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fulltextsearchengine_spark import datagen, oracle  # noqa: E402

K = 10


def build_goldens(name: str, n_turns: int, n_convs: int, vocab_size: int) -> None:
    pdf = datagen.make_transcripts(n_turns=n_turns, n_convs=n_convs, vocab_size=vocab_size, seed=42)
    idx = oracle.build_index(pdf)
    out = dict(idx)
    out["doc_to_length"] = {str(k): v for k, v in idx["doc_to_length"].items()}
    out["doc_to_meta"] = {str(k): v for k, v in idx["doc_to_meta"].items()}
    dest = REPO / "tests" / "goldens"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / f"expected_{name}.json").write_text(json.dumps(out, sort_keys=True))

    vocab = datagen.make_vocab(vocab_size, seed=42)
    queries = datagen.make_queries(vocab, n_queries=25, seed=7)
    qout = {"queries": []}
    for q in queries:
        qout["queries"].append(
            {
                "q": q,
                "k": K,
                "bm25": [[d, s] for d, s in oracle.bm25_search(idx, q, K)],
                "lnn_ltc": [[d, s] for d, s in oracle.vector_space_search(idx, q, K)],
                "lm": [[d, s] for d, s in oracle.language_model_search(idx, q, K)],
                "conv_search": [
                    [c, rel, rank] for c, rel, rank in oracle.conv_search(idx, q, K)
                ],
            }
        )
    (dest / f"expected_queries_{name}.json").write_text(json.dumps(qout, sort_keys=True))
    print(f"{name}: {idx['num_docs']} docs, {idx['unique_tokens']} terms, {len(queries)} queries")


if __name__ == "__main__":
    build_goldens("tiny", 100, 10, 300)
    build_goldens("small", 1000, 100, 2000)
