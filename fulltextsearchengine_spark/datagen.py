"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Schema exactly per BASELINE.json ``input_hint``:
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp). Zipf vocabulary with stopword-heavy mass (skew tests),
mixed case, punctuation separators, empty texts, repeated-token runs and
non-ASCII chars that the ASCII tokenizer must drop. Seeded; the row
order is SHUFFLED so engines must be order-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["bash", "search", "browser", None], dtype=object)

_PUNCT = np.array([" ", ", ", "! ", " -- ", "\n", "; ", "?  ", "\t"])
_NOISE = np.array(["", "", "", "", " département", " 데이터", " Ωmega", " ", ""])


def make_vocab(size: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    out = []
    while len(out) < size:
        n = rng.integers(2, 10)
        w = "".join(rng.choice(letters, size=n))
        if w not in words:
            words.add(w)
            out.append(w)
    return np.array(out)


def make_transcripts(
    n_turns: int = 1000,
    n_convs: int = 100,
    vocab_size: int = 2000,
    seed: int = 42,
    zipf_a: float = 1.3,
    max_turn_tokens: int = 40,
) -> pd.DataFrame:
    """Seeded synthetic transcript table, shuffled row order."""
    rng = np.random.default_rng(seed)
    vocab = make_vocab(vocab_size, seed)

    conv_of_turn = np.sort(rng.integers(0, n_convs, size=n_turns))
    conv_ids = np.array([f"conv_{i:06d}" for i in range(n_convs)])
    # dense 0-based turn_idx within conv
    turn_idx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv_of_turn, return_index=True)
    for s, e in zip(starts, np.append(starts[1:], n_turns)):
        turn_idx[s:e] = np.arange(e - s, dtype=np.int32)

    texts = []
    for i in range(n_turns):
        n_tok = int(rng.integers(0, max_turn_tokens))
        if n_tok == 0:
            texts.append("" if rng.random() < 0.5 else "   ...!?")
            continue
        # Zipf-ranked draws -> heavy stopword mass at low ranks
        ranks = np.minimum(rng.zipf(zipf_a, size=n_tok) - 1, vocab_size - 1)
        words = vocab[ranks]
        if rng.random() < 0.15:  # repeated-token run
            words = np.concatenate([words, np.repeat(words[0], rng.integers(2, 6))])
        # mixed case
        case_mask = rng.random(len(words)) < 0.2
        words = np.where(case_mask, np.char.upper(words.astype(str)), words)
        seps = rng.choice(_PUNCT, size=len(words))
        text = "".join(w + s for w, s in zip(words, seps))
        text += str(rng.choice(_NOISE))
        texts.append(text)

    ts0 = np.datetime64("2026-01-01T00:00:00")
    ts = ts0 + (conv_of_turn.astype("timedelta64[h]") * 24) + turn_idx.astype("timedelta64[m]")

    df = pd.DataFrame(
        {
            "conv_id": conv_ids[conv_of_turn],
            "turn_idx": turn_idx,
            "role": rng.choice(ROLES, size=n_turns),
            "text": texts,
            "tool": rng.choice(TOOLS, size=n_turns),
            "ts": ts,
        }
    )
    # shuffle: engines must be order-invariant
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def make_queries(vocab: np.ndarray, n_queries: int = 50, seed: int = 7) -> list[list[str]]:
    """Reference query set: 1-5 in-vocab terms + OOV terms + empty query."""
    rng = np.random.default_rng(seed)
    queries: list[list[str]] = [[]]
    for _ in range(n_queries - 3):
        n = int(rng.integers(1, 6))
        ranks = np.minimum(rng.zipf(1.3, size=n) - 1, len(vocab) - 1)
        queries.append([str(w) for w in vocab[ranks]])
    queries.append(["zzznotaword"])
    queries.append([str(vocab[0]), "zzznotaword"])
    return queries


def make_transcripts_bulk(
    n_turns: int,
    n_convs: int,
    vocab_size: int = 50_000,
    seed: int = 42,
    zipf_a: float = 1.3,
    mean_turn_tokens: int = 60,
) -> pd.DataFrame:
    """Fully-vectorized large-corpus generator for benchmarks: Zipf token
    soup, space-joined (no punctuation/noise features — those are for the
    correctness corpus in make_transcripts). ~10^6 turns/sec to build."""
    rng = np.random.default_rng(seed)
    vocab = make_vocab(vocab_size, seed)

    lens = rng.poisson(mean_turn_tokens, size=n_turns).clip(1)
    total = int(lens.sum())
    ranks = np.minimum(rng.zipf(zipf_a, size=total) - 1, vocab_size - 1)
    words = vocab[ranks]
    flat = pd.Series(words)
    turn_of_token = np.repeat(np.arange(n_turns), lens)
    texts = flat.groupby(turn_of_token).agg(" ".join)

    conv_of_turn = np.sort(rng.integers(0, n_convs, size=n_turns))
    turn_idx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv_of_turn, return_index=True)
    for s, e in zip(starts, np.append(starts[1:], n_turns)):
        turn_idx[s:e] = np.arange(e - s, dtype=np.int32)

    ts0 = np.datetime64("2026-01-01T00:00:00")
    ts = ts0 + conv_of_turn.astype("timedelta64[s]") * 3600 + turn_idx.astype("timedelta64[s]")
    df = pd.DataFrame(
        {
            "conv_id": pd.Series(conv_of_turn).map(lambda i: f"conv_{i:08d}"),
            "turn_idx": turn_idx,
            "role": rng.choice(ROLES, size=n_turns),
            "text": texts.to_numpy(),
            "tool": rng.choice(TOOLS, size=n_turns),
            "ts": ts,
        }
    )
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
