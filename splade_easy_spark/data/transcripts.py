"""Deterministic synthetic multi-turn transcript corpus.

Input contract (driver ``input_hint``): an Iceberg/Parquet table
``(conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING,
ts TIMESTAMP)``.  This module synthesises that table at any scale with no
external data, fully distributed: ``spark.range(num_convs)`` fans out over
executors and a ``mapInPandas`` batch generator emits each conversation's
turns from a NumPy RNG seeded by ``(seed, conv_index)`` — so the corpus is
byte-identical no matter the partitioning or cluster size (a requirement for
the N-vs-4N scaling evidence: same input at both parallelism levels).

Shape mirrors FIXTURES.md §1: ~8–64 turns/conversation, roles cycling
user/assistant/tool (hot low-cardinality terms — deliberate skew for the
salting path), Zipfian token mix over a ~5k-word vocabulary, 5–200 tokens
per turn, plus tokenizer edge cases (empty turns, ALL-CAPS/punctuation
variants, repeated tokens).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

VOCAB_SIZE = 5000
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["bash", "search", "python", "browser", "editor"]
_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
    "bra", "cle", "dri", "flo", "gru", "pla", "ste", "tri", "vlo", "kra",
]


def make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pseudo-word vocabulary; word i is a fixed syllable
    composition of its index (no RNG — stable across processes).

    Words for i < 27000 are identical to the original two/three-syllable
    scheme (fixtures and gate hashes depend on them); beyond that the
    base-30 expansion simply continues with more syllables, so arbitrarily
    wide vocabularies (the realistic-vocabulary bench uses 50k+) stay
    collision-free — the old scheme silently recycled words past 27k
    because the digit cycle (10) divides the 3-syllable period (27000).
    Uniqueness is pinned by tests/test_transcripts.py."""
    n = len(_SYLLABLES)
    out = []
    for i in range(size):
        w = _SYLLABLES[i % n] + _SYLLABLES[(i // n) % n]
        j = i // (n * n)
        while j:
            w += _SYLLABLES[j % n]
            j //= n
        out.append(w + str(i % 10))
    return out


def _zipf_probs(size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


_EPOCH = np.datetime64("2025-01-01T00:00:00")


def _zipf_sample(rng: np.random.Generator, cumprobs: np.ndarray, n: int) -> np.ndarray:
    """Inverse-CDF sampling: O(n log V) instead of rng.choice(p=...)'s
    O(n·V) alias setup per call — the generator's hot path at 10^6+ turns."""
    idx = np.searchsorted(cumprobs, rng.random(n), side="right")
    return np.minimum(idx, len(cumprobs) - 1)


def _gen_conv(conv_idx: int, seed: int, vocab: np.ndarray, cumprobs: np.ndarray) -> dict:
    rng = np.random.default_rng(np.uint64(seed * 1_000_003 + conv_idx))
    n_turns = int(rng.integers(8, 65))
    conv_id = f"conv_{conv_idx:08d}"
    rows: dict[str, list] = {
        "conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": [],
    }
    base_ts = _EPOCH + np.timedelta64(int(conv_idx) * 3600, "s")
    for t in range(n_turns):
        role = _ROLES[t % 3] if rng.random() < 0.9 else _ROLES[int(rng.integers(0, 3))]
        tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
        edge = rng.random()
        if edge < 0.02:
            text = ""  # empty-turn edge case
        else:
            n_tok = int(rng.integers(5, 201))
            words = vocab[_zipf_sample(rng, cumprobs, n_tok)]
            if edge < 0.06:  # repeated-token turn
                words = np.repeat(words[: max(1, n_tok // 4)], 4)[:n_tok]
            text = " ".join(words.tolist())
            if edge < 0.10:  # case/punctuation variants
                text = text.upper().replace(" ", ", ", 3) + "!"
            elif edge < 0.14:
                text = text.capitalize() + "."
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(t)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(base_ts + np.timedelta64(t * 30, "s"))
    return rows


def generate_transcripts(
    spark: SparkSession,
    num_convs: int = 100,
    seed: int = 42,
    num_partitions: int | None = None,
    vocab_size: int = VOCAB_SIZE,
) -> DataFrame:
    """Distributed deterministic transcript generator.  ``vocab_size``
    widens the Zipfian vocabulary (default 5000; the realistic-vocabulary
    bench draws from 50k+ so posting lists thin out like a real corpus's
    tail)."""
    if num_partitions is None:
        num_partitions = min(max(1, num_convs // 50), 64)
    vocab = np.array(make_vocab(vocab_size), dtype=object)
    cumprobs = np.cumsum(_zipf_probs(len(vocab)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": [],
            }
            for conv_idx in pdf["id"].to_numpy():
                rows = _gen_conv(int(conv_idx), seed, vocab, cumprobs)
                for k in out:
                    out[k].extend(rows[k])
            yield pd.DataFrame(out)

    return (
        spark.range(0, num_convs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def generate_query_set(
    num_queries: int = 50, seed: int = 4242, vocab_size: int = VOCAB_SIZE
) -> list[dict]:
    """Fixed reference query set (FIXTURES.md §3): texts drawn from the same
    vocabulary (guaranteed hits for most), plus single-term and no-hit
    queries.  Driver-side only — a query set is tiny by definition."""
    vocab = make_vocab(vocab_size)
    probs = _zipf_probs(len(vocab))
    rng = np.random.default_rng(seed)
    queries = []
    for i in range(num_queries):
        qid = f"q_{i:03d}"
        if i % 17 == 5:  # no-hit query: tokens outside the corpus vocabulary
            text = f"zzqx{i} vvwy{i}"
        elif i % 7 == 3:  # single-term query
            text = vocab[int(rng.choice(len(vocab), p=probs))]
        else:
            n = int(rng.integers(2, 7))
            text = " ".join(vocab[j] for j in rng.choice(len(vocab), size=n, p=probs))
        queries.append({"query_id": qid, "text": text})
    return queries
