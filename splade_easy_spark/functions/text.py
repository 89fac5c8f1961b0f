"""Tokenization as pure Catalyst expressions.

The reference tokenizes implicitly through a neural encoder
(``src/splade_easy/utils.py:67-118``); our deterministic analog is a
regex analyzer that must behave identically at build and query time and be
re-expressible in DuckDB SQL for the correctness oracle.  Everything here is
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no UDFs — so
tokenization rides inside the same stage as the parquet scan (column-pruned,
predicate-pushed) at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from splade_easy_spark.config import AnalyzerConfig


def tokenize(col: Column | str, analyzer: AnalyzerConfig | None = None) -> Column:
    """``text -> ARRAY<STRING>`` of analyzer tokens.

    lower() + regexp_extract_all(pattern) + length bounds.  DuckDB oracle
    equivalent: ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
    """
    analyzer = analyzer or AnalyzerConfig()
    c = F.col(col) if isinstance(col, str) else col
    if analyzer.lowercase:
        c = F.lower(c)
    toks = F.regexp_extract_all(c, F.lit(analyzer.token_pattern), 0)
    lo, hi = analyzer.min_token_len, analyzer.max_token_len
    if lo > 1 or hi < 10_000:
        toks = F.filter(toks, lambda t: (F.length(t) >= lo) & (F.length(t) <= hi))
    return toks


def doc_id_expr(conv_id: Column | str = "conv_id", turn_idx: Column | str = "turn_idx") -> Column:
    """Stable document key: ``conv_id || '#' || turn_idx``.

    Matches the reference's string ``Document.doc_id``
    (``src/splade_easy/index.py:24-30``) while keeping the transcript's
    composite key recoverable; the ``(conv_id, turn_idx)`` ordering invariant
    is what the driver's per-turn text-equality check keys on.
    """
    ci = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    ti = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.concat_ws("#", ci, ti.cast("string"))
