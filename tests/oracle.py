"""Single-node NumPy/pure-Python oracle restating the reference's semantics.

The reference itself can't be imported in the sandbox (its numba/flatbuffers
deps are absent), so this module re-states the *scoring and ranking
semantics* we must match, with every rule cited to the reference source:

- score = Σ dw·qw over the term intersection, float64 accumulation
  (``src/splade_easy/scoring.py:30-56``: two-pointer merge — equivalent to a
  dict-intersection sum for our term-keyed vectors);
- cosine = dot/(‖d‖·‖q‖) over FULL vector norms, 0 when either norm is 0
  (``src/splade_easy/scoring.py:58-76``);
- query dedup keeps MAX weight (``src/splade_easy/scoring.py:102-114``);
- per-shard k-heap then global ``heapq.nlargest`` merge with score-only key
  (``src/splade_easy/retriever.py:122,194-197``) — ties arbitrary, so the
  comparison helper here checks tie groups as sets (SURVEY.md §7);
- only ``score > 0`` docs are candidates (``src/splade_easy/retriever.py:186``).

BM25 weighting mirrors splade_easy_spark.functions.bm25 exactly.
"""

from __future__ import annotations

import math
import re
from collections import Counter

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def tokenize(text: str, pattern: str = "[a-z0-9]+") -> list[str]:
    return re.findall(pattern, text.lower())


class BM25Oracle:
    def __init__(self, docs: dict[str, str], k1: float = K1_DEFAULT, b: float = B_DEFAULT):
        """docs: doc_id -> raw text."""
        self.k1, self.b = k1, b
        self.tf: dict[str, Counter] = {d: Counter(tokenize(t)) for d, t in docs.items()}
        self.dl = {d: sum(c.values()) for d, c in self.tf.items()}
        self.n_docs = len(docs)
        self.avgdl = sum(self.dl.values()) / max(1, self.n_docs)
        self.df = Counter()
        for c in self.tf.values():
            for term in c:
                self.df[term] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def doc_weight(self, term: str, doc_id: str) -> float:
        tf = self.tf[doc_id].get(term, 0)
        if tf == 0:
            return 0.0
        dl = self.dl[doc_id]
        denom = tf + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
        return self.idf(term) * tf * (self.k1 + 1) / denom

    def doc_vector(self, doc_id: str) -> dict[str, float]:
        return {t: self.doc_weight(t, doc_id) for t in self.tf[doc_id]}

    def doc_norm(self, doc_id: str) -> float:
        return math.sqrt(sum(w * w for w in self.doc_vector(doc_id).values()))

    def query_terms(self, text: str) -> dict[str, float]:
        # dedup keeping max weight, cf. scoring.py:102-114 (all weights 1.0)
        return {t: 1.0 for t in tokenize(text)}

    def score(self, query: dict[str, float], doc_id: str, use_cosine: bool = False) -> float:
        dot = 0.0
        for t, qw in query.items():
            dot += qw * self.doc_weight(t, doc_id)
        if not use_cosine:
            return dot
        dn = self.doc_norm(doc_id)
        qn = math.sqrt(sum(w * w for w in query.values()))
        if dn == 0.0 or qn == 0.0:
            return 0.0  # cf. scoring.py:69-72
        return dot / (dn * qn)

    def search(
        self,
        query_text: str,
        top_k: int = 10,
        use_cosine: bool = False,
        deleted: set[str] | None = None,
        extend_ties: bool = True,
    ) -> list[tuple[str, float]]:
        """Full ranking, top-k; with ``extend_ties`` the returned list also
        includes every doc tied (within 1e-9) with the rank-k score, so the
        caller can treat the k-boundary tie group as a set."""
        q = self.query_terms(query_text)
        cands = []
        for d in self.tf:
            if deleted and d in deleted:
                continue
            s = self.score(q, d, use_cosine)
            if s > 0:
                cands.append((d, s))
        cands.sort(key=lambda x: (-x[1], x[0]))
        if len(cands) <= top_k or not extend_ties:
            return cands[:top_k]
        kth = cands[top_k - 1][1]
        out = cands[:top_k]
        for d, s in cands[top_k:]:
            if abs(s - kth) <= 1e-9 * max(1.0, abs(kth)):
                out.append((d, s))
            else:
                break
        return out


def assert_topk_matches(
    engine: list[tuple[str, float]],
    oracle_ext: list[tuple[str, float]],
    top_k: int,
    tol: float = 1e-6,
) -> None:
    """Rank-identity up to legitimate ties: scores equal per rank within
    ``tol``; within each tie band, doc_id *sets* must match (boundary band:
    engine's members ⊆ oracle's extended band)."""
    n_expected = min(top_k, len(oracle_ext))
    assert len(engine) == min(top_k, n_expected), (
        f"length mismatch: engine {len(engine)} vs oracle {n_expected}"
    )
    for i, (ed, es) in enumerate(engine):
        os_ = oracle_ext[i][1]
        assert abs(es - os_) <= tol * max(1.0, abs(os_)), (
            f"rank {i}: engine score {es} vs oracle {os_} (doc {ed})"
        )
    # tie-band set comparison
    i = 0
    while i < len(engine):
        j = i
        band_score = oracle_ext[i][1]
        while j < len(engine) and abs(oracle_ext[j][1] - band_score) <= tol * max(1.0, abs(band_score)):
            j += 1
        engine_band = {d for d, _ in engine[i:j]}
        # oracle band may extend beyond k (boundary ties)
        oracle_band = {
            d
            for d, s in oracle_ext
            if abs(s - band_score) <= tol * max(1.0, abs(band_score))
        }
        assert engine_band <= oracle_band, (
            f"band at rank {i}: engine {engine_band - oracle_band} not in oracle band"
        )
        i = j
