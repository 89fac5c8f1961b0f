"""Lucene-QueryParser-style query strings over the engine's primitives.

Grammar (a deliberately small, well-defined subset of Lucene syntax):

    "hash join"        quoted  -> exact phrase constraint (token sequence)
    +spark             must    -> doc must contain the term
    -scan              not     -> doc must not contain the term
    role:user          field   -> metadata equality filter (doc_filter);
                                  int-valued RHS compares numerically
    fast               bare    -> should-term (scores if present)
    spask~2            fuzzy   -> edit-distance expansion (should, boosted
                                  by closeness like fuzzy_search)
    sp*                prefix  -> dictionary expansion (should, unit wt)

Ranking: BM25 over the union of scored terms (must + should + the
expansions + the phrase's terms), must-conjunction enforced, must_not
excluded, phrases verified as token sequences, filters applied with
full-corpus idf (the engine's standard filter semantics).

The parse step is pure Python (unit-testable without Spark); execution
composes the Searcher primitives, so every clause keeps the plan shape
documented for its standalone verb (EXPLAIN.md).

Reference surface analog: Lucene's classic QueryParser — the reference
repo itself has no query language (``src/splade_easy/retriever.py`` takes
raw text only); this is an extension.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ParsedQuery:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    filters: list[tuple[str, str]] = field(default_factory=list)
    fuzzy: list[tuple[str, int]] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)

    def is_empty(self) -> bool:
        return not (
            self.must or self.should or self.phrases or self.fuzzy or self.prefixes
        )


_TOKEN = re.compile(
    r"""
    \s*(?:
        (?P<phrase>[+-]?"(?P<ph>[^"]*)")
      | (?P<field>(?P<fname>[A-Za-z_][A-Za-z0-9_]*):(?P<fval>[^\s]+))
      | (?P<term>[+-]?[^\s]+)
    )
    """,
    re.VERBOSE,
)


def parse_query(qs: str) -> ParsedQuery:
    """Parse a query string; raises ValueError on nothing-to-search
    (filters/exclusions alone cannot rank)."""
    out = ParsedQuery()
    pos = 0
    while pos < len(qs):
        m = _TOKEN.match(qs, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("phrase") is not None:
            raw = m.group("phrase")
            ph = m.group("ph").strip()
            if not ph:
                continue
            if raw.startswith("-"):
                raise ValueError("negated phrases are not supported")
            out.phrases.append(ph)
        elif m.group("field") is not None:
            out.filters.append((m.group("fname"), m.group("fval")))
        else:
            t = m.group("term")
            sign = ""
            if t[0] in "+-":
                sign, t = t[0], t[1:]
            if not t:
                continue
            fz = re.fullmatch(r"(.+?)~(\d)?", t)
            if fz and sign == "":
                out.fuzzy.append((fz.group(1), int(fz.group(2) or 2)))
                continue
            if t.endswith("*") and len(t) > 1 and sign == "":
                out.prefixes.append(t[:-1])
                continue
            if sign == "+":
                out.must.append(t)
            elif sign == "-":
                out.must_not.append(t)
            else:
                out.should.append(t)
    if out.is_empty():
        raise ValueError(
            f"query has nothing to rank (filters/exclusions alone): {qs!r}"
        )
    return out
