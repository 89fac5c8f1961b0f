"""Query-string parser (pure-Python unit tests) + Searcher.query
integration against manual composition of the primitives."""

import pytest
from pyspark.sql import functions as F

from splade_easy_spark.query.parser import parse_query


def test_parse_clauses():
    p = parse_query('+spark "hash join" -scan role:user fast spask~1 sp* turn_idx:3')
    assert p.must == ["spark"]
    assert p.phrases == ["hash join"]
    assert p.must_not == ["scan"]
    assert p.filters == [("role", "user"), ("turn_idx", "3")]
    assert p.should == ["fast"]
    assert p.fuzzy == [("spask", 1)]
    assert p.prefixes == ["sp"]


def test_parse_defaults_and_edges():
    p = parse_query("a b~ c*")
    assert p.should == ["a"]
    assert p.fuzzy == [("b", 2)]  # bare ~ defaults to distance 2
    assert p.prefixes == ["c"]
    # a lone '*' is a plain term, not an empty prefix
    assert parse_query("*").should == ["*"]
    # signed fuzzy/prefix markers bind to must/must_not as literal terms
    p2 = parse_query("+x~2 keep")
    assert p2.must == ["x~2"] and p2.should == ["keep"]
    with pytest.raises(ValueError):
        parse_query("-only role:user")  # nothing to rank
    with pytest.raises(ValueError):
        parse_query('-"no negated phrases" x')
    assert parse_query('""  x').should == ["x"]  # empty phrase ignored


def test_query_integration(spark, tmp_path):
    from splade_easy_spark.config import IndexConfig
    from splade_easy_spark.data import generate_transcripts
    from splade_easy_spark.index import build_index
    from splade_easy_spark.query import Searcher

    cfg = IndexConfig(build_partitions=8, term_buckets=16, segment_docs=256, block_size=64)
    idx = str(tmp_path / "idx")
    build_index(spark, generate_transcripts(spark, num_convs=12, seed=3), idx, cfg)
    s = Searcher(spark, idx, cfg)

    # composed query == manual composition of the primitives
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.query('+baba0 diba2 -foba3 role:user', top_k=10).collect()
    ]
    manual = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.boolean_search(
            must=["baba0"], should=["diba2"], must_not=["foba3"], top_k=10,
            doc_filter=F.col("role") == "user",
        ).collect()
    ]
    assert got == manual and got

    # phrase clause restricts to sequence-verified docs with unchanged scores
    ph = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.query('+baba0 +ceba1 "baba0 ceba1"', top_k=100).collect()
    ]
    base = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.boolean_search(must=["baba0", "ceba1"], top_k=10**6).collect()
    }
    seq = {r["doc_id"] for r in s.phrase_search("baba0 ceba1", top_k=10**6).collect()}
    assert ph and {d for d, _ in ph} <= seq
    for d, sc in ph:
        assert base[d] == sc

    # numeric field filter compares as int
    t3 = s.query("baba0 turn_idx:3", top_k=50).collect()
    assert t3 and all(r["turn_idx"] == 3 for r in t3)
