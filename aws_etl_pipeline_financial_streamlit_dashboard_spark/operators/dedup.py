"""Deduplication operators for LLM training-data pipelines
(driver-mandated extension surface, SURVEY.md §2.13).

Four tiers, cheapest first — the standard corpus-dedup ladder:

1. exact:      hash-groupBy on content (one shuffle on the hash)
2. simhash:    64-bit near-dup signature, groupBy on signature
3. minhash/LSH: shingle → minhash → band-bucket join (candidate pairs
               grow ~linearly, not n²)
4. ngram-jaccard: exact verify on candidate pairs via inverted-index
               join (explode shingles, join on shingle, count overlap)

At 100 TB only the signatures and candidate pairs shuffle — never the
raw text twice.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import tokens
from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import round_half_up as rhu


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism
    ahead of a high fan-out stage (shingle explode, per-shingle hash
    families). Spark sizes scan partitions by INPUT bytes; a shingle
    stage multiplies the work ~|tokens|× beyond what byte-based
    planning saw, so a corpus that fits in a few splits would run its
    most expensive stage on a few cores. Guarded: when the scan already
    has at least default-parallelism splits (any real corpus), this is
    the identity — no exchange is added, so the 100 TB plan is
    untouched. The repartition shuffles the input once, which is
    negligible against the generate stage it parallelizes.

    The fast path of the guard reads ``df.inputFiles()`` — a
    logical-plan file listing, no physical planning — so the 100 TB
    case (a corpus with ≥ default-parallelism files, which
    parallelizes its generate stage without help) decides without
    forcing a full physical plan per call. The file count is only
    evidence about the frame's width while the plan is scan-rooted
    (narrow ops over the scan): round 13's all-distinct probe caught
    the guard no-op'ing on a dropDuplicates OUTPUT over a 32-file
    input — ``inputFiles()`` still reported the scan's 32 files, but
    the dedup exchange had been AQE-coalesced to ONE partition (the
    documented byte-sparse/compute-dense trap) and the shingle join
    ran a single core, 53 s vs 6 s (docs/PERF.md round-13). The fast
    path therefore applies only when no exchange-introducing operator
    sits between the scan and here; frames with an upstream
    aggregate/join/dedup/sort/window/repartition fall back to the
    ``df.rdd.getNumPartitions()`` probe, which reflects the
    post-shuffle (and AQE-final) width."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    # _scan_rooted is consulted ONLY when the file count could fire
    # the fast path: its analyzed-plan toString costs ~1.4 s on the
    # components entries' big iterative plans (measured, round 13),
    # while under-split frames (the whole local catalog — single-file
    # tables) never need the answer.
    if len(files) >= target and _scan_rooted(df):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# Logical operators KNOWN to preserve the scan's partitioning (narrow,
# no exchange, no partition collapse) — the fan_out fast path is only
# valid when every node in the analyzed plan is one of these. Round 14
# (VERDICT r13 item 2): the previous form was a DENYLIST of
# exchange-introducing node names, which fails OPEN — SQL-path
# ``Distinct`` (only the DataFrame API's dropDuplicates analyzes to
# ``Deduplicate``), ``Intersect`` and ``Except`` all introduce
# exchanges but were not listed, so a ``SELECT DISTINCT`` frame over a
# ≥default-parallelism-file scan would reproduce exactly the round-13
# single-core trap. An allowlist fails CLOSED: any unknown operator
# falls back to the authoritative ``rdd.getNumPartitions()`` probe.
_NARROW_NODES = frozenset(
    {
        "Relation",  # file-source scan (analyzed-plan print)
        "LogicalRelation",
        "LogicalRDD",
        "LocalRelation",
        "Project",
        "Filter",
        "SubqueryAlias",
        "View",  # temp-view reference (wraps the relation)
        "Generate",  # explode — row fan-out, same partitions
        "Union",  # concatenates children's partitions
        "Sample",
        "ResolvedHint",
        "UnresolvedHint",
    }
)

# First identifier on a plan line, past tree-drawing prefixes
# (`+- `, `:- `, `:  +- `…) and the SQL-text quote Catalyst prints for
# unresolved nodes. Matching the LINE-START token (not a bare substring
# of the whole toString) also stops a column alias that happens to
# contain a node name from influencing the verdict.
_NODE_NAME = re.compile(r"^[\s:+\-]*'?([A-Za-z][A-Za-z0-9]*)")


def _scan_rooted(df: DataFrame) -> bool:
    """True when every node of the analyzed logical plan is a
    known-narrow operator (see ``_NARROW_NODES``) — i.e. the frame is
    the scan plus narrow ops, so ``inputFiles()`` counts its actual
    partitions. One py4j toString on the ANALYZED plan (no physical
    planning, no jobs); on any doubt (py4j failure, unknown node)
    returns False so the caller uses the authoritative partition
    probe."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        m = _NODE_NAME.match(line)
        if m and m.group(1) not in _NARROW_NODES:
            return False
    return True


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per identical content (A1-style
    argmin; deterministic, unlike dropDuplicates' arbitrary winner).
    Shuffles the md5 of content, not the content itself, by
    pre-hashing — at corpus scale the shuffle payload is 16 bytes/row.

    The hash key uses a null-safe, length-prefixed encoding: each column
    becomes ``v<len>:<value>`` (or ``n`` for NULL) before concatenation.
    A bare ``concat_ws`` would silently skip NULLs, colliding NULL with
    '' and letting multi-column contents shift across boundaries
    (('a', NULL, 'b') == ('a', 'b', NULL)); the length prefix also makes
    the encoding injective when values contain the separator itself.
    """
    parts = [
        F.coalesce(
            F.concat(
                F.lit("v"),
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            ),
            F.lit("n"),
        )
        for c in content_cols
    ]
    key = F.md5(F.concat_ws("\x00", *parts))
    w = Window.partitionBy(key).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (array<string>).
    Documents shorter than ``n`` tokens yield their full token join.

    Built from n−1 ``zip_with`` passes over shifted ``slice``s — each
    pass is one linear walk of the token array. The naive form (a
    ``transform`` over indices with a per-index ``slice``) re-walks the
    array per element inside the interpreted HOF path: O(|tokens|²)
    and measured 8× slower even on 50-token documents (same trap as
    x26's bigrams). Short-document edge: past-the-end slices are
    empty, ``zip_with`` null-pads, and the null branch keeps the
    shorter gram — identical to ``concat_ws`` skipping missing
    elements. ``tokens()`` never yields an empty array (empty text
    splits to ``[""]``), so ``m ≥ 1`` always produces ≥1 gram; NULL
    text coalesces to the same ``[""]`` single-gram shape (the
    historical ``concat_ws``-on-null behavior, which x03 signatures
    depend on)."""
    toks = F.coalesce(tokens(text), F.array(F.lit("")))
    m = F.greatest(F.size(toks) - n + 1, F.lit(1))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, m),
            lambda a, b: F.when(b.isNull(), a).otherwise(
                F.concat(a, F.lit(" "), b)
            ),
        )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    hot_shingle_cap: int | None = None,
) -> DataFrame:
    """All document pairs with n-gram Jaccard similarity ≥ threshold,
    via an inverted-index self-join: explode shingles, equi-join on the
    shingle, count intersections, |A∪B| = |A|+|B|−|A∩B|.

    Scale shape: the join key is the shingle (high cardinality, well
    distributed), so candidate generation is proportional to true
    overlap, not to n². The residual hazard is the HOT shingle — a
    boilerplate n-gram appearing in k documents contributes k² rows to
    the self-join (one viral footer in 1M docs = 10¹² join rows).
    ``hot_shingle_cap`` removes shingles whose document frequency
    exceeds the cap from CANDIDATE GENERATION only; verification then
    recomputes exact Jaccard from the full shingle sets, so surviving
    pairs carry the identical similarity as the uncapped path. The only
    semantic delta: a pair whose entire overlap is hot shingles is
    never proposed — at a sane cap those pairs share only boilerplate,
    which is exactly the overlap near-dup detection should ignore.
    AQE splits whatever skew remains under the cap.
    """
    sh = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    ex = sh.select("doc", "n_sh", F.explode("shingles").alias("s"))

    if hot_shingle_cap is not None:
        cold = (
            ex.groupBy("s")
            .agg(F.count("*").alias("df_s"))
            .filter(F.col("df_s") <= hot_shingle_cap)
            .select("s")
        )
        ex_gen = ex.join(cold, "s")  # candidate generation on cold shingles
        a, b = ex_gen.alias("a"), ex_gen.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct()
        )
        sets = sh.select("doc", "shingles")
        verified = (
            candidates.join(
                sets.withColumnsRenamed({"doc": "doc_a", "shingles": "sh_a"}), "doc_a"
            )
            .join(
                sets.withColumnsRenamed({"doc": "doc_b", "shingles": "sh_b"}), "doc_b"
            )
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "jaccard",
                rhu(
                    F.col("inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                    6,
                ),
            )
        )
        return verified.filter(F.col("jaccard") >= threshold).select(
            "doc_a", "doc_b", "jaccard"
        )

    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
        )
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n_sh").alias("na"),
            F.first("b.n_sh").alias("nb"),
        )
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", rhu(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 60  # md5-derived hash width (15 hex chars < 2⁶³)


def simhash_gram_hash(gram: Column) -> Column:
    """Shingle → non-negative 60-bit integer from the first 15 hex
    chars of md5. md5 (not xxhash64) so signatures are reproducible by
    any engine — DuckDB computes the identical value as
    ``('0x' || substr(md5(s),1,15))::UBIGINT`` — which is what makes
    x03 fully oracle-checkable (the same upgrade x04's minhash got).
    60 bits keeps the value inside a signed BIGINT in both engines."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def simhash(text: Column, n: int = 2, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature (Charikar'02) as a pure column expression:
    per-shingle md5-derived 60-bit hash, sum ±1 per bit position over
    all shingles, sign → bit (ties → 0). Near-identical docs differ in
    few bits.

    NOTE: higher-order functions run on Spark's interpreted expression
    path, and this builds ``bits`` separate array walks per row —
    measured ~40 ms/doc at 50 shingles. Fine for ad-hoc column use;
    any per-table computation must go through :func:`simhash_table`,
    which produces bit-identical signatures from whole-stage-codegen'd
    conditional sums (measured 170× faster on the documents table)."""
    grams = word_shingles(text, n)
    hashes = F.transform(grams, lambda g: simhash_gram_hash(g))
    def vote(i: int):
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit_vote = F.aggregate(hashes, F.lit(0), vote(i))
        sig = sig + F.when(
            bit_vote > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    bits: int = SIMHASH_BITS,
    out_col: str = "simhash",
) -> DataFrame:
    """(id, simhash) for every row of ``df``, bit-identical to
    :func:`simhash` but computed on the codegen fast path: explode the
    shingle hashes, then one hash-aggregate with ``bits`` conditional
    long sums (bit i set ⇔ 2·|hashes with bit i| > |hashes|; ties and
    empty/NULL texts → 0, matching the ±1-vote formulation).

    Scale shape: the exploded hashes collapse map-side — every shingle
    of a document lives in its source partition, so partial aggregation
    reduces to one row per document before the exchange; the shuffle
    carries 64 counters per document, never the shingle stream. Rows
    with duplicate ids are merged into one signature (ids are assumed
    unique, as in every corpus table here)."""
    ex = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode_outer(
            F.transform(
                word_shingles(F.col(text_col), n),
                lambda g: simhash_gram_hash(g),
            )
        ).alias("__h"),
    )
    counts = ex.groupBy(id_col).agg(
        F.count("__h").alias("__n"),
        *[
            F.sum(F.shiftrightunsigned(F.col("__h"), i).bitwiseAND(F.lit(1)))
            .alias(f"__b{i}")
            for i in range(bits)
        ],
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"__b{i}") * 2 > F.col("__n"),
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
    return counts.select(F.col(id_col), sig.alias(out_col))


def simhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Group documents by identical simhash signature; keep min id per
    group (near-dup collapse at the 0-hamming-distance tier). Banded
    hamming-neighbor search extends this to distance>0 without n².
    Signatures come from :func:`simhash_table` (codegen path); the
    winner rank runs on the (id, simhash) projection and only winners
    join back to the full rows."""
    sigs = simhash_table(df, id_col, text_col, n=n)
    w = Window.partitionBy("simhash").orderBy(F.col(id_col))
    keep = (
        sigs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return df.join(keep, id_col)


MINHASH_P = (1 << 31) - 1  # Mersenne prime 2³¹−1


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (aᵢ, bᵢ) over the Mersenne
    prime 2³¹−1 for the minhash permutation family: fixed constants
    (reproducible across runs AND engines — the DuckDB oracle embeds
    the same values), with h, a, b < P keeping h·a + b < 2⁶² so the
    arithmetic never overflows a long under ANSI mode."""
    return [
        ((2 * i + 1) * 0x9E3779B9 % MINHASH_P or 1, (i * 0xC2B2AE3D) % MINHASH_P)
        for i in range(num_hashes)
    ]


def minhash_shingle_hash(gram: Column) -> Column:
    """Shingle → integer in [0, P): the first 8 hex chars of md5,
    reduced mod the Mersenne prime. md5 (not xxhash64) so the hash —
    and therefore every signature, band bucket, and candidate pair —
    is reproducible by any engine: DuckDB computes the identical value
    as ``('0x' || substr(md5(s),1,8))::UBIGINT % P``, which is what
    makes x04 fully oracle-checkable instead of rows-only."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(MINHASH_P),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures via k independent affine permutations of
    md5-derived shingle hashes: sig_i = min over shingles of
    (a_i * h + b_i mod p). Deterministic constants → reproducible
    across runs and engines (:func:`minhash_shingle_hash`).

    Computed as explode → one hash-aggregate with k codegen'd ``min``
    columns, not k ``array_min(transform(...))`` walks: higher-order
    functions run interpreted, so the k-transform form costs k
    interpreted array passes per document (the x03/x26 trap), while
    the exploded form keeps every permutation inside whole-stage
    codegen. Map-side partial aggregation collapses each document's
    shingles inside its scan partition, so the exchange carries k
    longs per document — the signature, never the shingle stream.
    ``word_shingles`` always yields ≥1 gram (empty/NULL text → [""]),
    so the inner explode drops no documents."""
    coeffs = minhash_coeffs(num_hashes)
    ex = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.transform(
                word_shingles(F.col(text_col), n),
                lambda g: minhash_shingle_hash(g),
            )
        ).alias("__h"),
    )
    mins = ex.groupBy("doc").agg(
        *[
            F.min(
                F.pmod(F.col("__h") * F.lit(a) + F.lit(b), F.lit(MINHASH_P))
            ).alias(f"__m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    sig = F.array(*[F.col(f"__m{i}") for i in range(num_hashes)])
    return mins.select("doc", sig.alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs with exact Jaccard verify.

    Banding: split the signature into ``bands`` bands of r rows; docs
    agreeing on any whole band bucket-join as candidates (probability
    s^r per band for true similarity s — the classic S-curve). Then
    verify candidates with exact shingle Jaccard. Only signatures and
    candidate id-pairs shuffle; the S-curve keeps candidates ~linear.
    """
    rows = num_hashes // bands
    # lazily checkpointed, NOT cache(): the banding self-join consumes
    # the signatures twice, and a cache would pin every exchange in
    # the cached subtree at the session's static shuffle width (AQE
    # cannot re-plan cached plans — the x10 lesson, round 13) AND make
    # repeated timings read the CacheManager instead of computing.
    # The checkpoint materializes once on first use, serves both join
    # branches, is per-instance (no session-wide leak), and carries k
    # longs per document. Fault-tolerance trade (ADVICE r13): a LOCAL
    # checkpoint lives in executor block storage, so on a multi-node
    # cluster an executor loss fails the job instead of recomputing —
    # acceptable here because the signatures are one narrow projection
    # of the input (cheap to re-run the job), unlike the iterative
    # operators whose accumulated rounds route through
    # lineage.truncate_lineage(reliable=True). A deployment that needs
    # durable intermediates should persist signatures as a table.
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).localCheckpoint(
        eager=False
    )
    # Band bucket = the comma-joined band slice itself (portable string
    # equality — the same value any engine derives from the signature).
    # At corpus scale wrap it in a hash to shrink the shuffle payload;
    # the candidate set is identical either way (equality is equality).
    banded = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.element_at("minhash", b * rows + r + 1).cast("string") for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # Exact verify via shingle sets (join back the shingle arrays).
    sh = df.select(
        F.col(id_col).alias("doc"), word_shingles(F.col(text_col), n).alias("sh")
    )
    out = (
        candidates.join(sh.withColumnsRenamed({"doc": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn(
            "jaccard",
            # rhu, not F.round: Spark ROUND is HALF_UP, DuckDB's is
            # HALF_EVEN — a boundary value would break oracle parity
            rhu(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def incremental_dedup_flags(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    bloom_prune: tuple[int, int] | None = None,
) -> DataFrame:
    """Dedup a NEW ingest batch against the EXISTING corpus: returns
    ``new_df`` with ``dup_exact`` (byte-identical text exists in the
    corpus) and ``dup_near`` (n-gram Jaccard ≥ threshold partner in
    the corpus, and not already an exact dup).

    ``bloom_prune=(m, k)`` (round 12, VERDICT r11 item 5) turns the
    membership sketch into the exact tier's scale lever: the corpus
    fingerprints build an m-bit packed Bloom filter (ONE map-side
    bit_or aggregate to ≤ m/63 word rows — operators/bloom), the
    broadcast densified filter pre-classifies every new document in a
    narrow projection, and ONLY the Bloom-positive slice enters the
    exact-tier anti-join. Lossless by the filter's one-sided error
    (a Bloom miss PROVES the fingerprint is absent, so a pruned doc
    could never have matched — result equality with the unpruned form
    is pinned in tests/test_sketch_merge.py), and at 100 TB it is the
    difference between shuffling every increment fingerprint into the
    join and shuffling only the ~FP-rate sliver that might match.
    The output additionally carries ``bloom_pruned`` (this doc's
    exact join was skipped) for the audit column consumers surface.

    This is the continuous-ingestion form of the dedup ladder: a daily
    crawl increment must be checked against the full history WITHOUT
    re-clustering the corpus. Every join here is asymmetric
    (new × corpus) — the corpus never self-joins:

    - DISTINCT-TEXT COLLAPSE FIRST (round 12): both dup flags are
      properties of a document's TEXT, not its row — two new docs with
      identical bytes get identical verdicts — so every tier below
      runs at the distinct-fingerprint level and the per-doc answer is
      one hash-keyed flag join at the end. This is the exact-first
      rule a 100 TB pipeline lives by (never do pairwise work on rows
      an exact dedup would have collapsed), and it is what took x40
      from 529 s to seconds at sf10, where 500k docs carry only ~5k
      distinct texts and the shingle join was paying the ×10,000
      pair-space blowup of the replication (decomposition in
      docs/PERF.md round-12; the driver oracle KEEPS the per-row
      relational text, so every x40/x132 gate MATCH is a collapse-vs-
      per-row equivalence proof, and tests/test_incremental_dedup.py's
      handwritten fixtures pin the semantics Spark-side);
    - exact tier: left-semi join on md5(text) fingerprints — only
      16-byte hashes of the (collapsed) sides shuffle, and at steady
      state the corpus hash set is a standing bucketed table;
    - near tier: inverted-index join of the increment's shingles
      against the corpus's shingles keyed on the shingle — candidates
      scale with the DISTINCT texts' true cross-overlap, never
      |corpus|²; exact Jaccard verify on the candidate pairs, same
      rounding as :func:`ngram_jaccard_pairs` so thresholds are
      engine-portable. Hot-shingle capping applies unchanged if the
      corpus carries boilerplate (probed NOT to be the sf10 cost:
      hottest shingle touches 600 of 450k docs).
    """
    # Null-safe fingerprint (round 14, ADVICE r13): md5(NULL) is NULL,
    # so a NULL-text increment doc got __h=NULL and could never match in
    # the exact/near flag equi-joins (NULL≠NULL) — permanently reported
    # dup_exact=dup_near=false even against a NULL/''-text corpus,
    # inconsistent with the rest of the collapse family
    # (doc_components_by_text / neardup_pair_rollup, round 13).
    # Coalescing to '' matches word_shingles' ['']-shingle treatment of
    # NULL text. No-op on the catalog corpus (no NULL texts — so every
    # x40/x132/s29 gate hash is unchanged); pinned on a handwritten
    # NULL-text fixture in tests/test_incremental_dedup.py.
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    corpus_hashes = corpus_df.select(fp.alias("__h")).distinct()
    new_keyed = new_df.withColumn("__h", fp)
    new_fps = new_keyed.select("__h", text_col).dropDuplicates(["__h"])
    corp_fps = (
        corpus_df.select(fp.alias("__h"), text_col)
        .dropDuplicates(["__h"])
    )

    probe_fps = new_fps.select("__h")
    pruned_fps = None
    if bloom_prune is not None:
        from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.bloom import (
            bloom_word_table,
            with_bloom_hit,
        )

        bm, bk = bloom_prune
        words = bloom_word_table(corpus_hashes, "__h", bm, bk)
        classified = with_bloom_hit(probe_fps, "__h", words, bm, bk)
        probe_fps = classified.filter(F.col("bloom_hit") == 1).drop("bloom_hit")
        pruned_fps = (
            classified.filter(F.col("bloom_hit") == 0)
            .select("__h")
            .withColumn("__pruned", F.lit(True))
        )
    exact_fps = (
        probe_fps.join(corpus_hashes, "__h", "leftsemi")
        .withColumn("__exact", F.lit(True))
    )

    sh_new = fan_out(new_fps).select(
        F.col("__h").alias("__hn"),
        word_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    sh_corp = fan_out(corp_fps).select(
        F.col("__h").alias("__hc"),
        word_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    ex_new = sh_new.select("__hn", "n_sh", F.explode("sh").alias("s"))
    ex_corp = sh_corp.select(
        "__hc", F.col("n_sh").alias("n_sh_c"), F.explode("sh").alias("s")
    )
    pairs = (
        ex_new.join(ex_corp, "s")
        .groupBy("__hn", "__hc")
        .agg(
            F.count("*").alias("inter"),
            F.first("n_sh").alias("na"),
            F.first("n_sh_c").alias("nb"),
        )
    )
    jac = rhu(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6)
    near_fps = (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("__hn").alias("__h"))
        .distinct()
        .withColumn("__near", F.lit(True))
    )

    out = (
        new_keyed.join(exact_fps, "__h", "left")
        .join(near_fps, "__h", "left")
        .withColumn("dup_exact", F.coalesce(F.col("__exact"), F.lit(False)))
        .withColumn(
            "dup_near",
            F.coalesce(F.col("__near"), F.lit(False)) & ~F.col("dup_exact"),
        )
        .drop("__exact", "__near")
    )
    if pruned_fps is not None:
        out = (
            out.join(pruned_fps, "__h", "left")
            .withColumn(
                "bloom_pruned", F.coalesce(F.col("__pruned"), F.lit(False))
            )
            .drop("__pruned")
        )
    return out.drop("__h")


def word_ngrams_all(text: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (no distinct) — same shifted-slice
    zip_with construction and short/NULL-text edges as
    :func:`word_shingles`, for operators whose statistics weight
    repeated n-grams (frequency/rarity scoring), where dedup's
    set-semantics shingles would be wrong."""
    toks = F.coalesce(tokens(text), F.array(F.lit("")))
    m = F.greatest(F.size(toks) - n + 1, F.lit(1))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, m),
            lambda a, b: F.when(b.isNull(), a).otherwise(
                F.concat(a, F.lit(" "), b)
            ),
        )
    return grams


WINNOW_POS_LIMIT = 1 << 21  # max grams per document in the packed code


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03) — the rolling-hash fingerprint family the plain md5
    fingerprint (x07) can't provide: x07 changes completely on a 1-byte
    edit, while winnowing selects the minimum k-gram hash in every
    window of ``w`` consecutive grams, guaranteeing any shared
    substring of ≥ w+k-1 tokens contributes at least one COMMON
    fingerprint — local, position-aware overlap detection (plagiarism /
    boilerplate / quote tracing) with ~2/(w+1) of the grams kept.

    Engine-portable by construction: gram hashes are md5-derived ints
    (:func:`minhash_shingle_hash`), and (hash, position) are packed
    into ONE bigint — ``hash · 2²¹ + pos`` — so the per-window argmin
    with its deterministic tie-break (smaller hash, then earlier
    position) is a plain integer MIN any engine computes identically;
    positions must stay under 2²¹ grams/document (guard yourself for
    book-length inputs — chunk first, x28's op).

    Plan shape: posexplode of the gram array (with multiplicity —
    winnowing is positional, set-dedup would break window adjacency),
    one window shuffle keyed by document (frames are w rows), a
    distinct on (doc, packed) — fingerprint-sized, grams never shuffle
    twice. Documents shorter than w grams yield their single
    whole-document window (≥ 1 fingerprint per doc, empty text
    included — same [''] token edge as every shingle op here).

    Returns (id, fp_hash, fp_pos): the selected gram hash and the
    1-based gram position it was taken from.
    """
    grams = word_ngrams_all(F.col(text_col), k)
    ex = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(grams).alias("__p0", "__g"),
    ).select(
        id_col,
        (F.col("__p0") + 1).alias("__pos"),
        (
            minhash_shingle_hash(F.col("__g")) * F.lit(WINNOW_POS_LIMIT)
            + (F.col("__p0") + 1)
        ).alias("__pack"),
    )
    frame = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(0, w - 1)
    whole = Window.partitionBy(id_col)
    sel = (
        ex.withColumn("__sel", F.min("__pack").over(frame))
        .withColumn("__m", F.count("*").over(whole))
        .filter(F.col("__pos") <= F.greatest(F.col("__m") - w + 1, F.lit(1)))
        .select(id_col, "__sel")
        .distinct()
    )
    return sel.select(
        id_col,
        F.expr(f"__sel div {WINNOW_POS_LIMIT}").alias("fp_hash"),
        (F.col("__sel") % WINNOW_POS_LIMIT).alias("fp_pos"),
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col,
    max_dist: int = 3,
    hot_block_cap: int | None = None,
) -> DataFrame:
    """Entity-resolution candidate pairs by blocked edit distance:
    rows sharing a block key, with ``levenshtein(text_a, text_b) <=
    max_dist`` and ``id_a < id_b``.

    The classic record-linkage shape (dirty vendor/customer/product
    names): an UNBLOCKED edit-distance join is O(n²) string DP — dead
    at any scale — so candidates are generated only inside blocks
    (same first token, same soundex, same length band …: caller
    chooses via ``block_col``). Cost is Σ|block|², the standard ER
    economics; the join itself is an ordinary equi-shuffle on the
    block key; levenshtein runs codegen'd JVM-side.

    ``hot_block_cap`` is the Σ|block|² escape hatch — the mirror of
    ``ngram_jaccard_pairs``' ``hot_shingle_cap``: blocks whose row
    count exceeds the cap are dropped from candidate generation
    entirely (one tiny groupBy on the block key, then an equi-join
    filter). A too-common blocking value ("the", "inc", an empty
    first word over 1M records) otherwise contributes |block|² join
    rows — 10¹² candidates from one viral token. The recall trade is
    explicit: pairs whose ONLY shared block is hot are never proposed;
    everything else is verified with the identical metric, so
    surviving pairs carry the same ``edit_dist`` as the uncapped path.
    At a sane cap, a hot block is exactly the blocking key that had
    stopped discriminating — refine the key (first-two-words, token +
    length band) to recover those pairs rather than brute-forcing the
    square.
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        block_col.alias("__blk"),
    )
    if hot_block_cap is not None:
        cold = (
            keyed.groupBy("__blk")
            .agg(F.count("*").alias("__bn"))
            .filter(F.col("__bn") <= hot_block_cap)
            .select("__blk")
        )
        keyed = keyed.join(cold, "__blk")
    a = keyed.select(
        F.col("__id").alias("id_a"),
        F.col("__text").alias("text_a"),
        "__blk",
    )
    b = keyed.select(
        F.col("__id").alias("id_b"),
        F.col("__text").alias("text_b"),
        "__blk",
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("edit_dist") <= max_dist)
        .drop("__blk")
    )


def neardup_pair_rollup(
    docs: DataFrame,
    attr_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Count near-dup DOC pairs grouped by the (least, greatest) of a
    per-doc attribute — x62's source matrix / x63's split-leakage
    shape — WITHOUT materializing the doc-pair set (round 12).

    Jaccard is a text property, so the doc-pair count expands from
    text-level structure by pure multiplicity arithmetic:

    - cross-text pairs: for every text pair (t1, t2) with Jaccard ≥
      threshold, each (attr_a, attr_b) cell gains
      cnt(t1, a1) · cnt(t2, a2) pairs — computed by joining the
      text-pair frame to the per-(text, attr) count table twice;
    - within-text pairs (byte-identical docs, Jaccard 1): same-attr
      cells gain C(c, 2) per (text, attr); cross-attr cells gain
      c_a · c_b per attr pair within the text.

    Identical totals to joining the per-row pair set against the attr
    map (the x62/x63 oracles KEEP that per-row text — every gate MATCH
    proves the expansion; fixtures in tests/test_incremental_dedup.py
    pin it Spark-vs-Spark), at the distinct-text join cost instead of
    the replication-quadratic one — the same ×10,000 sf10 blowup
    class found on x40/x18 (docs/PERF.md round-12).
    """
    # Null-safe fingerprint: md5(NULL) is NULL and would vanish from the
    # __h equi-joins, dropping NULL-text docs from every pair count.
    # coalesce-to-'' mirrors the per-row ['']-shingle path (ADVICE r12).
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    cnt = (
        docs.select(fp.alias("__h"), F.col(attr_col))
        .groupBy("__h", attr_col)
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("__c"))
    )
    texts = docs.select(
        fp.alias("__h"),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
    ).dropDuplicates(["__h"])
    tp = ngram_jaccard_pairs(
        texts, id_col="__h", text_col=text_col, n=n, threshold=threshold
    ).select(F.col("doc_a").alias("__ha"), F.col("doc_b").alias("__hb"))
    a = cnt.select(
        F.col("__h").alias("__ha"),
        F.col(attr_col).alias("__attr_a"),
        F.col("__c").alias("__ca"),
    )
    b = cnt.select(
        F.col("__h").alias("__hb"),
        F.col(attr_col).alias("__attr_b"),
        F.col("__c").alias("__cb"),
    )
    cross = (
        tp.join(a, "__ha")
        .join(b, "__hb")
        .select(
            F.least("__attr_a", "__attr_b").alias("__lo"),
            F.greatest("__attr_a", "__attr_b").alias("__hi"),
            (F.col("__ca") * F.col("__cb")).alias("__m"),
        )
    )
    within_same = cnt.select(
        F.col(attr_col).alias("__lo"),
        F.col(attr_col).alias("__hi"),
        F.expr("__c * (__c - 1) div 2").alias("__m"),
    )
    x, y = cnt.alias("x"), cnt.alias("y")
    within_cross = (
        x.join(
            y,
            (F.col("x.__h") == F.col("y.__h"))
            & (F.col(f"x.{attr_col}") < F.col(f"y.{attr_col}")),
        )
        .select(
            F.col(f"x.{attr_col}").alias("__lo"),
            F.col(f"y.{attr_col}").alias("__hi"),
            (F.col("x.__c") * F.col("y.__c")).alias("__m"),
        )
    )
    return (
        cross.unionByName(within_same)
        .unionByName(within_cross)
        .groupBy(F.col("__lo"), F.col("__hi"))
        .agg(F.expr("CAST(SUM(__m) AS BIGINT)").alias("n_dup_pairs"))
        .filter(F.col("n_dup_pairs") > 0)
    )
