"""Deterministic Bloom filter — the MEMBERSHIP sketch (round 12).

Completes the catalog's mergeable-sketch quartet: x113 estimates
CARDINALITY (HyperLogLog), x114 QUANTILES (mergeable histogram), x130
FREQUENCIES (count-min); the Bloom filter (Bloom, CACM 1970) answers
"have I seen this key?" with no false NEGATIVES and a tunable false-
POSITIVE rate — the 100 TB join-prune primitive: broadcast a few KB of
corpus-fingerprint bits to the ingest side and the exact-dup anti-join
only runs for the (tiny) Bloom-positive slice, losslessly, because a
Bloom miss PROVES the key is new (see plans/catalog_sketch x131/x132).

Representation is the real thing, not a row-set stand-in: m bits
packed into ``ceil(m / 63)`` BIGINT words — 63 bits per word so every
value stays non-negative and ``>>`` parity between Spark and DuckDB
never touches a sign bit (probed: bit_or/shiftleft/shiftright/& are
bit-identical across both engines on these values). The k bit
positions per key use the repo's portable hash convention — first 8
hex of md5, salted per hash index: ``md5(key || '#' || r) % m`` — so
every word, every membership verdict, and every false positive is
bit-identical across engines and the sketch value-hashes end to end.

Scale shape: building the filter is ONE map-side-combining aggregate
(``bit_or`` per word — ≤ m/63 rows of state, merging associatively
across partitions/executors/days, the same algebra
tests/test_sketch_merge.py pins for the other three sketches);
membership testing broadcasts the DENSIFIED single-row word array and
evaluates k shifts per probe row in a narrow projection — no explode,
no per-probe exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63  # 63, not 64: keeps every word non-negative (sign-safe >>)


def _pos_sql(key: str, r: int, m: int) -> str:
    """Portable bit position of hash index ``r`` for SQL column text
    ``key`` — Spark dialect of the shared md5 convention (the DuckDB
    twin lives in the oracle CTEs: ('0x' || substr(md5(...),1,8))
    ::UBIGINT % m)."""
    return (
        f"CAST(conv(substring(md5(concat({key}, '#', '{r}')), 1, 8),"
        f" 16, 10) AS BIGINT) % {m}"
    )


def n_words(m: int) -> int:
    return (m + WORD_BITS - 1) // WORD_BITS


def bloom_word_table(keys: DataFrame, key_col: str, m: int, k: int) -> DataFrame:
    """Build the packed Bloom filter over ``keys[key_col]`` as a
    (w, bits) word table — at most ``n_words(m)`` rows regardless of
    input size. ONE aggregate with map-side partial ``bit_or``; this
    exact groupBy is also what the streaming twin (s28) runs as its
    complete-mode state."""
    pos = keys.select(
        F.explode(
            F.array(*[F.expr(_pos_sql(key_col, r, m)) for r in range(k)])
        ).alias("pos")
    )
    return pos.groupBy(F.expr(f"pos div {WORD_BITS}").alias("w")).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT),"
            f" CAST(pos % {WORD_BITS} AS INT)))"
        ).alias("bits")
    )


def bloom_dense(words: DataFrame, m: int) -> DataFrame:
    """Densify the (w, bits) word table into ONE row holding the whole
    filter as ``__bloom: array<bigint>`` (absent words = 0) — the
    broadcast payload for membership testing. n_words(m) longs, a few
    KB at any practical m."""
    nw = n_words(m)
    return (
        words.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "bits"))
            ).alias("__mp")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {nw - 1}),"
                f" i -> coalesce(__mp[CAST(i AS BIGINT)], 0L))"
            ).alias("__bloom")
        )
    )


def bloom_hit_col(key: str, m: int, k: int, bloom_col: str = "__bloom") -> Column:
    """Membership verdict (1/0 BIGINT) of SQL column text ``key``
    against the densified filter column: all k bits set. A narrow
    per-row expression — k md5s, k element_at+shift checks, no
    explode, no exchange. A 0 is a PROOF of absence (never-false-
    negative: every bit the key's insertion would have set is checked
    here with the same hashes)."""
    positions = ", ".join(_pos_sql(key, r, m) for r in range(k))
    return F.expr(
        f"CAST(forall(transform(array({positions}),"
        f" p -> (shiftright(element_at({bloom_col},"
        f" CAST(p div {WORD_BITS} AS INT) + 1),"
        f" CAST(p % {WORD_BITS} AS INT)) & 1) = 1),"
        f" x -> x) AS BIGINT)"
    )


def with_bloom_hit(
    probe: DataFrame,
    key_col: str,
    words: DataFrame,
    m: int,
    k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Attach the membership verdict to every probe row: crossJoin the
    broadcast single-row dense filter (bounded by construction —
    n_words(m) longs), evaluate the k-bit check in a projection, drop
    the filter column."""
    dense = bloom_dense(words, m)
    return (
        probe.crossJoin(F.broadcast(dense))
        .withColumn(out_col, bloom_hit_col(key_col, m, k))
        .drop("__bloom")
    )


def bloom_merge(words_a: DataFrame, words_b: DataFrame) -> DataFrame:
    """Merge two packed filters (built with the SAME m and k): union
    the word tables and bit_or per word — the associative shard-
    combine property (filter(A ∪ B) ≡ merge(filter(A), filter(B)),
    pinned in tests/test_sketch_merge.py)."""
    return (
        words_a.unionByName(words_b)
        .groupBy("w")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
