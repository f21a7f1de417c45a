"""Round-7 operator tests.

test_bpe_vocab_encode_roundtrip closes the tokenizer loop LITERALLY
(VERDICT r6 item 3): train merges with x80's ``bpe_merge_rounds``,
build the merged-symbol vocabulary, encode the corpus through the x64
path (broadcast vocab join + per-doc position-sorted reassembly), then
decode and pin ``decode(encode(doc)) == doc``'s ORIGINAL base-symbol
stream — losslessness through the whole train→encode→decode loop, not
just per-stage parity.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import (
    bpe_merge_rounds,
)

_CORPUS = {
    "d1": "l o w l o w e r l o w e s t",
    "d2": "n e w n e w e r n e w e s t",
    "d3": "w i d e r w i d e s t l o w",
}


def test_bpe_vocab_encode_roundtrip(spark):
    rows = [
        (doc, i, t)
        for doc, text in _CORPUS.items()
        for i, t in enumerate(text.split())
    ]
    seq = spark.createDataFrame(rows, ["doc_id", "pos", "tok"])

    # 1. TRAIN — x80's distributed greedy merges
    final_seq, winners = bpe_merge_rounds(seq, 3)
    assert all(w.count() == 1 for w in winners), "corpus supports 3 merges"

    # 2. VOCAB — merged-symbol vocabulary from the trained corpus, ids
    # deterministic by (count DESC, symbol ASC) exactly like x64's
    vocab = (
        final_seq.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(1000)
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("tok")))
            .alias("tid"),
        )
        .localCheckpoint(eager=True)  # one vocab, two consumers below
    )
    # the final round's winner is a live merged symbol -> must be in
    # the vocab (earlier winners may have been merged away)
    last = winners[-1].collect()[0]
    merged_sym = f"{last['a']} {last['b']}"
    assert vocab.filter(F.col("tok") == merged_sym).count() == 1

    # 3. ENCODE — the x64 path: broadcast vocab join, OOV->0, per-doc
    # position-sorted comma-joined id string
    enc = (
        final_seq.join(F.broadcast(vocab), "tok", "left")
        .select("doc_id", "pos", F.coalesce("tid", F.lit(0)).alias("tid"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                    lambda s: s["tid"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
            F.expr("SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END)").alias("n_oov"),
        )
    )
    enc_rows = {r["doc_id"]: r for r in enc.collect()}
    assert set(enc_rows) == set(_CORPUS)
    # the vocab was built FROM the trained corpus: encoding it back is
    # OOV-free by construction — a nonzero count means the id join and
    # the trainer disagree about the symbol inventory
    assert all(r["n_oov"] == 0 for r in enc_rows.values())

    # 4. DECODE — id string -> symbols -> split merged symbols back to
    # base tokens, order preserved by (encoded position, sub-position)
    dec = (
        enc.select(
            "doc_id", F.posexplode(F.split("token_ids", ",")).alias("p", "tid_s")
        )
        .select("doc_id", "p", F.col("tid_s").cast("int").alias("tid"))
        .join(F.broadcast(vocab), "tid")
        .select("doc_id", "p", F.posexplode(F.split("tok", " ")).alias("sp", "base"))
    )
    decoded = {
        r["doc_id"]: [b for _, _, b in sorted(map(tuple, r["toks"]))]
        for r in dec.groupBy("doc_id")
        .agg(F.collect_list(F.struct("p", "sp", "base")).alias("toks"))
        .collect()
    }
    for doc, text in _CORPUS.items():
        assert decoded[doc] == text.split(), doc


# ---------------------------------------------------------------------------
# x94 semantic dedup — removes a near-dup the lexical tiers all miss
# ---------------------------------------------------------------------------


def test_semdedup_catches_paraphrase_lexical_tiers_miss(spark):
    """The reason x94 exists: two PARAPHRASES share no shingles (so x01
    exact hash, x03 SimHash, and x04 MinHash-LSH all keep both) but
    their embeddings are nearly parallel (so semdedup drops the
    higher-id one)."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.clustering import (
        semdedup,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_dedup,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog in the yard",
        2: "a speedy auburn vulpine leaps above an idle canine outside",
        3: "financial statements for the quarter show rising net income",
        4: "weather today is cold with heavy snowfall across the region",
        5: "the recipe calls for two cups of flour and one egg",
        6: "astronomers observed a distant galaxy through the telescope",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )

    # lexical tier 1 — exact hash: all six docs survive
    assert exact_dedup(docs, ["text"], "doc_id").count() == 6
    # lexical tier 2 — SimHash 0-distance collapse: all six survive
    assert simhash_dedup(docs).count() == 6
    # lexical tier 3 — MinHash-LSH candidate pairs: docs 1 and 2 are
    # never even a candidate pair (zero shared shingles)
    pairs = minhash_lsh_pairs(docs, threshold=0.2).collect()
    assert not any({r[0], r[1]} == {1, 2} for r in pairs)

    # the semantic tier: doc 2's embedding is a tiny perturbation of
    # doc 1's; the rest point in (nearly) orthogonal directions
    dim = 8

    def unit(axis, eps=0.0):
        v = [0.0] * dim
        v[axis] = 1.0
        if eps:
            v[(axis + 1) % dim] = eps
        return v

    emb = spark.createDataFrame(
        [
            (1, unit(0)),
            (2, unit(0, eps=0.05)),  # cosine vs doc 1 ≈ 0.9988
            (3, unit(2)),
            (4, unit(3)),
            (5, unit(4)),
            (6, unit(5)),
        ],
        ["vec_id", "embedding"],
    )
    out = {
        r["vec_id"]: r
        for r in semdedup(emb, threshold=0.9, k=2, dim=dim).collect()
    }
    assert len(out) == 6
    assert not out[2]["keep"], "paraphrase must be dropped"
    assert out[2]["max_lower_sim"] >= 0.99
    assert all(out[i]["keep"] for i in (1, 3, 4, 5, 6))


def test_quality_classifier_gate_nonvacuous(spark, sf_dir):
    """x95's keep gate must actually split the corpus — an
    all-keep/all-drop threshold would be the q81 vacuous-green trap."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )

    rows = QUERIES["x95_quality_classifier"].spark(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_keep"] for r in rows)
    assert 0 < kept < total
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert r["keep_rate_ppm"] == (1_000_000 * r["n_keep"]) // r["n_docs"]


def test_semantic_decontamination_nonvacuous(spark, sf_dir):
    """x96 must flag SOME but not ALL training vectors at sf0.001/0.01
    — an empty or total flag set would be the vacuous-green trap."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )

    rows = QUERIES["x96_semantic_decontamination"].spark(spark, sf_dir).collect()
    assert rows
    flagged = [r for r in rows if r["contaminated"]]
    assert 0 < len(flagged) < len(rows)
    for r in rows:
        assert (r["max_eval_sim"] >= 0.35) == r["contaminated"]


def test_semdedup_invariants(spark):
    """Structural invariants of the SemDeDup operator on a random-ish
    deterministic corpus: (1) every input id appears exactly once;
    (2) each cluster's min id is always kept (it has no lower-id
    cluster-mate); (3) the keep set is MONOTONE in the threshold —
    raising it can only keep more."""
    import math

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.clustering import (
        semdedup,
    )

    dim = 8
    rows = [
        (
            i,
            [math.sin(0.7 * i + 1.3 * j) for j in range(dim)],
        )
        for i in range(1, 41)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    lo = semdedup(emb, threshold=0.30, k=3, dim=dim).collect()
    hi = semdedup(emb, threshold=0.60, k=3, dim=dim).collect()

    assert sorted(r["vec_id"] for r in lo) == list(range(1, 41))
    for res in (lo, hi):
        by_cell: dict[int, list] = {}
        for r in res:
            by_cell.setdefault(r["cell"], []).append(r)
        for cell_rows in by_cell.values():
            m = min(r["vec_id"] for r in cell_rows)
            (mr,) = [r for r in cell_rows if r["vec_id"] == m]
            assert mr["keep"] and mr["max_lower_sim"] is None
    kept_lo = {r["vec_id"] for r in lo if r["keep"]}
    kept_hi = {r["vec_id"] for r in hi if r["keep"]}
    assert kept_lo <= kept_hi
    # cells must agree between the two runs (threshold only affects keep)
    assert {(r["vec_id"], r["cell"]) for r in lo} == {
        (r["vec_id"], r["cell"]) for r in hi
    }


def test_semdedup_non_numeric_ids_fail_loudly_not_all_keep(spark):
    """ADVICE r14 flagged the 2-D blocked pair join's raw-id pmod block
    tags: NULL for a string id_col → every pair silently fails the
    equi-join → ALL vectors come back keep=true. Two-part resolution:
    the tags now hash the id (works for any type, and the output is
    invariant to the block assignment), and the documented contract is
    that semdedup requires NUMERIC ids anyway — the deterministic
    seed rule (pmod(id, seed_mod)) raises an ANSI cast error on any
    non-numeric id BEFORE the pair join can mis-handle it. Pin the
    loud failure: the silent all-keep outcome must be impossible."""
    import pytest

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.clustering import (
        semdedup,
    )

    rows = [(f"doc_{i:02d}", [1.0, 0.0, 0.0, 0.5]) for i in range(1, 7)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
        semdedup(emb, threshold=0.9, k=1, n_iters=1, dim=4).collect()


def test_quality_classifier_score_matches_pure_python(spark):
    """Pin x95's scoring SEMANTICS against a third, pure-Python
    implementation (the Spark/DuckDB oracle pair share SQL idioms; this
    pins what the idiom is supposed to compute: md5-bucket feature
    hashing into the fixed weight ramp, summed per token)."""
    import hashlib

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_llm import (
        _X95_D,
        _X95_SCORE_SPARK,
        _X95_W,
    )

    def py_score(text: str) -> int:
        total = 0
        for t in text.strip().split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % _X95_D
            total += _X95_W[b]
        return total

    texts = [
        "the quick brown fox",
        "net income rose sharply last quarter",
        "a",
        "repeated repeated repeated tokens tokens",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"]).select(
        "text", F.expr(_X95_SCORE_SPARK).alias("score")
    )
    got = {r["text"]: r["score"] for r in df.collect()}
    for t in texts:
        assert got[t] == py_score(t), t


def test_tpch_shape_batch_nonvacuous(spark, sf_dir):
    """Standing non-emptiness guards for the round-7 TPC-H-shape batch
    (the q81 lesson: a 0-vs-0 oracle match is a vacuous green — q93's
    first draft matched on an empty set because its region literal
    didn't exist in the data; caught by review, pinned here)."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )

    expectations = {
        "q82_late_orders_by_priority": lambda rows: len(rows) >= 3
        and all(r["n_late_orders"] > 0 for r in rows),
        "q83_priority_split_by_flag": lambda rows: len(rows) == 3
        and all(r["high_line_count"] > 0 and r["low_line_count"] > 0 for r in rows),
        "q84_disjunctive_promo_revenue": lambda rows: rows[0]["n_matches"] > 0,
        "q85_top_revenue_supplier": lambda rows: len(rows) >= 1
        and all(r["total_revenue_mic"] > 0 for r in rows),
        "q86_sole_late_supplier": lambda rows: len(rows) >= 1
        and all(r["numwait"] > 0 for r in rows),
        "q87_large_volume_orders": lambda rows: len(rows) >= 1
        and all(r["qty_deci"] > 2500 for r in rows),
        "q88_small_lot_revenue": lambda rows: rows[0]["n_small_lots"] > 0,
        "q89_shipping_priority": lambda rows: len(rows) >= 1
        and all(r["revenue_mic"] > 0 for r in rows),
        "q90_returned_item_report": lambda rows: len(rows) >= 1
        and all(r["lost_revenue_mic"] > 0 for r in rows),
        "q91_forecast_revenue_change": lambda rows: rows[0]["n_lines"] > 0,
        "q92_two_nation_volume": lambda rows: len(rows) >= 2
        and {r["supp_nation"] for r in rows} == {"NATION_3", "NATION_8"},
        "q93_market_share": lambda rows: len(rows) >= 1
        and any(0 < r["market_share_ppm"] < 1_000_000 for r in rows),
        "q94_promo_revenue_share": lambda rows: 0
        < rows[0]["promo_share_ppm"]
        < 1_000_000,
    }
    failures = []
    for name, check in expectations.items():
        rows = QUERIES[name].spark(spark, sf_dir).collect()
        if not rows or not check(rows):
            failures.append(name)
    assert not failures, failures


def test_audio_audit_nonvacuous_and_bounded(spark, sf_dir):
    """x100: clipping and silence gates must actually fire somewhere
    (non-vacuous) and every metric must respect its bounds."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )

    rows = QUERIES["x100_audio_quality_audit"].spark(spark, sf_dir).collect()
    assert rows
    assert any(r["clip_count"] > 0 for r in rows)
    assert any(r["silence_ppm"] > 0 for r in rows)
    for r in rows:
        assert 0 < r["n_samples"]
        assert 0 <= r["peak_amp"] <= 128
        assert 0 <= r["clip_count"] <= r["n_samples"]
        assert 0 <= r["silence_ppm"] <= 1_000_000
        assert 0 <= r["mean_energy"] <= 128 * 128


def test_poisson_bootstrap_statistics(spark, sf_dir):
    """x102: each replicate's resample size must be ≈ |corpus| (mean
    multiplicity 1) and its drop share ≈ e⁻¹ — the two properties that
    make per-row Poisson(1) a valid bootstrap stand-in."""
    import math

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )

    rows = QUERIES["x102_poisson_bootstrap"].spark(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        n = r["n_docs"]
        assert n > 0
        assert 0.80 * n <= r["resample_size"] <= 1.20 * n
        drop = r["n_dropped"] / n
        assert abs(drop - math.exp(-1)) < 0.12
        assert 1 <= r["max_copies"] <= 4


def test_length_bucketed_batching_reduces_padding(spark, sf_dir):
    """x103's reason to exist, asserted: total padding waste under
    length-bucketed sorted batching must be LOWER than batching the
    same corpus in plain doc_id order with the same slot size (and
    every batch must respect the slot bound)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
        read_table,
    )

    rows = QUERIES["x103_length_bucketed_batching"].spark(spark, sf_dir).collect()
    assert rows
    assert all(1 <= r["n_docs"] <= 16 for r in rows)
    assert all(
        r["padding_waste"] == r["n_docs"] * r["max_len"] - r["total_tokens"]
        for r in rows
    )
    bucketed_waste = sum(r["padding_waste"] for r in rows)

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT) ELSE "
            "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) END"
        ).alias("n_tok"),
    )
    naive = (
        docs.withColumn(
            "rn", F.row_number().over(Window.orderBy("doc_id"))
        )
        .groupBy(F.expr("CAST((rn - 1) div 16 AS BIGINT)").alias("b"))
        .agg(
            F.expr(
                "CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)"
            ).alias("waste")
        )
    )
    naive_waste = sum(r["waste"] for r in naive.collect())
    assert bucketed_waste < naive_waste
