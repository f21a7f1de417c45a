"""Deterministic k-means — iterative vector clustering with exact
cross-engine parity.

The IVF coarse quantizer (similarity.ivf_assign_centroids) already
runs Lloyd iterations, but its float centroid means are summation-
order-dependent, so it can only ever be rows-only checked. This module
is the clustering twin of graphrank.pagerank_int: do ALL the
arithmetic in integer micro-units —

- every coordinate is quantized once: ``x_mic = FLOOR(x·1e6 + 0.5)``
  (the repo-wide HALF_UP formula, identical in DuckDB);
- assignment distance is the INTEGER ``Σ (x_mic − c_mic)²`` — exact,
  order-independent, argmin tie-broken by cell id;
- centroid update is ``SUM(x_mic) DIV count`` per dimension — integer
  division, order-independent;

so a FIXED number of iterations yields bit-identical assignments on
any engine and any partitioning, and the whole clustering — seeds,
every intermediate centroid, every final assignment — is value-hash
oracle-checkable (x51), not "approximately similar".

Overflow bounds: |x| < ~4000 keeps x_mic < 2³², diff² < 2⁶⁴/dim for
dim ≤ 256 — embedding coordinates live in [−1, 1], five orders of
magnitude of headroom. Quantization moves each coordinate ≤ 5e-7 —
far below any embedding's noise floor; for a SIGNAL (which cluster)
the determinism is worth infinitely more than the seventh decimal.

Scale shape per iteration: one broadcast of k centroid rows, one
narrow argmin projection over n·k generated integer terms (whole-stage
codegen — no interpreted HOF fold), one (cell, dim)-keyed aggregate of
n·dim exploded micros with map-side partial sums. No driver actions
besides the per-round localCheckpoint of the k-row centroid frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _quantize_sql(vec_col: str, dim: int) -> str:
    """SQL text building the bigint-micros array from a float vector —
    one parsed expression (single py4j round trip), codegen'd."""
    elems = ", ".join(
        f"CAST(FLOOR(CAST(get({vec_col}, {i}) AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)"
        for i in range(dim)
    )
    return f"array({elems})"


def _int_dist2_sql(a: str, b: str, dim: int) -> str:
    """Integer squared L2 distance between two bigint-micros arrays,
    dim-unrolled (codegen; summation order irrelevant — exact)."""
    terms = " + ".join(
        f"(get({a}, {i}) - get({b}, {i})) * (get({a}, {i}) - get({b}, {i}))"
        for i in range(dim)
    )
    return f"({terms})"


def kmeans_deterministic(
    embeddings: DataFrame,
    k: int = 4,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 9973,
) -> DataFrame:
    """Fixed-iteration integer-micro k-means. Returns one row per input
    vector: (id, cell, d2_mic) — the assigned cluster (1..k) after
    ``n_iters`` Lloyd rounds and the integer squared distance (micro²)
    to its final centroid.

    Seeding is RNG-free and layout-independent: the ``k`` vectors with
    the smallest ``(id mod seed_mod, id)`` are the initial centroids,
    numbered 1..k in id order (the IVF seeding rule, reproducible in
    one SQL ORDER BY ... LIMIT in any engine).
    """
    assigned, _ = _kmeans_core(
        embeddings, k, n_iters, dim, id_col, vec_col, seed_mod
    )
    return assigned.select(F.col("pid").alias(id_col), "cell", "d2")


def _kmeans_core(
    embeddings: DataFrame,
    k: int,
    n_iters: int,
    dim: int,
    id_col: str,
    vec_col: str,
    seed_mod: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared Lloyd loop: returns (assignments(pid, cell, d2, xm),
    centroids(cell, cm)) where the centroids are the ones the FINAL
    assignment used — what an IVF probe must rank against."""
    pts = embeddings.select(
        F.col(id_col).alias("pid"),
        F.expr(_quantize_sql(vec_col, dim)).alias("xm"),
    )
    cents = (
        embeddings.orderBy(F.pmod(F.col(id_col), F.lit(seed_mod)), F.col(id_col))
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.col(id_col))).alias("cell"),
            F.expr(_quantize_sql(vec_col, dim)).alias("cm"),
        )
        .localCheckpoint(eager=True)
    )

    d2 = F.expr(_int_dist2_sql("xm", "cm", dim))

    def assign(c: DataFrame) -> DataFrame:
        return (
            pts.crossJoin(F.broadcast(c))
            .select("pid", "xm", "cell", d2.alias("d2"))
            .groupBy("pid")
            .agg(
                F.min_by("cell", F.struct("d2", "cell")).alias("cell"),
                F.min(F.struct("d2", "cell")).getField("d2").alias("d2"),
                F.first("xm").alias("xm"),
            )
        )

    assigned = assign(cents)
    for _ in range(n_iters - 1):
        cents = (
            assigned.select("cell", F.posexplode("xm").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.expr("SUM(x) div COUNT(*)").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("cm"))
            .localCheckpoint(eager=True)
        )
        assigned = assign(cents)
    return assigned, cents


def _kmeans_core_fused_subspaces(
    embeddings: DataFrame,
    k: int,
    n_iters: int,
    subdim: int,
    n_sub: int,
    id_col: str,
    vec_col: str,
    seed_mod: int,
) -> tuple[DataFrame, DataFrame]:
    """All ``n_sub`` product-quantization subspace trainings as ONE
    subspace-keyed Lloyd DAG (VERDICT r11 item 1) — the Spark twin of
    what :func:`_kmeans_cte_parts`'s shared-WITH-prefix already does
    on the oracle side.

    Returns (assignments(sub, pid, cell), centroids(sub, cell, cm))
    with ``sub`` in 0..n_sub−1, BIT-IDENTICAL per subspace to running
    :func:`_kmeans_core` on each 16-dim slice separately: the seed set
    is the same ``(id mod seed_mod, id)`` order/limit on the FULL
    table (slicing commutes with row selection), every distance/mean
    is exact integer micro arithmetic (grouping by (pid, sub) instead
    of pid within 4 separate jobs cannot change an exact result), and
    the per-subspace cell numbering is untouched.

    Why fuse: the sequential form pays 4 × (scan + seed-sort +
    per-iteration assign exchange + eager centroid localCheckpoint) —
    at sf10 that is 8 eager driver jobs and 4 identical plan chains
    scheduled back to back, and the barriers (checkpoints) serialize
    them. The fused DAG scans once, quantizes the 64-dim vector once
    and slices micros (cheaper than 4 float re-quantizations), runs
    ONE broadcast-assign per iteration over the (pid, sub) union —
    centroid state is k·n_sub rows, still broadcast-trivial — and
    checkpoints once per round instead of once per round per subspace.
    """
    full_dim = subdim * n_sub
    slices = F.array(
        *[F.slice("__xm64", 1 + m * subdim, subdim) for m in range(n_sub)]
    )
    pts = (
        embeddings.select(
            F.col(id_col).alias("pid"),
            F.expr(_quantize_sql(vec_col, full_dim)).alias("__xm64"),
        )
        .select("pid", F.posexplode(slices).alias("sub", "xm"))
    )
    cents = (
        embeddings.orderBy(
            F.pmod(F.col(id_col), F.lit(seed_mod)), F.col(id_col)
        )
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.col(id_col))).alias("cell"),
            F.expr(_quantize_sql(vec_col, full_dim)).alias("__xm64"),
        )
        .select("cell", F.posexplode(slices).alias("sub", "cm"))
        .localCheckpoint(eager=True)
    )

    d2 = F.expr(_int_dist2_sql("xm", "cm", subdim))

    def assign(c: DataFrame) -> DataFrame:
        return (
            pts.join(F.broadcast(c), "sub")
            .select("sub", "pid", "xm", "cell", d2.alias("d2"))
            .groupBy("sub", "pid")
            .agg(
                F.min_by("cell", F.struct("d2", "cell")).alias("cell"),
                F.first("xm").alias("xm"),
            )
        )

    assigned = assign(cents)
    for _ in range(n_iters - 1):
        cents = (
            assigned.select("sub", "cell", F.posexplode("xm").alias("pos", "x"))
            .groupBy("sub", "cell", "pos")
            .agg(F.expr("SUM(x) div COUNT(*)").alias("m"))
            .groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "sub", "cell", F.transform("pm", lambda s: s["m"]).alias("cm")
            )
            .localCheckpoint(eager=True)
        )
        assigned = assign(cents)
    return assigned.select("sub", "pid", "cell"), cents


def ivf_deterministic_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 9973,
) -> DataFrame:
    """IVF approximate top-k with EXACT cross-engine parity — the
    oracle-checkable twin of similarity.ivf_topk (whose float k-means
    means are summation-order-dependent and so rows-only forever).

    Coarse quantizer: the integer-micro k-means above (bit-identical
    cells on any engine). Probe: the ``n_probe`` cells whose FINAL
    centroids are integer-L2 nearest to the query's quantized vector
    (ties → smaller cell id). Re-rank: exact cosine over the probed
    cells' members with the repo's pinned kernel (rounded before
    ranking, id tie-break). Every stage is deterministic, so the
    entire ANN result — not just its size — hash-checks against the
    unrolled SQL oracle (clustering.ivf_oracle_sql).

    Scale shape: clustering amortizes across queries (build once);
    per query: one k-row broadcast ranking (no shuffle), a semi-join
    on cell pruning the corpus to ~n_probe/n_cells, and x09's
    TakeOrderedAndProject re-rank over the survivors.
    """
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity import (
        cosine_pre,
        rhu,
        with_l2_norm,
    )

    assigned, cents = _kmeans_core(
        embeddings, n_cells, n_iters, dim, id_col, vec_col, seed_mod
    )
    qx = embeddings.filter(F.col(id_col) == query_id).select(
        F.expr(_quantize_sql(vec_col, dim)).alias("qxm")
    )
    probe = (
        cents.crossJoin(F.broadcast(qx))
        .select("cell", F.expr(_int_dist2_sql("qxm", "cm", dim)).alias("qd2"))
        .withColumn(
            "__rn",
            F.row_number().over(Window.orderBy(F.col("qd2"), F.col("cell"))),
        )
        .filter(F.col("__rn") <= n_probe)
        .select("cell")
    )
    cand_ids = (
        assigned.join(F.broadcast(probe), "cell", "leftsemi")
        .filter(F.col("pid") != query_id)
        .select("pid")
    )
    corpus = with_l2_norm(
        embeddings.join(
            cand_ids, embeddings[id_col] == cand_ids.pid, "leftsemi"
        ),
        vec_col,
        dim,
    )
    query = with_l2_norm(
        embeddings.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("__qvec")
        ),
        "__qvec",
        dim,
        "__qnrm",
    )
    sim = rhu(cosine_pre(vec_col, "__qvec", "__nrm", "__qnrm", dim), 6)
    return (
        corpus.crossJoin(F.broadcast(query))
        .select(F.col(id_col).alias("neighbor_id"), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
        .limit(k)
    )


def kmeans_oracle_sql(
    table: str = "embeddings",
    k: int = 4,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 9973,
) -> str:
    """DuckDB twin: the same quantization, seeding, integer distances,
    and DIV centroid updates, with the fixed iteration count unrolled
    as chained CTEs (the pagerank_oracle_sql pattern). Integer sums
    are order-free, so DuckDB may use list comprehensions where Spark
    unrolls — identical values either way."""
    parts, a_last, _ = _kmeans_cte_parts(
        table, k, n_iters, dim, id_col, vec_col, seed_mod
    )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\n"
        f"SELECT pid AS {id_col}, cell, CAST(d2 AS BIGINT) AS d2"
        f" FROM {a_last}"
    )


def _kmeans_cte_parts(
    table: str,
    k: int,
    n_iters: int,
    dim: int,
    id_col: str,
    vec_col: str,
    seed_mod: int,
    prefix: str = "",
) -> tuple[list[str], str, str]:
    """CTE chain for the unrolled Lloyd rounds; returns (parts,
    last-assignment CTE name, last-used-centroid CTE name).
    ``prefix`` namespaces every CTE so multiple chains (x108's four PQ
    subspaces) can share one WITH block; callers after the first strip
    the leading ``WITH `` from parts[0]."""
    q = (
        f"[CAST(FLOOR(CAST({vec_col}[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"
        f" FOR i IN range(1, {dim} + 1)]"
    )
    d2 = (
        f"list_sum([(p.xm[i] - c.cm[i]) * (p.xm[i] - c.cm[i])"
        f" FOR i IN range(1, len(p.xm) + 1)])"
    )
    z = prefix
    parts = [
        f"WITH {z}pts AS (SELECT {id_col} AS pid, {q} AS xm FROM {table}),",
        f"{z}c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) AS cell, {q} AS cm",
        f"       FROM (SELECT * FROM {table}",
        f"             ORDER BY {id_col} % {seed_mod}, {id_col} LIMIT {k})),",
    ]
    for it in range(n_iters):
        parts.append(
            f"{z}d{it} AS (SELECT p.pid, p.xm, c.cell, {d2} AS d2"
            f" FROM {z}pts p CROSS JOIN {z}c{it} c),"
        )
        parts.append(
            f"{z}a{it} AS (SELECT pid, xm, cell, d2 FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, cell)"
            f" AS rn FROM {z}d{it}) WHERE rn = 1),"
        )
        if it < n_iters - 1:
            parts.append(
                f"{z}s{it} AS (SELECT cell, t.range AS i,"
                f" SUM(xm[CAST(t.range AS INT)]) AS s, COUNT(*) AS c"
                f" FROM {z}a{it}, range(1, {dim} + 1) t GROUP BY 1, 2),"
            )
            parts.append(
                f"{z}c{it + 1} AS (SELECT cell,"
                f" list(s // c ORDER BY i) AS cm FROM {z}s{it} GROUP BY cell),"
            )
    return parts, f"{z}a{n_iters - 1}", f"{z}c{n_iters - 1}"


def ivf_oracle_sql(
    table: str = "embeddings",
    query_id: int = 1,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 9973,
) -> str:
    """DuckDB twin of :func:`ivf_deterministic_topk`: the unrolled
    k-means CTEs, the query's integer-L2 cell ranking, the probed-cell
    candidate set, and x09's exact-cosine re-rank text."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity import (
        duckdb_cosine_sql,
    )

    parts, a_last, c_last = _kmeans_cte_parts(
        table, n_cells, n_iters, dim, id_col, vec_col, seed_mod
    )
    qd2 = (
        "list_sum([(q.qxm[i] - c.cm[i]) * (q.qxm[i] - c.cm[i])"
        " FOR i IN range(1, len(q.qxm) + 1)])"
    )
    cos = duckdb_cosine_sql(f"e.{vec_col}", "q.qv")
    parts.append(f"qx AS (SELECT xm AS qxm FROM pts WHERE pid = {query_id}),")
    parts.append(
        f"qc AS (SELECT cell FROM ("
        f"SELECT c.cell, ROW_NUMBER() OVER (ORDER BY {qd2}, c.cell) AS rn"
        f" FROM {c_last} c CROSS JOIN qx q) WHERE rn <= {n_probe}),"
    )
    parts.append(
        f"cand AS (SELECT pid FROM {a_last}"
        f" WHERE cell IN (SELECT cell FROM qc) AND pid <> {query_id}),"
    )
    parts.append(
        f"qv AS (SELECT {vec_col} AS qv FROM {table} WHERE {id_col} = {query_id}),"
    )
    parts.append(
        f"sims AS (SELECT e.{id_col} AS neighbor_id, {cos} AS cosine_sim"
        f" FROM {table} e JOIN cand ON e.{id_col} = cand.pid CROSS JOIN qv q),"
    )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\n"
        f"SELECT neighbor_id, cosine_sim FROM sims"
        f" ORDER BY cosine_sim DESC, neighbor_id LIMIT {k}"
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.40,
    k: int = 4,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 9973,
) -> DataFrame:
    """Semantic deduplication, SemDeDup-shape (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus with the
    DETERMINISTIC k-means above, then within each cluster drop every
    vector whose cosine similarity to a LOWER-id cluster-mate reaches
    ``threshold`` (keep-first greedy — the canonical member of a
    semantic near-dup group is its min id, the x69 representative
    rule). Lexical tiers (x01 exact hash, x03 SimHash, x04
    MinHash-LSH) cannot see these duplicates: a paraphrase shares no
    shingles, but its embedding is nearly parallel.

    Returns one row per input vector: (id, cell, keep, max_lower_sim)
    where ``max_lower_sim`` is the pinned 6dp cosine
    (similarity._pairwise_sim convention) to the nearest lower-id
    cluster-mate, NULL for each cluster's min id. Every stage is
    deterministic — integer-micro k-means cells, the pinned cosine
    kernel, an id-based keep rule — so the whole output value-hash
    matches the unrolled-CTE oracle (x94).

    ``id_col`` must be NUMERIC (ADVICE r14): the deterministic seed
    rule (pmod(id, seed_mod)) raises an ANSI cast error on any
    non-numeric id before the pair join runs — loud, not silent. The
    pair-join block tags additionally hash the id, so they are
    type-safe and the output is invariant to the block assignment
    regardless.

    Scale: clustering bounds the quadratic — the pair join is
    cell-blocked, Σ|cell|² work, exactly the SemDeDup economics (k
    grows with the corpus so |cell| stays ~constant; the paper runs
    k=11k on 100M docs). The cosine kernel stays codegen
    (precomputed norms + the _sql_dot fold, similarity.with_l2_norm
    rationale); the only data-scale exchanges are the k-means
    assignment aggregate and the cell-keyed pair shuffle.
    """
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import (
        round_half_up as rhu,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity import (
        cosine_pre,
        with_l2_norm,
    )

    assigned, _ = _kmeans_core(
        embeddings, k, n_iters, dim, id_col, vec_col, seed_mod
    )
    cells = assigned.select("pid", "cell")
    vec = with_l2_norm(
        cells.join(
            embeddings.select(F.col(id_col).alias("pid"), F.col(vec_col)),
            "pid",
        ),
        vec_col,
        dim,
        "__nrm",
    )
    lo = vec.select(
        F.col("pid").alias("lo_id"),
        "cell",
        F.col(vec_col).alias("__lvec"),
        F.col("__nrm").alias("__lnrm"),
    )
    hi = vec.select(
        F.col("pid").alias("hi_id"),
        "cell",
        F.col(vec_col).alias("__hvec"),
        F.col("__nrm").alias("__hnrm"),
    )
    # Blocked self-join on the cell key (round 14, guide §2.5): the
    # join key has exactly k distinct values, so with a SMALL k the
    # whole Σ|cell|² cosine stage runs on ≤ k tasks no matter how many
    # cores exist — x94 (k=4) at sf10 serialized ~5·10⁹ pair folds onto
    # 2-4 cores and sat for tens of minutes. Standard 2-D blocking
    # (matrix-multiply tiling): each side takes a deterministic block
    # tag (pmod of its id, b sub-blocks per side) and replicates b ways
    # tagged with the OTHER side's block values, so every (lo, hi) cell
    # pair meets exactly once — pair multiset identical, max unchanged
    # — while the join key (cell, bl, bh) carries k·b² values, sized
    # ≈8× the core count so the hash spreads evenly (a key count equal
    # to the partition count leaves ~1/e of partitions empty — measured
    # 8 of 32 cores busy on the 1-D variant). b derives from k and the
    # cluster width only: at paper-scale k (|cells| ≥ 8·cores) b = 1
    # and the plan is the unblocked one.
    import math

    par = embeddings.sparkSession.sparkContext.defaultParallelism
    b = max(1, math.ceil(math.sqrt(8.0 * par / max(k, 1))))
    if b > 1:
        # Block on a HASH of the id (ADVICE r14): pmod on the raw id
        # yields NULL for a non-numeric id_col, which would silently
        # fail every (cell,__bl,__bh) equi-join and return keep=true
        # for all vectors. xxhash64 is deterministic for any type; the
        # output is invariant to the block assignment (every (lo, hi)
        # pair still meets exactly once — at block
        # (hash(lo)%b, hash(hi)%b) — so the pair multiset and per-id
        # max are unchanged; x94 MATCH re-verified).
        lo = lo.withColumn(
            "__bl", F.pmod(F.xxhash64(F.col("lo_id")), F.lit(b))
        ).withColumn("__bh", F.explode(F.expr(f"sequence(0, {b - 1})")))
        hi = hi.withColumn(
            "__bh", F.pmod(F.xxhash64(F.col("hi_id")), F.lit(b))
        ).withColumn("__bl", F.explode(F.expr(f"sequence(0, {b - 1})")))
        join_keys = ["cell", "__bl", "__bh"]
        # Width pin (the x72 lesson, SCALE.md round-11 rule): the pair
        # join's inputs are byte-modest but its OUTPUT is Σ|cell|²
        # compute-dense folds, which AQE — planning by bytes — coalesces
        # (measured 16 of 32 cores at sf10). An explicit numPartitions
        # repartition on the join keys is AQE-exempt; both sides share
        # the distribution so the join adds no further exchange.
        width = 2 * par
        lo = lo.repartition(width, *join_keys)
        hi = hi.repartition(width, *join_keys)
    else:
        join_keys = ["cell"]
    sim = rhu(cosine_pre("__hvec", "__lvec", "__hnrm", "__lnrm", dim), 6)
    mx = (
        lo.join(hi, join_keys)
        .filter(F.col("lo_id") < F.col("hi_id"))
        .select("hi_id", sim.alias("__sim"))
        .groupBy("hi_id")
        .agg(F.max("__sim").alias("max_lower_sim"))
    )
    return (
        cells.join(mx, cells.pid == mx.hi_id, "left")
        .select(
            F.col("pid").alias(id_col),
            "cell",
            (
                F.col("max_lower_sim").isNull()
                | (F.col("max_lower_sim") < F.lit(threshold))
            ).alias("keep"),
            "max_lower_sim",
        )
    )


def semdedup_oracle_sql(
    table: str = "embeddings",
    threshold: float = 0.40,
    k: int = 4,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 9973,
) -> str:
    """DuckDB twin of :func:`semdedup`: the unrolled k-means CTEs, the
    cell-blocked lower-id pair join with the pinned cosine text, and
    the same keep rule."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity import (
        duckdb_cosine_sql,
    )

    parts, a_last, _ = _kmeans_cte_parts(
        table, k, n_iters, dim, id_col, vec_col, seed_mod
    )
    body = "\n".join(parts).rstrip(",")
    cos = duckdb_cosine_sql(f"el.{vec_col}", f"eh.{vec_col}")
    return f"""{body},
    pairs AS (
        SELECT hi.pid AS hi_id, {cos} AS sim
        FROM {a_last} lo JOIN {a_last} hi
          ON lo.cell = hi.cell AND lo.pid < hi.pid
        JOIN {table} el ON el.{id_col} = lo.pid
        JOIN {table} eh ON eh.{id_col} = hi.pid
    ),
    mx AS (SELECT hi_id, MAX(sim) AS max_lower_sim FROM pairs GROUP BY hi_id)
    SELECT a.pid AS {id_col}, a.cell,
           (m.max_lower_sim IS NULL OR m.max_lower_sim < {threshold})
               AS keep,
           m.max_lower_sim
    FROM {a_last} a LEFT JOIN mx m ON a.pid = m.hi_id"""
