"""Deterministic PageRank — iterative link-graph scoring with exact
cross-engine parity.

Link-graph centrality is a standard corpus-quality signal (crawl
pipelines rank hosts/pages by it to prioritize and filter; the same
power-iteration shape scores any entity graph). The catalog needs the
ITERATIVE operator family beyond connected components, and it needs it
oracle-checkable — which float PageRank is not: distributed float sums
are order-dependent, so Spark and a serial engine drift at the last
ulp and rounding can't reliably mask that at hash-compare strictness.

The fix is the same move as functions.scalars.dec_sum: do the
arithmetic in INTEGER micro-units. Ranks are bigint micros
(1_000_000 = 1.0); each iteration is

    contrib(u)   = rank_us(u) DIV degree(u)          (integer division)
    rank_us'(v)  = 150_000 + (850_000 * Σ incoming contrib) DIV 1_000_000

Integer sums are order-independent, so a FIXED number of iterations
yields bit-identical bigints on any engine and any partitioning — the
oracle simply unrolls the same recurrence. (The DIV truncation leaks
rank mass, which plain PageRank would renormalize; for a quality
SIGNAL the ordering is what matters and the leak is deterministic.
Overflow: the damping product runs in decimal(38,0) on the Spark side,
matching the oracle's HUGEINT sums — a hub can absorb the entire mass
of a ~10²⁵-node graph before either side overflows, so the practical
bound is the long SUM of contribs (≈9·10¹² nodes of mass into one
aggregation key), far past any real component.)

Scale shape: per iteration one join (ranks ⋈ out-edges, shuffled on
the source key) + one aggregate (shuffled on the destination key) over
|E| rows — identical economics to connected components' rounds;
``localCheckpoint`` truncates lineage so the plan stays O(1) across
iterations. Iteration count is fixed (not convergence-probed): no
driver round trips at all beyond the checkpoint actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import CheckpointRotator, truncate_lineage

DAMP_US = 850_000  # 0.85 damping in micro-units
BASE_US = 150_000  # (1 - 0.85)
MICRO = 1_000_000


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    reliable: bool = False,
) -> DataFrame:
    """Deterministic integer PageRank over an UNDIRECTED graph given as
    an edge list (each edge contributes both directions). Returns
    (node, rank_us) with rank in bigint micro-units; isolated nodes
    don't appear (callers union them at BASE_US + DAMP_US·0 if needed).

    ``reliable=True``: the edge closure and per-round rank state are
    graph-scale — durably checkpoint them (operators/lineage.py) so an
    executor loss mid-iteration recomputes from storage instead of
    killing the job.
    """
    # Loop-invariant build, ONE exchange and NO sort (round 15, guide
    # §§2.4, 1.2 — VERDICT r14 item 4's decomposition found the old
    # build spent ~40 s of x46's ~117 s/pass at sf10 on three corpus
    # exchanges plus a full |2E| window sort):
    #
    #   union → repartition(u) → dropDuplicates(u,v) → count per u
    #
    # HashPartitioning(u) satisfies ClusteredDistribution for BOTH the
    # (u, v) distinct and the per-u degree count (partitioning keys
    # are a subset of the grouping keys), so after the single
    # repartition exchange both aggregates run in place — the old
    # shape paid a distinct exchange on (u, v) AND a window exchange
    # on u, and the window additionally SORTED all |2E| rows. The
    # degree lives in its own |V|-row checkpoint instead of riding
    # every edge row: the big pinned invariant is 2 longs/row, not 3
    # (guide §2.3 — shuffle/store fewer bytes).
    #
    # AQE is disabled around the invariant build only: under AQE the
    # checkpoint captures UnknownPartitioning (the adaptive root hides
    # the final partitioning from Dataset.checkpoint), and every
    # iteration would re-exchange — and re-sort, under the vanilla
    # session's sort-merge default — the full edge list. Round 14's
    # "exchange-free iteration join" claim silently rested on AQE
    # auto-broadcasting the |V|-row rank state, which stops at the
    # broadcast caps long before 100 TB. With the partitioning
    # recorded, the SHUFFLE_HASH-hinted iteration joins stream the
    # edge checkpoint in place at ANY graph size: per iteration, one
    # pass over the edges plus the unavoidable contribution-aggregate
    # exchange — zero sorts, zero edge-side exchanges (plan dumps in
    # plans/r15/). The conf toggle is driver-side, build-time only,
    # and restored in a finally.
    from pyspark.storagelevel import StorageLevel

    spark = edges.sparkSession
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = truncate_lineage(
            raw.repartition("u").dropDuplicates(["u", "v"]),
            reliable,
            storage_level=None if reliable else StorageLevel.MEMORY_AND_DISK,
        )
        degs = truncate_lineage(
            out.groupBy("u").agg(F.count("*").alias("deg")), reliable
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)

    # per-round rank state rotates: round N's checkpoint makes round
    # N-1's blocks/files dead, so they are released immediately — hard
    # ≤2-live-rounds footprint (lineage.CheckpointRotator, ADVICE r8).
    # `out`/`degs` are loop-invariant and stay checkpointed. The rank
    # init is degs' node set — identical to distinct(u) over sym, but
    # |V| rows instead of a |2E| distinct pass.
    rot = CheckpointRotator(out, reliable)
    ranks = rot.rotate(
        degs.select("u", F.lit(MICRO).cast("long").alias("rank_us"))
    )

    for _ in range(iterations):
        # `div` = exact integer division on longs in BOTH engines
        # (DuckDB `//`); double `/` + cast could truncate k-1 when the
        # float quotient lands one ulp under an exact integer. The
        # per-node contribution joins ranks⋈degs FIRST (|V|⋈|V|), so
        # the edge-scale join carries one small column instead of
        # rank and degree separately.
        cu = ranks.join(degs.hint("SHUFFLE_HASH"), "u").select(
            "u", F.expr("rank_us div deg").alias("c")
        )
        contribs = out.join(cu.hint("SHUFFLE_HASH"), "u").select(
            F.col("v").alias("u"), "c"
        )
        ranks = (
            contribs.groupBy("u")
            .agg(F.sum("c").alias("s"))
            .select(
                "u",
                # The damping product is promoted to decimal(38,0) so
                # Spark matches the oracle's HUGEINT headroom: a plain
                # bigint product 850000*s ANSI-errors past ~1.08e13 of
                # in-mass while DuckDB keeps going — same values, but
                # divergent FAILURE MODES. decimal div truncates toward
                # zero exactly like integer `//` for the non-negative
                # masses here.
                F.expr(
                    f"CAST({BASE_US} + "
                    f"(CAST({DAMP_US} AS DECIMAL(38,0)) * s) div {MICRO} "
                    f"AS BIGINT)"
                ).alias("rank_us"),
            )
        )
        ranks = rot.rotate(ranks)
    return ranks.select(F.col("u").alias("node"), "rank_us")


def pagerank_oracle_sql(edges_cte: str, iterations: int = 5) -> str:
    """Generate the DuckDB oracle for :func:`pagerank_int`: the same
    integer recurrence with the fixed iteration count UNROLLED as
    chained CTEs (recursive CTEs forbid aggregation in the recursive
    term; unrolling a fixed count is plain SQL).

    ``edges_cte`` must be a SELECT yielding columns (src, dst).
    """
    parts = [
        f"WITH e0 AS ({edges_cte}),",
        "sym AS (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM e0 "
        "UNION ALL SELECT dst AS u, src AS v FROM e0)),",
        "deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),",
        "r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS rank_us FROM deg),",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS (SELECT s.v AS u, "
            f"CAST(150000 + CAST(850000 * SUM(CAST(r.rank_us // d.deg AS BIGINT)) "
            f"AS BIGINT) // 1000000 AS BIGINT) AS rank_us "
            f"FROM sym s JOIN deg d ON s.u = d.u "
            f"JOIN r{i} r ON s.u = r.u "
            f"GROUP BY s.v),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"{body}\nSELECT u AS node, rank_us FROM r{iterations}"


def link_prediction_ra(
    und: DataFrame,
    k: int = 20,
    hot_neighbor_cap: int | None = None,
    audit_cap_drops: bool = False,
) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lü & Zhang 2009)
    over a distinct undirected edge list ``und`` with columns
    ``(a, b)``, ``a < b``: every NON-adjacent pair sharing at least
    one neighbor, scored by Σ 1/degree(common neighbor) in exact
    integer ppm, with the raw common-neighbor count and neighbor-set
    Jaccard; top-``k`` under a fully deterministic tie-break
    (ra desc, n_common desc, host_a, host_b).

    ``hot_neighbor_cap`` (VERDICT r10 item 2) is the escape hatch this
    family always ships (x02's ``hot_shingle_cap``, x48's
    ``hot_block_cap``): candidate pairs are generated through shared
    neighbors — adj ⋈ adj on the neighbor key — so ONE vertex of
    degree d emits d·(d−1)/2 pairs, and a Zipf hub (a 10⁶-in-link
    domain at crawl scale) would emit ~10¹² candidates alone. The cap
    drops vertices with degree > cap from the SHARED-NEIGHBOR role
    before the self-join (endpoint degrees for Jaccard stay exact):
    each surviving neighbor emits ≤ cap·(cap−1)/2 pairs, bounding the
    stage at |V|·cap² instead of Σd². The approximation is the
    standard one for common-neighbor methods: a degree-d hub
    contributes RA weight 1/d ≈ 0, so the top-k is insensitive —
    capped candidates are a SUBSET of the uncapped candidates with
    near-identical scores (property-tested), and at EVERY testdata
    scale a cap of 64 is exactly inert: the DuckDB degree probe
    measures max host degree 3 over 20 hosts at sf0.001/0.01/0.1
    (round 11) AND at the gitignored sf1/sf10 (round 12 — the
    key-shifted replication reuses the host vocabulary, so the graph
    does not grow), so the entry's oracle semantics are uncapped.

    ``audit_cap_drops`` (ADVICE r11): because the cap silently
    changes semantics the moment data grows a hub, opt in to a cheap
    eager check — one tiny job over the degree table — that logs a
    WARNING with the dropped-vertex count and max degree whenever the
    cap actually excludes a shared-neighbor vertex (and a DEBUG line
    when it is inert). Off by default so the operator stays fully
    lazy; note that when enabled, PLAN CONSTRUCTION ITSELF runs that
    eager job (a ``.first()`` on the degree aggregate) and re-runs it
    each time the builder is re-invoked — acceptable for a scheduled
    pipeline's one build per run, wrong for interactive plan
    exploration (ADVICE r12). Turn it on in scheduled pipelines where
    the input distribution is not pinned by a probe like the
    catalog's.
    """
    # Truncate the edge list ONCE at entry (round 14 — the
    # connected_components round-13 fix applied here; found by
    # tools/audit_reuse.py): ``und`` is consumed by adj (twice), the
    # non-adjacency anti-join, and through adj by deg and both pair
    # sides — without a boundary the caller's edge DERIVATION (x122:
    # a full-corpus HTML parse + href explode + URL canonicalization)
    # re-executes per consumer (5 surviving copies in the optimized
    # plan). The distinct edge list is exactly SCALE.md rule 5's
    # expensive-to-derive, small-to-materialize shape. Lazy local
    # checkpoint: one narrow derivation job on first use, no
    # plan-build job; cheap to re-run on executor loss (the durable
    # tier stays lineage.truncate_lineage(reliable=True) for callers
    # that need it).
    from .lineage import truncate_lineage

    und = truncate_lineage(und, eager=False)
    adj = und.select(F.col("a").alias("host"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("host"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("host").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("d")
    )
    nbr_deg = deg
    if hot_neighbor_cap is not None:
        nbr_deg = deg.filter(F.col("d") <= F.lit(int(hot_neighbor_cap)))
        if audit_cap_drops:
            import logging

            stats = deg.agg(
                F.sum(
                    F.when(
                        F.col("d") > F.lit(int(hot_neighbor_cap)), 1
                    ).otherwise(0)
                ).alias("dropped"),
                F.max("d").alias("max_d"),
            ).first()
            log = logging.getLogger(__name__)
            if stats and (stats["dropped"] or 0) > 0:
                log.warning(
                    "link_prediction_ra: hot_neighbor_cap=%d drops %d "
                    "shared-neighbor vertices (max degree %d) — the "
                    "result is the capped approximation, not the exact "
                    "RA index",
                    hot_neighbor_cap,
                    stats["dropped"],
                    stats["max_d"],
                )
            else:
                log.debug(
                    "link_prediction_ra: hot_neighbor_cap=%d inert "
                    "(max degree %s)",
                    hot_neighbor_cap,
                    None if stats is None else stats["max_d"],
                )
    pairs = (
        adj.alias("a1")
        .join(adj.alias("a2"), F.expr("a1.nbr = a2.nbr AND a1.host < a2.host"))
        .join(nbr_deg.alias("dn"), F.expr("dn.host = a1.nbr"))
        .select(
            F.col("a1.host").alias("ha"),
            F.col("a2.host").alias("hb"),
            F.col("dn.d").alias("nd"),
        )
    )
    sc = pairs.groupBy("ha", "hb").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_common"),
        F.expr("CAST(SUM(1000000 div nd) AS BIGINT)").alias("ra_ppm"),
    )
    non_adj = sc.join(und, (und.a == sc.ha) & (und.b == sc.hb), "left_anti")
    out = (
        non_adj.join(deg.alias("da"), F.expr("da.host = ha"))
        .join(deg.alias("db"), F.expr("db.host = hb"))
        .select(
            F.col("ha").alias("host_a"),
            F.col("hb").alias("host_b"),
            "n_common",
            "ra_ppm",
            F.expr(
                "CAST((1000000 * n_common) div (da.d + db.d - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    return out.orderBy(
        F.col("ra_ppm").desc(),
        F.col("n_common").desc(),
        "host_a",
        "host_b",
    ).limit(k)
