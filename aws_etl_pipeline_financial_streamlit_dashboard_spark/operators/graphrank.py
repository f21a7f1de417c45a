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
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    # ONE graph-scale loop invariant, not two (round 14, guide §5):
    # the previous form checkpointed sym (|2E| rows) AND the
    # sym⋈degrees join output (|2E| rows again) — two pinned,
    # un-evictable deserialized copies of the edge closure, neither
    # consumed inside the loop except `out` — and the first sf10 probe
    # of x46 OOM'd the 24 GB local heap on exactly that (50M distinct
    # pairs → ~100M sym rows ×2 checkpoints). The degree now attaches
    # in the same pass as the closure via a count window over u (no
    # separate aggregate, no graph-scale join, no sym checkpoint), and
    # the single surviving checkpoint stores SERIALIZED bytes
    # (MEMORY_AND_DISK with deserialized=False) instead of per-row
    # objects. Same (u, v, deg) rows — window count per u IS the
    # degree — so the recurrence and the oracle are untouched.
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    out = truncate_lineage(
        sym.withColumn("deg", F.count("*").over(Window.partitionBy("u"))),
        reliable,
        storage_level=None if reliable else StorageLevel.MEMORY_AND_DISK,
    )

    # per-round rank state rotates: round N's durable checkpoint makes
    # round N-1's files dead, so they are deleted immediately — hard
    # ≤2-live-rounds footprint (lineage.CheckpointRotator, ADVICE r8).
    # `out` is loop-invariant and stays checkpointed for the loop.
    rot = CheckpointRotator(out, reliable)
    ranks = rot.rotate(
        out.select("u")
        .distinct()
        .select("u", F.lit(MICRO).cast("long").alias("rank_us"))
    )

    for _ in range(iterations):
        # `div` = exact integer division on longs in BOTH engines
        # (DuckDB `//`); double `/` + cast could truncate k-1 when the
        # float quotient lands one ulp under an exact integer.
        contribs = out.join(ranks, "u").select(
            F.col("v").alias("u"),
            F.expr("rank_us div deg").alias("c"),
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
