"""Connected components via min-label propagation — the iterative
operator that turns pairwise near-duplicate evidence into dedup
clusters (pair lists from MinHash-LSH / SimHash / n-gram Jaccard say
"a≈b"; cluster-and-keep-canonical needs the transitive closure).

Algorithm: every node starts labeled with its own id; each round every
node takes the min of its own label and its neighbors' labels; stop
when no label changes. Converges in O(graph diameter) rounds — small
for dedup graphs, which are unions of near-cliques.

Scale design:
- each round is one shuffle (edge⋈label join + min-aggregate) over
  |E|+|V| rows — no driver-side graph materialization;
- ``localCheckpoint`` after every round truncates the lineage, keeping
  the plan O(1) instead of O(rounds) (the classic iterative-Spark trap:
  round N replays rounds 1..N-1);
- the convergence check is a count of changed labels — one action per
  round, driver sees only a scalar;
- for adversarial diameters (long chains) use
  :func:`connected_components_star` below — the alternating
  large/small-star algorithm (same join primitives, O(log n) rounds).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import CheckpointRotator, truncate_lineage


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    probe_convergence: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Return (node, component_id) for every node appearing in
    ``edges``, where component_id = min node id in the component.

    Nodes with no edges simply don't appear — callers left-join and
    coalesce to the node's own id (a singleton is its own canonical).

    ``probe_convergence=False`` runs exactly ``max_iter`` rounds with
    ZERO driver actions beyond the lineage checkpoints — the x46
    (pagerank_int) pattern for fully scheduled pipelines where a
    per-round ``count()`` round trip is unwanted. Labels are identical
    to the probed mode whenever ``max_iter`` ≥ the graph diameter
    (min-label propagation is monotone: once converged, further rounds
    are no-ops).

    ``reliable=True`` swaps every per-round lineage truncation for a
    durable checkpoint (operators/lineage.py) — the edge closure and
    label state are corpus-scale at 100 TB, so on a preemptible cluster
    the default executor-local blocks would turn one executor loss into
    a dead job.
    """
    # Truncate the EDGE lineage once, before anything derives from it:
    # the caller's edge frame is typically expensive (the collapse
    # family feeds the full shingle self-join here), and deriving both
    # sym and the label init from the raw frame re-executed that
    # derivation per materialization — measured as 2 full edge
    # computations inside one x69 pass at gate scale (round 13). One
    # upfront truncation makes sym a narrow union over the checkpoint
    # and the label init a cheap distinct over it.
    ed = truncate_lineage(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")),
        reliable,
    )
    sym = ed.union(ed.select(F.col("d").alias("s"), F.col("s").alias("d")))
    labels = (
        ed.select(F.col("s").alias("node"))
        .union(ed.select(F.col("d").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    # the per-round label state ROTATES: round N's durable checkpoint
    # makes round N-1's files dead, so the rotator deletes them — a
    # HARD ≤2-live-rounds footprint bound instead of the best-effort
    # ContextCleaner path (ADVICE r8). sym stays narrow over the
    # loop-invariant edge checkpoint.
    rot = CheckpointRotator(labels, reliable)
    labels = rot.rotate(labels)

    label_type = labels.schema["label"].dataType
    for _ in range(max_iter):
        # The node's previous label rides the aggregate as min("old")
        # (null on message rows, so min() recovers exactly the labels-
        # branch value): the convergence check is then a narrow filter
        # over the checkpointed result instead of a labels⋈new_labels
        # join — one shuffle join and one job less per round.
        msgs = sym.join(labels, sym.s == labels.node).select(
            F.col("d").alias("node"),
            F.col("label"),
            F.lit(None).cast(label_type).alias("old"),
        )
        new_labels = rot.rotate(
            labels.select("node", "label", F.col("label").alias("old"))
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("old").alias("old")),
        )
        labels = new_labels.select("node", "label")
        if probe_convergence:
            changed = new_labels.filter(F.col("label") != F.col("old")).count()
            if changed == 0:
                break
    return labels.select("node", F.col("label").alias("component_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    reliable: bool = False,
) -> DataFrame:
    """Alternating large-star/small-star connected components —
    the O(log n)-round variant for adversarial diameters.

    Min-label propagation (above) needs O(diameter) rounds: a 10⁶-node
    chain — or the long path a crawler's redirect chains can produce —
    would take 10⁶ shuffles. The alternating algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SOCC'14) rewires
    the edge set itself toward stars rooted at each component's min:

    - large-star: per node u, attach every LARGER neighbor to
      m = min(Γ(u) ∪ {u});
    - small-star: per node u (edges oriented u > v), attach every
      smaller neighbor and u itself to m = min(Γ<(u) ∪ {u}).

    Both halve tree heights geometrically; convergence (edge set is a
    fixed point: every edge already points at its component min) takes
    O(log n) rounds on any topology. Same per-round economics as
    min-propagation — one groupBy + one join per half-round over |E|
    rows, lineage truncated per round, a scalar (count, checksum)
    convergence probe — so the upgrade changes the ROUND COUNT, not the
    round shape. Edges stay canonically oriented (u > v), so the state
    carries |E| rows, not 2|E|.

    Returns (node, component_id = component min), the same contract as
    :func:`connected_components`; singletons don't appear (callers
    coalesce). Node ids need only be orderable — the min is taken in
    the column type's order.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )
    # per-round edge state rotates (hard ≤2-live-rounds checkpoint
    # footprint — see connected_components / lineage.CheckpointRotator)
    rot = CheckpointRotator(e, reliable)
    e = rot.rotate(e)
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # -- large-star ---------------------------------------------------
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least("__mn", F.col("u")).alias("m"))
        )
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star (ls edges are already oriented u > v) -------------
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        attach_nbrs = ls.join(mins2, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        attach_self = mins2.select("u", F.col("m").alias("v"))
        e2 = rot.rotate(
            attach_nbrs.union(attach_self)
            .filter(F.col("u") != F.col("v"))
            .distinct(),
        )
        # Fixed-point probe: (count, two INDEPENDENT order-free hash
        # sums) of the edge set. One xxhash64 sum alone has a ~2⁻⁶⁴
        # chance of matching on a CHANGED edge set (early exit with
        # wrong components); a second sum with a different seed column
        # makes a joint collision negligible (~2⁻¹²⁸). Decimal sums: a
        # long sum of 64-bit hashes overflows under ANSI semantics.
        sig = tuple(
            e2.agg(
                F.count("*"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.sum(F.xxhash64(F.lit(0x5EED), "u", "v").cast("decimal(38,0)")),
            ).first()
        )
        e = e2
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        warnings.warn(
            f"connected_components_star: edge set did not reach a fixed "
            f"point within max_iter={max_iter} rounds; labels may split "
            f"components. Raise max_iter (O(log n) rounds suffice on any "
            f"topology).",
            RuntimeWarning,
            stacklevel=2,
        )
    labels = (
        e.groupBy("u")
        .agg(F.min("v").alias("label"))
        .select(F.col("u").alias("node"), "label")
    )
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(labels, "node", "left_anti")
        .withColumn("label", F.col("node"))
    )
    return labels.union(roots).select(
        "node", F.col("label").alias("component_id")
    )


def triangle_count(
    edges: DataFrame, a_col: str = "a", b_col: str = "b",
    reliable: bool = False,
) -> DataFrame:
    """Global triangle count by DEGREE ORDERING (the Chiba–Nishizeki /
    MapReduce orientation trick): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher, enumerate directed
    wedges u→v, u→w with (deg v, v) < (deg w, w), and close them
    against the directed edge set. Each triangle is counted EXACTLY
    once, and — the scale property — every vertex's out-degree is
    bounded by O(√m) on any graph, so wedge count is O(m^1.5) worst
    case instead of Σdeg² (a single celebrity hub in a naive
    enumeration generates deg² wedges; oriented, its out-edges only
    point to higher-degree vertices, of which there are few).

    Input: undirected edges in any form — they are CANONICALIZED
    defensively (a < b via least/greatest, self-loops dropped,
    distinct), so duplicate or reversed edges cannot multiply wedge or
    triangle counts through the closing join. Output: one row
    (n_vertices, n_edges, n_wedges, n_triangles) over the canonical
    edge set — all integer arithmetic, bit-exact on any engine or
    partitioning.

    Plan: one degree aggregate, two broadcast-or-shuffle joins to
    attach degrees, a self-join on the wedge pivot, and a closing
    LEFT join keyed (v, w) whose match flag feeds ONE aggregate for
    both the wedge and triangle counts. The edge set and the oriented
    edge set are localCheckpointed so the four output counters read
    materialized frames instead of re-running the (dominant) wedge
    self-join and edge build per counter. No iteration; the only
    driver actions are the two checkpoints.
    """
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("ea"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("eb"),
        )
        .filter(F.col("ea") < F.col("eb"))
        .distinct()
    )
    e = truncate_lineage(e, reliable)
    deg = (
        e.select(F.col("ea").alias("v"))
        .union(e.select(F.col("eb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("ea"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("eb"), F.col("deg").alias("db"))
    ed = e.join(da, "ea").join(db, "eb")
    # orient low (deg, id) → high (deg, id); ties impossible since a<b
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ea") < F.col("eb"))
    )
    directed = ed.select(
        F.when(a_first, F.col("ea")).otherwise(F.col("eb")).alias("src"),
        F.when(a_first, F.col("eb")).otherwise(F.col("ea")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )
    directed = truncate_lineage(directed, reliable)
    d1 = directed.select(
        F.col("src"), F.col("dst").alias("v"), F.col("dst_deg").alias("v_deg")
    )
    d2 = directed.select(
        F.col("src"), F.col("dst").alias("w"), F.col("dst_deg").alias("w_deg")
    )
    wedges = d1.join(d2, "src").filter(
        (F.col("v_deg") < F.col("w_deg"))
        | ((F.col("v_deg") == F.col("w_deg")) & (F.col("v") < F.col("w")))
    )
    closing = directed.select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.lit(1).alias("__hit")
    )
    wedge_stats = (
        wedges.join(closing, ["v", "w"], "left")
        .groupBy()
        .agg(
            F.count("*").alias("n_wedges"),
            F.count("__hit").alias("n_triangles"),
        )
    )
    return (
        deg.groupBy()
        .agg(F.count("*").alias("n_vertices"))
        .crossJoin(e.groupBy().agg(F.count("*").alias("n_edges")))
        .crossJoin(wedge_stats)
    )


def doc_components_by_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    n: int = 3,
    star: bool = False,
) -> DataFrame:
    """Near-dup connected components for EVERY document, computed at
    the DISTINCT-TEXT level (round 12): returns (id_col, component_id)
    with component_id = MIN document id in the cluster — one row per
    input document, exactly the per-row closure's labels.

    Why this exists: n-gram Jaccard is a property of a document's
    TEXT, so byte-identical documents are pairwise connected by
    construction (Jaccard 1 ≥ any sane threshold) and a document
    cluster is precisely a text-level component expanded through the
    fingerprint map. Running the shingle self-join per ROW pays the
    replication's quadratic clique blowup for edges the expansion gets
    for free — the first sf10 run of x18 spilled the disk to death on
    exactly that (500k docs, ~5k distinct texts, ×10,000 pair space;
    docs/PERF.md round-12). The equivalence is pinned two ways: the
    x18/x43 DuckDB oracles KEEP the per-row recursive-CTE closure
    (every gate MATCH is a proof), and
    tests/test_incremental_dedup.py compares both constructions on
    handwritten replicated fixtures.

    ``star=True`` routes the text-level closure through
    :func:`connected_components_star` (O(log n) rounds) instead of
    min-label propagation — x43's algorithm contract, unchanged.
    """
    from .dedup import ngram_jaccard_pairs

    # Null-safe: md5(NULL) is NULL and the __h/__lbl equi-joins below
    # would silently drop NULL-text documents (NULL never equals NULL),
    # breaking the one-row-per-input-document contract. Coalescing to ''
    # matches the per-row closure's ['']-shingle treatment of NULL text
    # (ADVICE r12). No-op on the catalog corpus (no NULL texts).
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    fpmap = docs.select(F.col(id_col), fp.alias("__h"))
    texts = docs.select(
        fp.alias("__h"),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
    ).dropDuplicates(["__h"])
    edges = ngram_jaccard_pairs(
        texts, id_col="__h", text_col=text_col, n=n, threshold=threshold
    ).select("doc_a", "doc_b")
    cc = connected_components_star if star else connected_components
    tcomp = cc(edges, src="doc_a", dst="doc_b")
    lbl = fpmap.join(tcomp, fpmap["__h"] == tcomp["node"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("component_id"), F.col("__h")).alias("__lbl"),
    )
    comp_min = lbl.groupBy("__lbl").agg(
        F.min(id_col).alias("component_id")
    )
    return lbl.join(comp_min, "__lbl").select(id_col, "component_id")
