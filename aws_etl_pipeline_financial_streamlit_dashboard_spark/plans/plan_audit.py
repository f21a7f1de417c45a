"""Logical-plan broadcast-policy audit helpers.

House rule (docs/SCALE.md session defaults): a hardcoded broadcast
hint is legitimate ONLY on a frame whose size is bounded by
construction — constant-cardinality dims (nation/region), global
aggregates (1 row), Limit/top-k outputs, frames keyed by a
bounded-domain attribute. Every other table scales linearly with the
corpus (customer, supplier, part, orders, lineitem, events, documents,
embeddings, and any derived parquet) and must leave the broadcast
decision to ``autoBroadcastJoinThreshold`` + AQE, or guard the hint
behind :func:`catalog.dim_fits_broadcast`.

v2 (ADVICE r8): classification walks to LEAF RELATION nodes and keys
on the relation's table identity — the scan's file path basename or
catalog-table name — instead of grepping attribute-name substrings out
of ``toString()``. The v1 substring scheme had three silent
false-negative classes: entries that rename key columns before
hinting, linearly-scaling tables missing from the marker list (events
was!), and scan schemas wider than ``spark.sql.debug.maxToStringFields``
(string truncation dropped the marker attributes). The rule is now
DEFAULT-LINEAR: any leaf relation whose identity is not in
``CONSTANT_TABLES`` counts as linearly-scaling, so a new table is
linear until proven constant, not the other way around.
``CTERelationRef`` leaves are resolved to their definitions (the
analyzed plan of a WITH query keeps defs under ``WithCTE``);
identity-less leaves that are literally driver-local data
(``LocalRelation``/``OneRowRelation``/``Range``) are bounded, and
identity-less distributed leaves (``LogicalRDD`` from a checkpoint)
use the attribute-marker list only to NAME which linear table leaked —
a marker-less one still flags as ``LogicalRDD:unknown`` (DEFAULT-LINEAR
uniformly; ADVICE r9), with known-bounded offsets frames allowlisted
by flag signature in ``tools/audit_broadcasts.py``.

These helpers walk an ANALYZED logical plan via py4j (no execution)
and classify every broadcast-strategy ResolvedHint. Used by
``tools/audit_broadcasts.py`` (whole-catalog sweep) and
``tests/test_broadcast_policy.py`` (the standing regression net).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# the ONLY constant-cardinality base tables: 5 regions, 25 nations —
# everything else is linear in the corpus by default
CONSTANT_TABLES = {"region", "nation", "sg_region", "sg_nation"}

# last-resort attribute markers for identity-less distributed leaves
# (LogicalRDD after a checkpoint); real scans never reach this branch
LINEAR_MARKERS = (
    "c_custkey#",      # customer
    "s_suppkey#",      # supplier
    "p_partkey#",      # part
    "o_orderkey#",     # orders
    "l_orderkey#",     # lineitem
    "event_id#",       # events
    "doc_id#",         # documents
    "vec_id#",         # embeddings
)
_BOUNDING_NODES = ("GlobalLimit", "LocalLimit")
_LOCAL_LEAVES = ("LocalRelation", "OneRowRelation", "Range")


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _is_bounding(node) -> bool:
    """A node that bounds its output size regardless of input size:
    a global (no grouping keys) Aggregate, or a Limit."""
    c = _cls(node)
    if c in _BOUNDING_NODES:
        return True
    if c == "Aggregate":
        return node.groupingExpressions().size() == 0
    return False


def _leaf_table(node) -> str | None:
    """Table identity of a leaf relation node: the catalog table name
    when the scan is catalog-backed, else the root-path basename
    (``.../customer.parquet`` → ``customer``); None for identity-less
    leaves (LogicalRDD, streaming sources)."""
    c = _cls(node)
    if c in ("LogicalRelation", "HiveTableRelation"):
        try:
            ct = node.catalogTable()
            if ct.isDefined():
                return ct.get().identifier().table().lower()
        except Exception:  # noqa: BLE001 — no catalogTable accessor
            pass
        try:
            paths = node.relation().location().rootPaths()
            if paths.size() > 0:
                base = paths.apply(0).getName()
                return base.split(".")[0].lower()
        except Exception:  # noqa: BLE001 — non-FS relation (e.g. JDBC)
            pass
        try:
            # JDBCRelation(tablename) [numPartitions=N]
            s = node.relation().toString()
            if s.startswith("JDBCRelation("):
                return s[len("JDBCRelation("):].split(")")[0].lower()
        except Exception:  # noqa: BLE001
            pass
    return None


def _cte_defs(root) -> dict:
    """cteId -> definition plan, from every WithCTE in the tree."""
    defs: dict = {}

    def walk(node):
        if _cls(node) == "CTERelationDef":
            defs[node.id()] = _children(node)[0]
        for ch in _children(node):
            walk(ch)

    walk(root)
    return defs


def broadcast_hints(df: DataFrame):
    """All broadcast-strategy ResolvedHint nodes in df's analyzed plan."""
    out = []

    def walk(node):
        if (
            _cls(node) == "ResolvedHint"
            and "broadcast" in node.hints().toString().lower()
        ):
            out.append(node)
        for ch in _children(node):
            walk(ch)

    walk(df._jdf.queryExecution().analyzed())
    return out


def unbounded_broadcast_hints(df: DataFrame) -> list[str]:
    """Subtree summaries for each broadcast hint whose hinted frame
    scans a linearly-scaling relation with no bounding Aggregate/Limit
    between the hint and the scan. Empty list == policy-clean."""
    root = df._jdf.queryExecution().analyzed()
    cte_defs = _cte_defs(root)

    def linear_leaves(node, acc: list) -> bool:
        """True iff the subtree is bounded; collects the linear leaf
        identities it scans into ``acc`` otherwise."""
        if _is_bounding(node):
            return True
        c = _cls(node)
        if c == "CTERelationRef":
            d = cte_defs.get(node.cteId())
            if d is None:
                acc.append("unresolved-cte")
                return False
            return linear_leaves(d, acc)
        kids = _children(node)
        if not kids:
            if c in _LOCAL_LEAVES:
                return True  # driver-local literal data
            t = _leaf_table(node)
            if t is not None:
                if t in CONSTANT_TABLES:
                    return True
                acc.append(t)
                return False
            # identity-less distributed leaf: attribute-marker fallback
            # names WHICH linear table leaked; no marker match means we
            # cannot prove boundedness, and the rule is DEFAULT-LINEAR
            # (ADVICE r9) — a checkpointed frame whose key columns were
            # renamed before hinting must surface, not silently pass.
            # Known-bounded identity-less frames (the |partitions|-row
            # offsets side tables) are allowlisted by flag signature in
            # tools/audit_broadcasts.py, same as the marker-named ones.
            s = node.toString()
            leaks = [m.rstrip("#") for m in LINEAR_MARKERS if m in s]
            acc.extend(f"{c}:{x}" for x in (leaks or ["unknown"]))
            return False
        ok = True
        for k in kids:
            if not linear_leaves(k, acc):
                ok = False
        return ok

    flagged = []
    for h in broadcast_hints(df):
        child = _children(h)[0]
        acc: list = []
        if not linear_leaves(child, acc):
            flagged.append(
                f"top={_cls(child)} scans={','.join(sorted(set(acc)))}"
            )
    return flagged
