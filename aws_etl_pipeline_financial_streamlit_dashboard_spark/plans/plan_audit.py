"""Logical-plan broadcast-policy audit helpers.

House rule (docs/SCALE.md session defaults): a hardcoded broadcast
hint is legitimate ONLY on a frame whose size is bounded by
construction — constant-cardinality dims (nation/region), global
aggregates (1 row), Limit/top-k outputs, frames keyed by a
bounded-domain attribute. Linearly-scaling tables (customer, supplier,
part, orders, lineitem, documents, embeddings) must leave the
broadcast decision to ``autoBroadcastJoinThreshold`` + AQE, or guard
the hint behind :func:`catalog.dim_fits_broadcast`.

These helpers walk an ANALYZED logical plan via py4j (no execution)
and classify every broadcast-strategy ResolvedHint. Used by
``tools/audit_broadcasts.py`` (whole-catalog sweep) and
``tests/test_broadcast_policy.py`` (the standing regression net).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# attribute-name markers that identify a linearly-scaling table's scan
LINEAR_MARKERS = (
    "c_custkey#",      # customer
    "s_suppkey#",      # supplier
    "p_partkey#",      # part
    "o_orderkey#",     # orders
    "l_orderkey#",     # lineitem
    "doc_id#",         # documents
    "vec_id#",         # embeddings
)
_BOUNDING_NODES = ("GlobalLimit", "LocalLimit")


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
    scans a linearly-scaling table with no bounding Aggregate/Limit
    between the hint and the scan. Empty list == policy-clean."""

    def bounded(node) -> bool:
        if _is_bounding(node):
            return True
        kids = _children(node)
        if not kids:
            return not any(m in node.toString() for m in LINEAR_MARKERS)
        return all(bounded(k) for k in kids)

    flagged = []
    for h in broadcast_hints(df):
        child = _children(h)[0]
        if not bounded(child):
            s = child.toString()
            leaks = [m.rstrip("#") for m in LINEAR_MARKERS if m in s]
            flagged.append(f"top={_cls(child)} scans={','.join(leaks)}")
    return flagged
