"""Property-based check of the distributed BPE trainer (x80's
operator) against a sequential pure-Python reference implementation.

The hypothesis corpora draw from a 3-letter alphabet with short docs,
which FORCES the hard regions: a==a candidate runs (overlap parity),
count ties (the (count DESC, pair ASC) tiebreak), docs that shrink to
a single symbol mid-loop (empty-winner no-op rounds), and empty docs.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_bpe(docs: dict[int, list[str]], k: int):
    """Sequential reference: exactly the textbook greedy trainer."""
    docs = {d: list(t) for d, t in docs.items()}
    winners: list[tuple[str, str, int] | None] = []
    for _ in range(k):
        counts: Counter = Counter()
        for toks in docs.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += 1
        if not counts:
            winners.append(None)
            continue
        (a, b), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        winners.append((a, b, cnt))
        for d, toks in docs.items():
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + " " + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            docs[d] = out
    return docs, winners


corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=corpus_strategy)
def test_bpe_matches_sequential_reference(spark, corpus):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import (
        bpe_merge_rounds,
    )

    rows = [
        (doc_id, pos, tok)
        for doc_id, toks in enumerate(corpus)
        for pos, tok in enumerate(toks)
    ]
    ref_docs, ref_winners = _ref_bpe(dict(enumerate(corpus)), 2)
    if not rows:
        return  # all-empty corpus: nothing to compare
    df = spark.createDataFrame(rows, ["doc_id", "pos", "tok"])
    final_seq, winners = bpe_merge_rounds(df, 2)

    got_winners = []
    for w in winners:
        r = w.collect()
        got_winners.append((r[0].a, r[0].b, r[0].cnt) if r else None)
    assert got_winners == ref_winners

    got_docs: dict[int, list[str]] = {d: [] for d in range(len(corpus))}
    for r in final_seq.orderBy("doc_id", "pos").collect():
        got_docs[r.doc_id].append(r.tok)
    assert got_docs == {d: t for d, t in ref_docs.items()}


def _ref_var_cvar(values):
    """Sequential reference for q75: _RET_BP quantization, then the
    exact 5% order-statistic tail. Tie order cannot change VaR (the
    k-th smallest VALUE) or CVaR (sum of the k smallest values)."""
    import math

    rets = []
    for prev, cur in zip(values, values[1:]):
        if prev is None or cur is None or prev == 0.0:
            continue
        r = min(max(cur / prev - 1.0, -10.0), 10.0)
        rets.append(math.floor(r * 10000.0 + 0.5))
    if not rets:
        return None
    rets.sort()
    n = len(rets)
    k = (5 * n + 99) // 100
    var = rets[k - 1]
    cvar = math.floor(sum(rets[:k]) / k * 10000.0 + 0.5) / 10000.0
    return n, k, var, cvar


def test_q75_matches_sequential_reference(spark, tmp_path):
    """30 seeded random symbols (including a zero-price tick — the
    NULL-return path — and a 100x jump — the +-10 clamp path) through
    the real catalog entry vs the pure-Python reference."""
    import numpy as np
    import pandas as pd

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES

    rng = np.random.default_rng(42)
    rows = []
    eid = 0
    expected = {}
    for s in range(30):
        sym = f"SYM{s:02d}"
        n = int(rng.integers(2, 60))
        vals = list(np.round(rng.uniform(10, 200, size=n), 2))
        if s == 0:
            vals[len(vals) // 2] = 0.0       # NULL-return path
        if s == 1:
            vals.append(vals[-1] * 100.0)    # clamp path (+10.0)
        for i, v in enumerate(vals):
            rows.append(
                (eid, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=eid),
                 1, sym, float(v), "{}")
            )
            eid += 1
        ref = _ref_var_cvar([float(v) for v in vals])
        if ref is not None:
            expected[sym] = ref
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    got = QUERIES["q75_var_cvar"].spark(spark, str(tmp_path)).toPandas()
    got_map = {
        r.event_type: (r.n_ret, r.k_tail, r.var95_bp, r.cvar95_bp)
        for r in got.itertuples(index=False)
    }
    assert got_map == expected
