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
