"""Web-crawl curation primitives: URL canonicalization, host rollup,
per-host crawl-budget sampling (VERDICT r4 item 6 — the LLM-pipeline
family for curating crawled corpora before training).

The driver testdata has no URL column, so the catalog entries first
SYNTHESIZE a deterministic raw URL per document (messy on purpose:
mixed-case scheme/host, default and non-default ports, tracking
params, fragments — the shapes a real crawl frontier emits), then
canonicalize it. Every derivation is a pinned scalar chain — ONE
Python template renders the same SQL text for both engines (the house
rule that makes oracle parity hold by construction); the only dialect
split is DuckDB's explicit ``'g'`` flag on global REGEXP_REPLACE.

Canonicalization contract (the common crawl-dedup subset):
- scheme and host lowercase;
- default ports stripped (http:80, https:443), others kept;
- fragment stripped (never sent to the server);
- tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
  ``ref`` — the public-rule-list core), remaining params kept in
  original order (order-normalization is a corpus-policy choice, not
  applied here, and documented so downstream dedup knows);
- empty query string drops the ``?``.

Scale notes (100 TB): everything here is a narrow per-row projection —
whole-stage-codegen string ops, zero shuffle for canonicalization
itself; host rollup and budget sampling shuffle once on the host key,
and the budget rank is itself the hot-host mitigation (a crawl
frontier's `example.com` tail would otherwise dominate any
per-host state).
"""

from __future__ import annotations

# Tracking parameters stripped by canonicalize (the stable core of the
# public removal lists, e.g. the ClearURLs rules): any utm_* campaign
# tag plus the big ad-click identifiers.
TRACKING_PARAM_REGEX = r"(^|&)(utm_[a-z]+|gclid|fbclid|ref)=[^&]*"


def _rr_g(expr: str, pattern: str, replacement: str, engine: str) -> str:
    """Global REGEXP_REPLACE in either dialect (Spark is global by
    default; DuckDB needs the explicit 'g' flag)."""
    if engine == "duckdb":
        return f"REGEXP_REPLACE({expr}, '{pattern}', '{replacement}', 'g')"
    return f"REGEXP_REPLACE({expr}, '{pattern}', '{replacement}')"


def sql_raw_url() -> str:
    """Deterministic messy raw URL per document row (shared dialect).

    References ``doc_id`` and ``source``. Variant axes are keyed on
    doc_id residues so every canonicalization rule has covered inputs:
    scheme case (%3), www prefix (%2), port flavor (%5 — default port
    matching the scheme, a non-default 8080, or none), query-string
    shape (%4 — leading/trailing/no tracking params), fragment (%7).
    """
    scheme = (
        "CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS'"
        " ELSE 'Http' END"
    )
    port = (
        f"CASE WHEN doc_id % 5 = 0 THEN"
        f" (CASE WHEN LOWER({scheme}) = 'https' THEN ':443' ELSE ':80' END)"
        f" WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END"
    )
    query = (
        "CASE doc_id % 4"
        " WHEN 0 THEN CONCAT('?utm_source=feed&id=', doc_id,"
        "                    '&utm_campaign=news')"
        " WHEN 1 THEN CONCAT('?id=', doc_id, '&gclid=CjK', doc_id % 97)"
        " WHEN 2 THEN CONCAT('?id=', doc_id, '&page=2')"
        " ELSE '' END"
    )
    return (
        f"CONCAT({scheme}, '://',"
        f" CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END,"
        f" source, '.Example.COM', {port},"
        f" '/docs/', doc_id % 1000, '/item', {query},"
        f" CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
    )


def sql_canon_parts(u: str, engine: str) -> dict[str, str]:
    """Decompose URL expression ``u`` into canonical parts (SQL text).

    Returns SQL strings for ``scheme``, ``host``, ``port``, ``path``,
    ``query`` (tracking-stripped), ``url`` (full canonical form) and
    ``domain`` (registered-domain heuristic: last two host labels).
    Pure SPLIT_PART/SUBSTRING decomposition — no regex except the
    tracking strip, so both dialects share every expression verbatim.
    """
    nofrag = f"SPLIT_PART({u}, '#', 1)"
    scheme = f"LOWER(SPLIT_PART({nofrag}, '://', 1))"
    rest = f"SPLIT_PART({nofrag}, '://', 2)"
    hostport = f"SPLIT_PART(SPLIT_PART({rest}, '/', 1), '?', 1)"
    host = f"LOWER(SPLIT_PART({hostport}, ':', 1))"
    port = f"SPLIT_PART({hostport}, ':', 2)"
    pathq = f"SUBSTRING({rest}, LENGTH({hostport}) + 1)"
    path = f"SPLIT_PART({pathq}, '?', 1)"
    # Everything after the FIRST '?' — a second literal '?' is legal in
    # the query component (RFC 3986), so SPLIT_PART(...,'?',2) would
    # silently truncate it; substring past the path keeps it. When there
    # is no '?', pathq == path and the substring start is past the end,
    # yielding '' in both dialects.
    rawq = f"SUBSTRING({pathq}, LENGTH({path}) + 2)"
    # Strip tracking params (the pattern consumes its own leading '&',
    # so the removal itself never doubles separators), then normalize
    # PRE-EXISTING malformed '&&' runs — crawled query strings contain
    # them — and trim boundary separators.
    stripped = _rr_g(rawq, TRACKING_PARAM_REGEX, "", engine)
    collapsed = _rr_g(stripped, "&&+", "&", engine)
    query = f"TRIM(BOTH '&' FROM {collapsed})"
    port_part = (
        f"CASE WHEN {port} = ''"
        f" OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" THEN '' ELSE CONCAT(':', {port}) END"
    )
    url = (
        f"CONCAT({scheme}, '://', {host}, {port_part}, {path},"
        f" CASE WHEN {query} = '' THEN '' ELSE CONCAT('?', {query}) END)"
    )
    # [.] not \. — Spark's SQL string literal unescapes the backslash
    # (the regex would become '.', any-char) while DuckDB passes it
    # through; the bracket class is identical in both dialects.
    domain = f"REGEXP_EXTRACT({host}, '([^.]+[.][^.]+)$', 1)"
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "url": url,
        "domain": domain,
    }


# Knuth multiplicative hash over doc_id: the deterministic, engine-
# portable rank key for budget sampling. The inner % 2147483648 folds
# doc_id into 31 bits BEFORE the multiply so the product stays under
# 2^63 for ANY non-negative BIGINT id: 2^31 × 2654435761 ≈ 5.7e18 <
# 2^63−1 ≈ 9.2e18 (a raw doc_id multiply overflows past ~3.47e9, and
# a 32-bit fold still overflows past residue ~3.47e9 — ~19% of its
# space). Identical output for ids below 2^31, which covers every
# driver-generated id; both engines' % agrees on non-negatives.
CRAWL_RANK_SQL = "((doc_id % 2147483648) * 2654435761) % 4294967296"


def sql_html_doc() -> str:
    """Deterministic synthetic HTML page per document row (shared
    dialect) — the raw-fetch analog of :func:`sql_raw_url`, since the
    testdata has no markup column. References ``doc_id`` and ``text``.
    Variant axes keyed on doc_id residues so every extraction rule has
    covered inputs: %7 drops the <title> element entirely (the no-match
    path), %4 sets the anchor count 0-3 (the zero-repeat path), %5
    varies the link host.

    The embedded text is angle-bracket-SANITIZED and the title content
    is prefixed so it is never empty: a real fetch escapes entities, and
    here it guarantees the page's only markup is the markup this
    builder wrote — so the extraction invariants (title NULL iff the
    element is absent, anchor count == the %4 axis) hold for ANY
    document text the driver regenerates, not just the current corpus.
    """
    clean = "REPLACE(REPLACE(COALESCE(text, ''), '<', ' '), '>', ' ')"
    title = (
        "CASE WHEN doc_id % 7 = 0 THEN ''"
        " ELSE CONCAT('<title>doc ', doc_id, ' ',"
        f" TRIM(SUBSTR({clean}, 1, 24)), '</title>') END"
    )
    link = (
        "CONCAT('<a href=\"https://h', doc_id % 5, '.example/p\">x</a>')"
    )
    return (
        f"CONCAT('<html><head>', {title}, '</head><body><p>',"
        f" SUBSTR({clean}, 1, 200), '</p>',"
        f" REPEAT({link}, CAST(doc_id % 4 AS INT)), '</body></html>')"
    )


def sql_html_fields(h: str, engine: str) -> dict[str, str]:
    """Extraction SQL over an HTML string expression ``h``: ``title``
    (NULL when the element is absent — both engines return '' on a
    REGEXP_EXTRACT miss, normalized through NULLIF), ``n_links``
    (anchor count via length arithmetic, no regex), ``body_len``
    (characters after stripping every tag) and ``markup_pct``
    (HALF_UP integer percent of markup overhead). Dialect splits:
    DuckDB's 'g' flag on the global strip, and integer division
    (Spark DIV vs DuckDB //, equal on these non-negative operands).
    """
    div = "//" if engine == "duckdb" else "DIV"
    body = _rr_g(h, "<[^>]*>", "", engine)
    return {
        "title": (
            f"NULLIF(REGEXP_EXTRACT({h}, '<title>([^<]*)</title>', 1), '')"
        ),
        "n_links": (
            f"CAST((LENGTH({h}) - LENGTH(REPLACE({h}, '<a href', '')))"
            f" {div} 7 AS BIGINT)"
        ),
        "body_len": f"CAST(LENGTH({body}) AS BIGINT)",
        "markup_pct": (
            f"CAST(FLOOR(CAST(100 AS DOUBLE)"
            f" * (LENGTH({h}) - LENGTH({body})) / LENGTH({h}) + 0.5)"
            f" AS BIGINT)"
        ),
    }
