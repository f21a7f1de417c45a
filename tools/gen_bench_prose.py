"""Generate the round log's cross-scale headline table FROM the
committed bench artifacts (VERDICT r10 item 3: ROUND10.md quoted an
sf10 total that disagreed with BENCH_local_sf10.json — prose-quoted
numbers now come from one generator, and a byte-pin test
(tests/test_perf_artifacts.py) asserts the block in the round log
equals this script's output over the committed artifacts).

Usage: python tools/gen_bench_prose.py [--repo-root .]
Prints the markdown block between the AUTOGEN markers; paste (or let
the test compare) into docs/ROUND{N}.md.
"""

from __future__ import annotations

import argparse
import json
import os

SCALES = ("sf0.1", "sf1", "sf10")
BEGIN = "<!-- BENCH_TABLE_AUTOGEN BEGIN (tools/gen_bench_prose.py) -->"
END = "<!-- BENCH_TABLE_AUTOGEN END -->"


def _load(root: str, name: str):
    path = os.path.join(root, name)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def render(root: str) -> str:
    lines = [
        BEGIN,
        "| scale | Spark seq (sum of per-query min) | DuckDB seq | ratio |"
        " Spark serving | DuckDB serving | serving ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for sf in SCALES:
        b = _load(root, f"BENCH_local_{sf}.json")
        d = _load(root, f"DUCK_{sf}.json")
        if b is None or d is None:
            lines.append(f"| {sf} | (artifact missing) | | | | | |")
            continue
        sv = b["value"]
        dv = d["value"]
        ssrv = b.get("serving_headline_total_sec")
        dsrv = d.get("serving_headline_total_sec")

        def _ratio(num, den):
            # `is not None`, not truthiness: a legitimate 0.0 total is
            # a value, and a 0.0 denominator must render as "—", not
            # raise ZeroDivisionError into the byte-pin test (ADVICE
            # r11).
            if num is None or den is None or den == 0:
                return "—"
            return f"{num / den:.2f}×"

        srv = (
            f"{ssrv:.2f} s | {dsrv:.2f} s | {_ratio(ssrv, dsrv)}"
            if ssrv is not None and dsrv is not None
            else "— | — | —"
        )
        lines.append(
            f"| {sf} | {sv:.2f} s | {dv:.2f} s | {_ratio(sv, dv)} | {srv} |"
        )
    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-root", default=".")
    args = ap.parse_args()
    print(render(args.repo_root))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
