"""Machine-derive the round log's closing artifact tally (VERDICT r11
item 3): rounds 10 and 11 both shipped closing-tally PROSE that
disagreed with the committed artifacts (r10: a quoted sf10 total; r11:
"3 noise flags, each adjudicated" against a 0-flag PERFDIFF and an
empty adjudications file). The bench table got the
generate-and-byte-pin treatment in r11 (tools/gen_bench_prose.py); this
extends the same discipline to the artifact-referencing tally itself.

Emits one fenced AUTOGEN block summarizing, FROM THE FILES THEMSELVES:
  - CORRECTNESS_FULL_r{N}.json   entry/oracle-green/rows-only counts
  - PERFDIFF_r{N}.json           regression vs improvement flag counts
  - docs/perf_adjudications_r{N}.json   adjudication count
  - BROADCAST_AUDIT_r{N}.txt     the tool's own violations line
  - BENCH_local_sf*/DUCK_sf*     which paired windows are present

Paste the block into docs/ROUND{N}.md §closing;
tests/test_perf_artifacts.py byte-compares the latest round log's
block against a fresh render, so the tally can no longer drift.

Usage: python tools/gen_closing_tally.py --round 12 [--repo-root .]
"""

from __future__ import annotations

import argparse
import json
import os

BEGIN = "<!-- CLOSING_TALLY_AUTOGEN BEGIN (tools/gen_closing_tally.py) -->"
END = "<!-- CLOSING_TALLY_AUTOGEN END -->"

_SCALES = ("sf0.1", "sf1", "sf10")


def _load(root: str, name: str):
    p = os.path.join(root, name)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def render(root: str, n: int) -> str:
    lines = [BEGIN]

    cor = _load(root, f"CORRECTNESS_FULL_r{n}.json")
    if cor is None:
        lines.append(f"- CORRECTNESS_FULL_r{n}.json: MISSING")
    else:
        green = sum(1 for v in cor.values() if v.get("hash_match") is True)
        rows_only = sum(
            1 for v in cor.values() if v.get("err") == "no_oracle"
        )
        bad = sum(
            1
            for v in cor.values()
            if v.get("err") not in (None, "no_oracle")
            or v.get("hash_match") is False
            or v.get("rows_match") is False
            or v.get("schema_match") is False
        )
        lines.append(
            f"- CORRECTNESS_FULL_r{n}.json: {len(cor)} entries — "
            f"{green} oracle-green, {rows_only} rows-only by design, "
            f"{bad} failing"
        )

    pd = _load(root, f"PERFDIFF_r{n}.json")
    adj = _load(root, os.path.join("docs", f"perf_adjudications_r{n}.json"))
    if pd is None:
        lines.append(f"- PERFDIFF_r{n}.json: MISSING")
    else:
        flags = pd.get("flagged", [])
        regr = [f for f in flags if f.get("kind") == "regression"]
        impr = [f for f in flags if f.get("kind") == "improvement"]
        lines.append(
            f"- PERFDIFF_r{n}.json: {len(regr)} regression flag(s), "
            f"{len(impr)} improvement record(s); adjudications file has "
            f"{len(adj) if adj is not None else 'NO'} entr"
            f"{'y' if adj is not None and len(adj) == 1 else 'ies'}"
        )

    ba = os.path.join(root, f"BROADCAST_AUDIT_r{n}.txt")
    if not os.path.exists(ba):
        lines.append(f"- BROADCAST_AUDIT_r{n}.txt: MISSING")
    else:
        with open(ba) as fh:
            tail = [ln.strip() for ln in fh if ln.strip()]
        lines.append(
            f"- BROADCAST_AUDIT_r{n}.txt: {tail[-1] if tail else '(empty)'}"
        )

    present = [
        sf
        for sf in _SCALES
        if os.path.exists(os.path.join(root, f"BENCH_local_{sf}.json"))
        and os.path.exists(os.path.join(root, f"DUCK_{sf}.json"))
    ]
    lines.append(
        "- paired bench windows committed: "
        + (", ".join(present) if present else "NONE")
    )

    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--repo-root", default=".")
    args = ap.parse_args()
    print(render(args.repo_root, args.round))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
