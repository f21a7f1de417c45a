#!/usr/bin/env python
"""Diff two CORRECTNESS_FULL artifacts' per-entry ``spark_elapsed_sec``
fields — the round-over-round consumer of the regression net run_verify
records since round 7. Prints entries whose elapsed changed by more
than ``--threshold`` (default 2×) and at least 0.5 s absolute (the
sub-second entries jitter with container noise), plus totals.

Usage:
    python tools/perf_diff.py CORRECTNESS_FULL_r7.json CORRECTNESS_FULL_r8.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    thr = 2.0
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))

    def t(rec) -> float | None:
        v = rec.get("spark_elapsed_sec")
        return float(v) if v is not None else None

    old_t = {k: t(v) for k, v in old.items() if t(v) is not None}
    new_t = {k: t(v) for k, v in new.items() if t(v) is not None}
    if not old_t or not new_t:
        print("one of the artifacts carries no spark_elapsed_sec fields "
              "(pre-round-7 schema) — nothing to diff")
        return 0

    common = sorted(set(old_t) & set(new_t))
    flagged = []
    for k in common:
        a, b = old_t[k], new_t[k]
        if abs(b - a) < 0.5:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio >= thr or ratio <= 1.0 / thr:
            flagged.append((ratio, k, a, b))
    flagged.sort(reverse=True)
    for ratio, k, a, b in flagged:
        print(f"{ratio:6.2f}x  {k}: {a:.2f}s -> {b:.2f}s")
    if not flagged:
        print(f"no entry moved >= {thr}x (and >= 0.5 s) across "
              f"{len(common)} common entries")
    print(
        f"totals: {sum(old_t[k] for k in common):.1f}s -> "
        f"{sum(new_t[k] for k in common):.1f}s over {len(common)} common; "
        f"{len(set(new_t) - set(old_t))} new, "
        f"{len(set(old_t) - set(new_t))} removed"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
