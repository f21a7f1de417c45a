"""Perf-artifact consistency net (VERDICT r8 item 1b).

Round 8 committed a PERFDIFF_r8.json claiming zero regressions next to a
PERFDIFF_r8.txt flagging x09 at 4.01x — the two were generated from
different sweeps. tools/perf_diff.py v2 now emits both from ONE
computation; this test regenerates the committed artifacts from the
committed CORRECTNESS_FULL pair + adjudications file and byte-compares,
so the three can never disagree again (the docs/CATALOG.md byte-equality
discipline applied to perf artifacts).

Also pins the adjudication contract itself: an artifact pair with a
regression flag but no adjudication must be REFUSED by the tool.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.perf_diff import GENERATOR, compute, render_txt  # noqa: E402


def _v2_rounds() -> list[int]:
    rounds = []
    for p in REPO.glob("PERFDIFF_r*.json"):
        m = re.fullmatch(r"PERFDIFF_r(\d+)\.json", p.name)
        if not m:
            continue
        n = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except ValueError:
            continue
        if data.get("generator") != GENERATOR:
            continue  # pre-v2 artifact (historical, not regenerable)
        if (REPO / f"CORRECTNESS_FULL_r{n - 1}.json").exists() and (
            REPO / f"CORRECTNESS_FULL_r{n}.json"
        ).exists():
            rounds.append(n)
    return sorted(rounds)


ROUNDS = _v2_rounds()


def test_at_least_one_v2_artifact_exists():
    # the net is only a net if it has something to check — round 8's
    # regenerated pair is the first v2 artifact
    assert ROUNDS, "no v2 PERFDIFF artifacts found to pin"


@pytest.mark.parametrize("n", ROUNDS)
def test_perfdiff_matches_full_pair(n: int):
    old = json.loads((REPO / f"CORRECTNESS_FULL_r{n - 1}.json").read_text())
    new = json.loads((REPO / f"CORRECTNESS_FULL_r{n}.json").read_text())
    committed = json.loads((REPO / f"PERFDIFF_r{n}.json").read_text())

    diff = compute(old, new, committed.get("threshold", 2.0))
    adj_path = REPO / "docs" / f"perf_adjudications_r{n}.json"
    adjudications = json.loads(adj_path.read_text()) if adj_path.exists() else {}
    diff["adjudications"] = adjudications

    expected_json = json.dumps(diff, indent=1, sort_keys=True) + "\n"
    assert (REPO / f"PERFDIFF_r{n}.json").read_text() == expected_json, (
        f"PERFDIFF_r{n}.json does not match a regeneration from the "
        f"committed FULL pair — rerun tools/perf_diff.py"
    )
    expected_txt = render_txt(diff, adjudications)
    assert (REPO / f"PERFDIFF_r{n}.txt").read_text() == expected_txt, (
        f"PERFDIFF_r{n}.txt does not match — rerun tools/perf_diff.py"
    )


@pytest.mark.parametrize("n", ROUNDS)
def test_every_regression_flag_is_adjudicated(n: int):
    committed = json.loads((REPO / f"PERFDIFF_r{n}.json").read_text())
    adj = committed.get("adjudications", {})
    for entry in committed["regressions_over_2x_and_0p5s"]:
        assert entry in adj and adj[entry].strip(), (
            f"regression flag {entry} in PERFDIFF_r{n}.json has no "
            f"written adjudication"
        )


def test_tool_refuses_unadjudicated_regression(tmp_path):
    old = {"e1": {"spark_elapsed_sec": 0.5}}
    new = {"e1": {"spark_elapsed_sec": 3.0}}
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = tmp_path / "d.json"
    import subprocess

    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "perf_diff.py"),
         str(po), str(pn), "--json", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1, r.stdout + r.stderr
    assert "REFUSING" in r.stdout
    assert not out.exists()


def test_tool_refuses_stale_adjudication(tmp_path):
    old = {"e1": {"spark_elapsed_sec": 1.0}}
    new = {"e1": {"spark_elapsed_sec": 1.0}}
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    adj = tmp_path / "adj.json"
    adj.write_text(json.dumps({"ghost_entry": "noise"}))
    out = tmp_path / "d.json"
    import subprocess

    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "perf_diff.py"),
         str(po), str(pn), "--adjudications", str(adj), "--json", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1, r.stdout + r.stderr
    assert "stale" in r.stdout
    assert not out.exists()


def test_round_log_bench_tables_match_artifacts():
    """VERDICT r10 item 3: ROUND10.md quoted an sf10 total (8.26 s /
    2.57×) that disagreed with the committed BENCH_local_sf10.json
    (9.36 s / 2.92×). Round logs now embed the cross-scale table as an
    AUTOGEN block; this test regenerates it from the committed
    artifacts and byte-compares every round log that carries the
    marker — prose can no longer drift from the JSON."""
    from tools.gen_bench_prose import BEGIN, END, render

    expected = render(str(REPO))
    def _round_num(p: Path) -> int:
        m = re.search(r"ROUND(\d+)", p.name)
        return int(m.group(1)) if m else -1

    carriers = [
        p
        for p in sorted((REPO / "docs").glob("ROUND*.md"), key=_round_num)
        if BEGIN in p.read_text()
    ]
    assert carriers, (
        "no round log embeds the AUTOGEN bench table — run "
        "tools/gen_bench_prose.py and paste the block into the "
        "current docs/ROUND{N}.md"
    )
    # only the LATEST carrier must match the current artifacts (older
    # logs quoted the artifacts of their own round, which are
    # overwritten in place by the per-round sweep)
    latest = carriers[-1]
    text = latest.read_text()
    block = text[text.index(BEGIN): text.index(END) + len(END)]
    assert block == expected, (
        f"{latest.name}'s bench table does not match the committed "
        "artifacts — regenerate with tools/gen_bench_prose.py"
    )


def test_bench_prose_zero_totals_render_dash(tmp_path):
    """ADVICE r11: a legitimate 0.0 serving total must not be treated
    as a MISSING artifact (`if ssrv and dsrv` truthiness), and a 0.0
    DuckDB denominator must render '—' rather than raise
    ZeroDivisionError into the byte-pin test."""
    import json as _json

    from tools.gen_bench_prose import render

    (tmp_path / "BENCH_local_sf0.1.json").write_text(
        _json.dumps({"value": 0.0, "serving_headline_total_sec": 0.0})
    )
    (tmp_path / "DUCK_sf0.1.json").write_text(
        _json.dumps({"value": 0.0, "serving_headline_total_sec": 0.0})
    )
    out = render(str(tmp_path))
    assert "0.00 s | 0.00 s | —" in out
    assert "ZeroDivision" not in out


def test_round_log_closing_tally_matches_artifacts():
    """VERDICT r11 item 3: closing-tally prose drifted from the
    committed artifacts two rounds running (r10 quoted a stale sf10
    total; r11 claimed 3 adjudicated PERFDIFF flags against a 0-flag
    artifact). The tally is now generated from the artifacts
    themselves (tools/gen_closing_tally.py) and byte-pinned here, the
    same discipline as the AUTOGEN bench table: every round log that
    carries the marker AND whose round artifacts are still the
    committed ones (the latest carrier) must match a fresh render."""
    from tools.gen_closing_tally import BEGIN, END, render

    def _round_num(p: Path) -> int:
        m = re.search(r"ROUND(\d+)", p.name)
        return int(m.group(1)) if m else -1

    carriers = [
        p
        for p in sorted((REPO / "docs").glob("ROUND*.md"), key=_round_num)
        if BEGIN in p.read_text()
    ]
    if not carriers:
        import pytest

        pytest.skip(
            "no round log embeds the closing tally yet — required from "
            "round 12's closing onwards"
        )
    latest = carriers[-1]
    text = latest.read_text()
    block = text[text.index(BEGIN) : text.index(END) + len(END)]
    expected = render(str(REPO), _round_num(latest))
    assert block == expected, (
        f"{latest.name}'s closing tally drifted from the committed "
        f"artifacts — regenerate with tools/gen_closing_tally.py "
        f"--round {_round_num(latest)}"
    )
