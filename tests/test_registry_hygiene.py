"""Registry-count hygiene: the prose in README.md and COVERAGE.md must
state the REAL registry size, so coverage claims can't silently drift
from the code (the r7 verdict caught exactly this drift twice)."""

from __future__ import annotations

import re

from tripl_spark.queries.registry import all_oracles, all_queries


def _counts():
    qs, os_ = all_queries(), all_oracles()
    return len(qs), len(os_)


def test_readme_counts_match_registry():
    n_q, n_o = _counts()
    text = open("/root/repo/README.md").read()
    m = re.search(r"\*\*(\d+) queries, (\d+) with\s*\nexact DuckDB oracles\*\*", text)
    assert m, "README.md correctness-gate count sentence not found"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
        f"README says {m.groups()}, registry is {(n_q, n_o)}"
    )
    # the rows-only count in the same sentence
    m2 = re.search(r"the (\d+) rows-only entries", text)
    assert m2 and int(m2.group(1)) == n_q - n_o


def test_coverage_counts_match_registry():
    n_q, n_o = _counts()
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"\((\d+) total,\s+(\d+)\s+with\s+DuckDB oracles", text)
    assert m, "COVERAGE.md count parenthetical not found"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
        f"COVERAGE says {m.groups()}, registry is {(n_q, n_o)}"
    )
    m2 = re.search(r"the (\d+) rows-only entries", text)
    assert m2 and int(m2.group(1)) == n_q - n_o


def test_benchnotes_latest_counts_match_registry():
    """BENCHNOTES is an append-per-round narrative: earlier count
    claims were true when written, but the LAST one is the live claim
    and must match a fresh registry load (the r8 verdict caught it
    two commits stale)."""
    n_q, n_o = _counts()
    text = open("/root/repo/BENCHNOTES.md").read()
    claims = re.findall(r"(\d+)\s*queries\s*/\s*(\d+)\s*oracle", text)
    assert claims, "BENCHNOTES.md has no 'N queries / M oracle' claim"
    assert (int(claims[-1][0]), int(claims[-1][1])) == (n_q, n_o), (
        f"BENCHNOTES' latest claim {claims[-1]} != registry {(n_q, n_o)}"
    )


def test_every_priority_name_is_registered():
    # a _PRIORITY name that never lands in the registry silently wastes
    # a driver-window slot
    from tripl_spark.queries.registry import _PRIORITY

    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names without a registration: {missing}"
