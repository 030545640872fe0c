"""Driver-contract invariants for __spark_entry__ (no Spark session).

The external driver takes the FIRST 50 ``queries()`` entries as its
correctness gate, so ordering is part of the product contract: every
entry that has never had a driver row must sit inside that window.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as E
from cumulus_etl_spark.plans import CATALOG


def test_gate_priority_names_all_exist():
    missing = [n for n in E._GATE_PRIORITY if n not in CATALOG]
    assert not missing, f"_GATE_PRIORITY names absent from CATALOG: {missing}"
    assert len(set(E._GATE_PRIORITY)) == len(E._GATE_PRIORITY), "duplicates"


def test_ordered_covers_catalog_exactly_once():
    names = E._ordered()
    assert sorted(names) == sorted(CATALOG)
    assert len(names) == len(set(names))


def test_never_gated_entries_inside_first_50_window():
    window = E._ordered()[:50]
    priority_head = E._GATE_PRIORITY[: min(50, len(E._GATE_PRIORITY))]
    assert window[: len(priority_head)] == priority_head


def test_queries_and_oracles_align():
    qs = E.queries()
    osql = E.oracle_sql()
    assert set(osql) <= set(qs)
    assert list(qs)[: len(E._GATE_PRIORITY)] == [
        n for n in E._GATE_PRIORITY if n in CATALOG
    ]
    # each oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_freshness_ledger_is_derived():
    """r12 verdict: the rotation comment's freshness arithmetic slipped
    by one in two consecutive rounds — so the claim is now a pinned
    tuple (_FRESHNESS_ASOF) and THIS test does the arithmetic, from the
    driver's own CORRECTNESS_r*.json artifacts against the CURRENT
    catalog (retired entries drop out of the counts automatically)."""
    import glob
    import json
    import re
    from collections import Counter

    asof, want_counts, want_never = E._FRESHNESS_ASOF

    last: dict[str, int] = {}
    seen_rounds: set[int] = set()
    for path in glob.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        if rnd > asof:
            continue  # artifacts landing after the pin don't invalidate it
        seen_rounds.add(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if isinstance(row, dict) and row.get("hash_match"):
                    last[name] = max(last.get(name, 0), rnd)
    assert asof in seen_rounds, f"no CORRECTNESS_r{asof:02d}.json found"

    oracled = [n for n in CATALOG if CATALOG[n].oracle is not None]
    got_counts = dict(Counter(last[n] for n in oracled if n in last))
    assert got_counts == want_counts, (got_counts, want_counts)

    got_never = sorted(n for n in oracled if n not in last)
    assert got_never == sorted(want_never), (got_never, want_never)

    # staging discipline, derived: (a) every never-gated entry occupies
    # one of the earliest feasible slots — inside the 50-slot window or
    # leading the overflow (position 51, the staged next-round leader);
    # (b) the window never takes a fresher entry while a staler gated
    # one waits outside — EXCEPT the entries a round's VERDICT orders
    # re-covered out of turn (E._VERDICT_RECOVER, r13-verdict ask 5:
    # the r13 rewrites' semantics-sensitive entries get a driver row
    # before the stalest cohort finishes rotating).
    order = E._ordered()
    pos = {n: i for i, n in enumerate(order)}
    for n in got_never:
        assert pos[n] <= 50, f"never-gated {n} at position {pos[n]}"
    recover = set(getattr(E, "_VERDICT_RECOVER", []))
    gated_in = [last[n] for n in order[:50] if n in last and n not in recover]
    gated_out = [
        last[n] for n in order[50:]
        if n in last and CATALOG[n].oracle is not None
    ]
    if gated_in and gated_out:
        assert max(gated_in) <= min(gated_out), (
            "window holds a fresher entry than one left outside:",
            max(gated_in), min(gated_out),
        )
    # the exception list is itself bounded: every exempted entry must be
    # gated (a real re-coverage, not a smuggled fresh add) and inside
    # the window it claims a slot of.
    for n in recover:
        assert n in last and pos[n] < 50, f"_VERDICT_RECOVER abuse: {n}"
