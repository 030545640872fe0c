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
