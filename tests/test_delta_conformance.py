"""Delta-branch conformance pin (round-6 verdict ask 7).

delta-spark is not installable in this sandbox, so the HAVE_DELTA branch
of sinks/merge.py can never execute here. What CAN be checked statically:

1. every DeltaTable / DeltaMergeBuilder call our code makes is within a
   VENDORED spec of delta-spark's public Python API (names + parameters,
   from the published docs at https://docs.delta.io/latest/api/python/ —
   public knowledge, pinned below). If we ever call a method or keyword
   the real API doesn't have, this fails without delta installed.
2. the FakeDeltaTable test double accepts the same call shapes, so the
   fallback tests genuinely exercise the spec our code builds.
3. the day delta-spark appears in the environment, the importorskip test
   activates and checks the REAL classes against the same spec — API
   drift in a future delta-spark fails loudly instead of at runtime.
"""

from __future__ import annotations

import ast
import inspect

import pytest

# ---- vendored delta-spark public API (docs.delta.io, python bindings) ----
# parameter lists EXCLUDE self/cls; '?' suffix marks optional parameters.
DELTA_API_SPEC = {
    "DeltaTable": {
        "isDeltaTable": ["sparkSession", "identifier"],
        "forPath": ["sparkSession", "path", "hadoopConf?"],
        "alias": ["aliasName"],
        "merge": ["source", "condition"],
        "toDF": [],
    },
    "DeltaMergeBuilder": {
        "whenMatchedUpdateAll": ["condition?"],
        "whenMatchedUpdate": ["condition?", "set?"],
        "whenMatchedDelete": ["condition?"],
        "whenNotMatchedInsertAll": ["condition?"],
        "whenNotMatchedInsert": ["condition?", "values?"],
        "whenNotMatchedBySourceDelete": ["condition?"],
        "whenNotMatchedBySourceUpdate": ["condition?", "set?"],
        "execute": [],
    },
}

_ALL_SPEC_METHODS = {
    m: params
    for cls in DELTA_API_SPEC.values()
    for m, params in cls.items()
}


def _required(params: list[str]) -> list[str]:
    return [p for p in params if not p.endswith("?")]


def _names(params: list[str]) -> list[str]:
    return [p.rstrip("?") for p in params]


def _delta_calls_in_merge_py() -> list[tuple[str, int, list[str]]]:
    """Every `.method(...)` attribute call in sinks/merge.py whose name is
    a Delta API method: (name, n_positional, kwarg_names)."""
    import cumulus_etl_spark.sinks.merge as merge_mod

    tree = ast.parse(inspect.getsource(merge_mod))
    calls = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in _ALL_SPEC_METHODS
        ):
            calls.append(
                (
                    node.func.attr,
                    len(node.args),
                    [k.arg for k in node.keywords if k.arg],
                )
            )
    return calls


def test_merge_py_calls_are_within_the_vendored_delta_api():
    """Static conformance: the HAVE_DELTA branch only ever calls methods
    and parameters the vendored delta-spark spec has — arity and keyword
    names included (alias/merge/toDF names are shared with the fallback
    path, which is fine: the check is shape, not receiver)."""
    calls = _delta_calls_in_merge_py()
    # the branch genuinely uses the builder: if someone deletes it the
    # test should say so rather than pass vacuously
    used = {name for name, _, _ in calls}
    assert {"whenMatchedUpdateAll", "whenNotMatchedInsertAll",
            "whenMatchedDelete", "whenNotMatchedBySourceDelete",
            "isDeltaTable", "forPath"} <= used
    for name, n_pos, kwargs in calls:
        params = _ALL_SPEC_METHODS[name]
        assert n_pos <= len(params), (name, n_pos, params)
        for kw in kwargs:
            assert kw in _names(params), (name, kw, params)
        # every REQUIRED param is satisfied positionally or by keyword
        needed = _required(params)
        # isDeltaTable/forPath are called as classmethods: sparkSession
        # is an explicit argument, already counted in n_pos
        assert n_pos + len(kwargs) >= len(needed), (name, n_pos, kwargs, needed)


def test_fake_delta_table_accepts_the_same_call_shapes(spark):
    """The FakeDeltaTable double used by the fallback tests must accept
    every call shape our code makes (otherwise those tests exercise a
    different spec than production would)."""
    from tests.test_merge_sink import FakeDeltaTable, _FakeMergeBuilder

    for name, n_pos, kwargs in _delta_calls_in_merge_py():
        owner = None
        for cls in (FakeDeltaTable, _FakeMergeBuilder):
            if hasattr(cls, name):
                owner = cls
                break
        assert owner is not None, f"fake double lacks {name}"
        fn = inspect.unwrap(getattr(owner, name))
        sig = inspect.signature(fn)
        params = [p for p in sig.parameters.values() if p.name not in ("self", "cls")]
        # self/cls are already filtered out of params, so this is the
        # positional budget regardless of static/bound flavor
        accepts_pos = sum(
            p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD) for p in params
        )
        assert n_pos <= accepts_pos, (name, n_pos, sig)
        for kw in kwargs:
            assert kw in sig.parameters, (name, kw, sig)


def test_real_delta_spark_matches_vendored_spec():
    """Activates the day delta-spark is installed: the real classes must
    expose every spec'd method accepting the spec'd parameters."""
    tables = pytest.importorskip("delta.tables")
    real = {
        "DeltaTable": tables.DeltaTable,
        "DeltaMergeBuilder": tables.DeltaMergeBuilder,
    }
    for cls_name, methods in DELTA_API_SPEC.items():
        cls = real[cls_name]
        for name, params in methods.items():
            assert hasattr(cls, name), f"{cls_name}.{name} missing"
            sig = inspect.signature(inspect.unwrap(getattr(cls, name)))
            have = [p for p in sig.parameters if p not in ("self", "cls")]
            for p in _required(params):
                assert p in have, (cls_name, name, p, have)


def test_real_delta_merge_end_to_end(spark, tmp_path):
    """Activates with delta-spark: ManagedTable.merge through the real
    DeltaTable builder (requires the session to carry the delta
    extensions; skipped with a reason otherwise)."""
    pytest.importorskip("delta.tables")
    import cumulus_etl_spark.sinks.merge as merge_mod
    from cumulus_etl_spark.sinks import ManagedTable, MergePolicy

    if not merge_mod.HAVE_DELTA:
        pytest.skip("delta importable but merge module loaded without it")
    try:
        spark.range(1).write.format("delta").save(str(tmp_path / "probe"))
    except Exception as e:  # session lacks delta extensions/jars
        pytest.skip(f"delta-spark installed but session can't write delta: {e}")
    t = ManagedTable(spark, str(tmp_path), "patients")
    pol = MergePolicy(keys=("id",), last_updated_field=None, num_buckets=2)
    t.merge(spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int"), pol)
    t.merge(spark.createDataFrame([("b", 9), ("c", 3)], "id string, v int"), pol)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {"a": 1, "b": 9, "c": 3}
