"""Source-level hygiene for the __ray_entry__ registries (VERDICT r4 #2).

Python dict literals silently keep the LAST value for a duplicated key, so
a stale duplicate entry (like the round-4 ``copurchase_lift_top20`` pair
with two divergent oracle definitions) passes every runtime check while
leaving a semantic landmine in the source.  These tests parse the file with
``ast`` and assert the literal key lists themselves are duplicate-free, and
that the driver's frozen first-50 correctness window order never moves.
"""

import ast
import json
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

ENTRY_PATH = "/root/repo/__ray_entry__.py"


def _literal_dict_keys(func_name: str) -> list[str]:
    """String keys of every dict literal returned by ``func_name``, in
    source order (a returned dict built any other way fails loudly)."""
    tree = ast.parse(open(ENTRY_PATH).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            keys: list[str] = []
            # only the function's OWN top-level returns — nested helper
            # functions (SQL builders) may return non-dict values
            for stmt in node.body:
                if isinstance(stmt, ast.Return) and isinstance(stmt.value, ast.Dict):
                    for k in stmt.value.keys:
                        assert isinstance(k, ast.Constant) and isinstance(
                            k.value, str
                        ), f"non-literal key in {func_name}: {ast.dump(k)}"
                        keys.append(k.value)
            assert keys, f"no top-level dict-literal return in {func_name}"
            return keys
    raise AssertionError(f"function {func_name} not found")


def test_queries_dict_has_no_duplicate_keys():
    keys = _literal_dict_keys("queries")
    dupes = [k for k, n in Counter(keys).items() if n > 1]
    assert dupes == [], f"duplicate queries() keys: {dupes}"


def test_oracle_sql_dict_has_no_duplicate_keys():
    keys = _literal_dict_keys("oracle_sql")
    dupes = [k for k, n in Counter(keys).items() if n > 1]
    assert dupes == [], f"duplicate oracle_sql() keys: {dupes}"


def test_oracle_keys_subset_of_queries():
    q = set(_literal_dict_keys("queries"))
    o = set(_literal_dict_keys("oracle_sql"))
    assert o <= q, f"oracle entries without a query: {sorted(o - q)}"


def test_driver_first50_window_order_frozen():
    """The driver hashes the first 50 queries() keys; CORRECTNESS_r04.json
    records the round-4 window.  Hold that order verbatim."""
    frozen = list(json.load(open("/root/repo/CORRECTNESS_r04.json")).keys())
    live = _literal_dict_keys("queries")[: len(frozen)]
    assert live == frozen


def test_runtime_dicts_match_literals():
    import __ray_entry__ as entrymod

    assert list(entrymod.queries().keys()) == _literal_dict_keys("queries")
    assert list(entrymod.oracle_sql().keys()) == _literal_dict_keys("oracle_sql")
