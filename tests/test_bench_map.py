"""The bench prewarm consumer map must stay a SUPERSET of reality.

bench.py builds a staging table only when one of its declared consumer
queries is in the bench list; a consumer missing from the map makes the
builder silently skip, landing the full staging build inside that
query's first timed rep — the cost-attribution smear the gating exists
to prevent (it happened once in r15: q_ann_mrr was missing from
ann_eval_tables' set, caught only by self-review).  This test derives
the true consumer sets from the query modules' CALL GRAPH (ast, with
transitive closure through private helpers) and asserts every derived
consumer is declared.
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERY_PKG = REPO / "level2_to_cassandra_spark" / "queries"


def _call_names(node: ast.AST) -> set[str]:
    """All function names called anywhere under ``node`` — plain
    ``f(...)`` and attribute ``mod.f(...)`` forms both key by the
    bare function name (helper names are unique across the package)."""
    out: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            f = n.func
            if isinstance(f, ast.Name):
                out.add(f.id)
            elif isinstance(f, ast.Attribute):
                out.add(f.attr)
    return out


def _declared_map() -> dict[str, set[str]]:
    """builder function name -> declared consumer set, parsed from the
    dict literal inside bench.py's _staging_builders (nested in main,
    so it cannot be imported)."""
    tree = ast.parse((REPO / "bench.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "_staging_builders":
            ret = next(
                n for n in ast.walk(node) if isinstance(n, ast.Return)
            )
            out: dict[str, set[str]] = {}
            assert isinstance(ret.value, ast.Dict)
            for v in ret.value.values:
                assert isinstance(v, ast.Tuple) and len(v.elts) == 2
                builder, consumers = v.elts
                assert isinstance(builder, ast.Attribute)
                assert isinstance(consumers, ast.Set)
                out[builder.attr] = {
                    c.value for c in consumers.elts
                    if isinstance(c, ast.Constant)
                }
            return out
    raise AssertionError("_staging_builders not found in bench.py")


def test_bench_prewarm_consumers_cover_every_call_site():
    declared = _declared_map()
    builders = set(declared)

    # caller -> callees over every top-level function in the package
    calls: dict[str, set[str]] = {}
    for mod in sorted(QUERY_PKG.glob("*.py")):
        tree = ast.parse(mod.read_text())
        for node in tree.body:
            if isinstance(node, ast.FunctionDef):
                calls.setdefault(node.name, set()).update(_call_names(node))

    def reaches(fn: str, target: str, seen: frozenset = frozenset()) -> bool:
        if fn in seen or fn not in calls:
            return False
        direct = calls[fn]
        if target in direct:
            return True
        return any(
            reaches(h, target, seen | {fn})
            for h in direct
            if h in calls and h != fn
        )

    queries = [n for n in calls if n.startswith("q_")]
    missing: list[tuple[str, str]] = []
    for b in builders:
        derived = {q for q in queries if reaches(q, b)}
        for q in sorted(derived - declared[b]):
            missing.append((b, q))
    assert not missing, (
        "bench.py _staging_builders consumer sets are missing real "
        f"call-site consumers: {missing}"
    )
