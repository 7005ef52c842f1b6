"""AST lint for the det_round emission rule (PLANS.md #48).

``det_round`` textually references its input 4-5 times (``floor(x*10^n
+ 0.5)/10^n`` with a sign split), so wrapping it around an EXPENSIVE
expression defeats whole-stage-codegen common-subexpression
elimination and re-evaluates the input several times per row. Round 9
measured the failure mode directly: nesting det_round around
regexp-heavy quality-score ratios took ``corpus_training_pipeline``
from 3.3 s to 10.2 s at sf0.1 (fixed in-round: 3.8 s).

RULE (PLANS.md #48): det_round is for EMITTED columns only — its input
must be cheap (a column reference, an arithmetic combination of
references, or an exact-int division). Never nest det_round inside
another det_round, and never apply it directly over per-row
string-machinery calls (``regexp_*``, ``split``, ``transform``,
``aggregate``, ``filter``, ``exists``, ``zip_with``) — materialize
those in a prior projection first, then round the materialized column
at emission.

This test AST-scans every non-test source file in the package and
fails with the rule text on violations, so the class of regression can
never be reintroduced silently.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "finance_reporting_etl_spark"

# Calls that are expensive per-row (string machinery / higher-order
# array lambdas): rounding directly over these defeats codegen CSE.
EXPENSIVE_CALLS = {
    "regexp_replace",
    "regexp_extract",
    "regexp_extract_all",
    "regexp_count",
    "regexp_like",
    "rlike",
    "split",
    "transform",
    "aggregate",
    "filter",
    "exists",
    "zip_with",
    "array_sort",
    "sentences",
}

ROUND_FNS = {"det_round"}


def _call_name(node: ast.AST) -> str | None:
    """Dotted-call tail: F.regexp_replace(...) -> 'regexp_replace'."""
    if isinstance(node, ast.Call):
        f = node.func
        if isinstance(f, ast.Attribute):
            return f.attr
        if isinstance(f, ast.Name):
            return f.id
    return None


def _violations_in(path: pathlib.Path) -> list[str]:
    tree = ast.parse(path.read_text(), filename=str(path))
    bad: list[str] = []
    for node in ast.walk(tree):
        name = _call_name(node)
        if name not in ROUND_FNS or not node.args:
            continue
        # inspect the value argument's subtree (arg 0)
        for inner in ast.walk(node.args[0]):
            iname = _call_name(inner)
            if iname in ROUND_FNS:
                bad.append(
                    f"{path.name}:{node.lineno}: det_round nested inside "
                    f"det_round"
                )
                break
            if iname in EXPENSIVE_CALLS:
                bad.append(
                    f"{path.name}:{node.lineno}: det_round applied over "
                    f"expensive call '{iname}'"
                )
                break
    return bad


def test_det_round_only_at_emission_over_cheap_inputs():
    bad: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        bad.extend(_violations_in(path))
    assert not bad, (
        "det_round emission rule violated (PLANS.md #48: det_round is "
        "for EMITTED columns; never nest it, keep its input cheap — "
        "materialize expensive inputs in a prior projection first):\n"
        + "\n".join(bad)
    )
