"""The bench panel (VERDICT r10 task 4) is the round-over-round
comparable number — it is only comparable if it never changes. Pin the
exact membership: additions/removals must be a deliberate, reviewed
edit of BOTH bench.py and this hash."""

import hashlib

from bench import HEADLINE, PANEL
from finance_reporting_etl_spark.queries import CATALOG

# sha256 of the newline-joined panel in its pinned order.
_PANEL_SHA = "4bb647f38cefc33f474c351ebf1546998f057cdeb819ad99c06dc67cff6d5524"


def test_panel_is_pinned():
    got = hashlib.sha256("\n".join(PANEL).encode()).hexdigest()
    assert got == _PANEL_SHA, (
        "bench PANEL changed — panel_total_sec is no longer comparable "
        "to prior rounds. If intentional, update _PANEL_SHA here and "
        "note the break in BENCH_DETAIL notes."
    )


def test_panel_is_valid():
    assert len(PANEL) == len(set(PANEL))
    assert set(PANEL) <= set(HEADLINE)
    assert set(HEADLINE) <= set(CATALOG)
