"""The driver-visibility rotation window is TOOL-GENERATED and these
tests pin the committed list to the tool's output — the r12 window
shipped with wrong arithmetic in its hand-authored header (caught by
r13 ADVICE), which is exactly the class of error a mechanical ledger
removes."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.rotation import (  # noqa: E402
    MAX_STALENESS,
    STALENESS4_OK,
    WINDOW,
    audit,
    generate_front,
    last_seen_rounds,
)


def _fixture():
    from scholarmind_spark.queries import (
        _ROUND15_FRONT,
        _WINDOW_BASIS_ROUND,
        SPARK_QUERIES,
    )

    registered = list(SPARK_QUERIES)
    seen = last_seen_rounds(upto=_WINDOW_BASIS_ROUND)
    return registered, seen, _WINDOW_BASIS_ROUND + 1, _ROUND15_FRONT


def test_committed_window_is_tool_generated():
    registered, seen, target, committed = _fixture()
    assert generate_front(registered, seen, target) == committed


def test_window_leads_queries_and_oracle_dicts():
    from scholarmind_spark.queries import ORACLE_SQL, SPARK_QUERIES

    registered, seen, target, committed = _fixture()
    assert list(SPARK_QUERIES)[: len(committed)] == committed
    # oracle dict is rotated identically (keys it has, in window order)
    with_oracle = [g for g in committed if g in ORACLE_SQL]
    assert list(ORACLE_SQL)[: len(with_oracle)] == with_oracle


def test_staleness_invariant_holds():
    """After this window runs, no gate is staler than the contract
    allows (3, or 4 for the named allowance once the registry crosses
    the pigeonhole bound) — audit() asserts internally."""
    registered, seen, target, committed = _fixture()
    lines = audit(registered, seen, committed, target)
    assert lines  # a ledger was produced
    # every mandatory gate (would cross staleness 3) made the window
    mandatory = {
        g
        for g in registered
        if g in seen
        and target - seen[g] > MAX_STALENESS
        and g not in STALENESS4_OK
    }
    assert mandatory <= set(committed[:WINDOW])


def test_new_gates_lead_the_window():
    registered, seen, target, committed = _fixture()
    new = sorted(g for g in registered if g not in seen)
    assert committed[: len(new)] == new


def test_staleness4_allowance_names_registered_gates():
    """Every STALENESS4_OK entry must name a registered gate — the
    allowance is a semantic-redundancy claim about a real gate, and a
    renamed/removed gate must not leave a stale allowance behind."""
    from scholarmind_spark.queries import SPARK_QUERIES

    assert set(STALENESS4_OK) <= set(SPARK_QUERIES)
    # allowance stays deliberate: entries are unique and sorted-stable
    assert len(STALENESS4_OK) == len(set(STALENESS4_OK))
