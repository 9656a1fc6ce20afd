"""Hash-signal strength guard for the driver's correctness gate.

VERDICT r11 #1/#3: q16's gate row had compared empty-to-empty since r5 —
the sf0.01 data contained zero customers without orders, so the row's
rows+schema+hash check pinned NOTHING and any empty frame with the right
schema passed. This module makes that failure mode a committed property:
every gated query must return AT LEAST ONE ROW at the gate SF (sf0.01),
with an explicit allowlist for any query whose zero output is ever
intentional (none today). A fixture regeneration or query redefinition
that silently hollows a gate row now fails the suite instead of shipping
a vacuous green.

This is the heavyweight companion to tests/test_relational.py's per-query
oracle match (which runs at the suite SF, default sf0.001): here only the
Spark side runs, but at the driver's actual gate SF.
"""

from __future__ import annotations

import os

import pytest

from score_spark.queries import QUERIES

GATE_SF_DIR = os.environ.get("SCORE_SPARK_GATE_SF_DIR", "/root/testdata/sf0.01")

# Queries whose empty output at the gate SF would be intentional. Empty by
# design — adding a name here requires a comment justifying why a 0-row
# result still pins real computation (see VERDICT r11 #1 for why it usually
# does not).
ZERO_ROWS_ALLOWED: frozenset[str] = frozenset()


@pytest.mark.skipif(
    not os.path.isdir(GATE_SF_DIR), reason=f"gate SF data not present: {GATE_SF_DIR}"
)
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_gated_query_nonzero_rows_at_gate_sf(name, spark):
    if name in ZERO_ROWS_ALLOWED:
        pytest.skip(f"{name} is allowlisted as intentionally zero-row")
    n = QUERIES[name](spark, GATE_SF_DIR).count()
    assert n > 0, (
        f"{name} returned 0 rows at the gate SF ({GATE_SF_DIR}) — its "
        "correctness row is vacuous: rows/schema/hash all match trivially "
        "on empty output. Redefine the query so the interesting path is "
        "exercised at the gate SF, or allowlist it with a justification."
    )


def test_hash_pins_audit_covers_registry_exactly():
    """VERDICT r11 #3: every gate row carries a committed one-sentence claim
    of what its value hash pins. A new gated query without an audit
    sentence — or a stale sentence for a removed query — fails here."""
    from score_spark.queries.signal import HASH_PINS

    assert set(HASH_PINS) == set(QUERIES), (
        sorted(set(QUERIES) - set(HASH_PINS)),
        sorted(set(HASH_PINS) - set(QUERIES)),
    )
    for name, sentence in HASH_PINS.items():
        assert len(sentence) >= 60, f"{name}: audit sentence too thin to pin anything"
