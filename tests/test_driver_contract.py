"""Driver-contract guard: every queries() entry executes at sf0.001
and has an oracle twin; entry() smoke-checks. Catches a broken entry
before the driver's gate does."""

from __future__ import annotations

import __spark_entry__ as E
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    assert len(E.entry(spark).collect()) > 0


def test_registry_floor():
    """Regression floor: the registry only grows and stays structurally
    in sync with its oracles (same assert the local gate runs)."""
    import sys

    sys.path.insert(0, "tools")
    from tools.check_oracle import check_registry

    check_registry(E)


def test_every_query_executes_and_has_oracle(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    assert missing == [], f"queries without oracle_sql twins: {missing}"
    failures = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
            assert df.columns  # stable, non-empty schema
            df.count()
        except Exception as e:  # pragma: no cover
            failures[name] = repr(e)[:200]
    assert failures == {}
