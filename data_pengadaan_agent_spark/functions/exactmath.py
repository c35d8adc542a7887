"""Exact integer arithmetic beyond int64 — the DECIMAL(38,0) idioms.

The repo's determinism discipline keeps scores and ratios in exact
integer arithmetic so DuckDB twins reproduce them bit-for-bit. Plain
BIGINT runs out of headroom at target scale (a 100 TB text corpus is
~2e13 tokens; n_total * 1_000_000 already exceeds int64), and the two
obvious Spark escapes are both WRONG (probed live, round 14):

- ``a DIV b`` on DECIMAL operands silently wraps to LongType —
  9.2e24 DIV 7 returned −7907477943847822483 even under ANSI mode;
- ``FLOOR(a / b)`` mis-rounds: decimal division rounds HALF_UP at
  result scale (min 6), so a true quotient within 5e-7 below an
  integer floors to the NEXT integer (5999999/3000000 -> 2, not 1).

``(a - a % b) / b`` is the exact form: the remainder subtraction
makes the true quotient an integer, so the scale-6 rounding of the
division is exact, and the final CAST to DECIMAL(38,0) is lossless
for quotients up to 38 digits. DuckDB's ``//`` on HUGEINT needs no
such dance — twins just widen the operands.
"""

from __future__ import annotations


def dec_idiv_sql(num_sql: str, den_sql: str) -> str:
    """SQL-expression string for exact ``num DIV den`` computed in
    DECIMAL(38,0) — see module docstring for why neither ``DIV`` nor
    ``FLOOR(/)`` can be used on decimals. Truncates toward zero for
    ANY sign combination, exactly like integral DIV and DuckDB's
    ``//`` (Spark's ``%`` is the truncated remainder, so the
    subtraction lands on the toward-zero multiple; all four sign
    cases probed live r14). The numerator is evaluated twice
    textually, which Catalyst common-subexpression collapses."""
    a = f"CAST({num_sql} AS DECIMAL(38,0))"
    b = f"CAST({den_sql} AS DECIMAL(38,0))"
    return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS DECIMAL(38,0))"


def dec_to_bigint_sql(expr_sql: str, label: str) -> str:
    """SQL-expression string narrowing an exact DECIMAL(38,0) value
    back to BIGINT at a query's OUTPUT edge, raising loudly (never
    wrapping, never silently nulling — a plain non-ANSI CAST nulls on
    overflow) when the value leaves int64.

    Why this exists (r15, driver-gate fix): DECIMAL(38,0) output
    columns hash-diverge between the driver's Spark and DuckDB
    collection paths even when both engines compute identical integer
    values (token_rarity / tfidf_top_terms, red since the widening in
    1eac05a despite the Arrow-canonical replica passing). Integer
    results therefore stay DECIMAL(38,0) only INSIDE the plan, where
    the headroom matters, and cross the output edge as BIGINT. The
    guard keeps the overflow loud: at the design envelope the guarded
    values fit int64 for any corpus below ~9.2e12 docs/tokens, and a
    corpus past that must fail the query, not emit wrapped garbage.
    Boundary values (±int64 max/min) cast exactly — probed live r15.
    """
    e = f"CAST({expr_sql} AS DECIMAL(38,0))"
    return (
        f"CASE WHEN ({e}) > CAST(9223372036854775807 AS DECIMAL(38,0)) "
        f"OR ({e}) < CAST(-9223372036854775808 AS DECIMAL(38,0)) "
        f"THEN CAST(raise_error('{label}: DECIMAL(38,0) value exceeds "
        f"BIGINT output range') AS BIGINT) "
        f"ELSE CAST(({e}) AS BIGINT) END"
    )
