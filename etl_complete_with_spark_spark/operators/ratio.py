"""Exact cross-engine rounding of integer-count ratios.

The r14 sf1.0 sweep proved that ``round(p/q, k)`` on a double diverges
between Spark and DuckDB whenever the true ratio sits EXACTLY on a
half-ULP-of-10^-k boundary and the nearest double falls below it: Spark
rounds HALF_UP on the shortest decimal repr of the double ("0.07125" ->
0.0713) while DuckDB rounds the binary value (slightly under the tie ->
0.0712). 573 of 1.5M cume_dist rows diverged at n=1.5e6; a brute-force
scan finds small-count cases too (57/800 — a perfectly plausible
Jaccard union — diverges in the real engines). Policy (SCALING.md r14):
any round(ratio-of-integers, k) that feeds a cross-engine hash must
round in integer space.

``round_half_up(p/q, d)`` == ``(2*10^d*p + q) div (2*q)`` exactly, ties
toward +infinity. The Column form never trusts a double: the numerator
``a = 2*10^d*p + q`` stays in LONG (ANSI raises loudly past 2^63 — at
d=2 that admits p up to ~4.6e16, e.g. the sum of per-user second deltas
over ~1e9 users), the remainder is removed with pmod so the division's
true quotient is an exact integer, and THAT division runs in
decimal(38,0), where an integer quotient is produced exactly at any
magnitude (a raw decimal division would HALF_UP at result scale and
could cross the floor for near-1 fractions; dividing an exact multiple
sidesteps it). The SQL twin runs the same arithmetic in BIGINT/HUGEINT,
with the numerator's remainder stripped via the non-negative-mod trick
``a - ((a % b + b) % b)`` before the ``//`` — DuckDB ``//`` truncates
toward zero, which only equals floor for non-negative numerators, and
the r14 twin relied on exactly that (r15, per VERDICT order 6 /
ADVICE): a signed ratio (e.g. a delta average without its ``>= 0``
filter) would silently diverge from the Column form's pmod floor. Both
forms now floor for ANY sign of p; the denominator q must still be
POSITIVE (q = 0 raises in both engines; a negative q flips both mod
conventions and stays out of contract — every caller passes a count or
a count-difference filtered non-negative). The final t/10^d double
report is exact while t = round(p/q * 10^d) < 2^53 — an output-type
limit shared with every double column (see queries.sum_money).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_ratio(p: Column, q: Column, digits: int = 4) -> Column:
    """round-half-up(p/q, digits) for integer p and POSITIVE integer q,
    bit-identical across engines (twin: :func:`round_ratio_sql`).
    Sign-safe in p: ``F.pmod`` returns the non-negative residue for
    positive divisors, so ``(a - pmod(a, b)) / b`` is floor(a/b) for
    any-sign a."""
    s = 10**digits
    a = p.cast("long") * (2 * s) + q.cast("long")
    b = q.cast("long") * 2
    t = ((a - F.pmod(a, b)).cast("decimal(38,0)") / b).cast("long")
    return t / float(s)


def round_ratio_sql(p_sql: str, q_sql: str, digits: int = 4) -> str:
    """DuckDB twin of :func:`round_ratio` (integer floor-div, exact).
    Floors for any-sign numerator via the non-negative-mod trick
    (``a - ((a % b + b) % b)``) — plain ``//`` truncates toward zero
    in DuckDB and would diverge from the Column form's pmod floor the
    first time a caller passed a signed p (VERDICT r14 order 6). The
    numerator expression is evaluated three times; every current
    caller passes column references or cheap arithmetic, and DuckDB's
    CSE collapses the repeats."""
    s = 10**digits
    a = f"({2 * s} * ({p_sql}) + ({q_sql}))"
    b = f"(2 * ({q_sql}))"
    return (
        f"(CAST(({a} - ((({a}) % ({b}) + ({b})) % ({b}))) // ({b})"
        f" AS DOUBLE) / {s}.0)"
    )
