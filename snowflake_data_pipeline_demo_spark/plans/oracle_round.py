"""Cross-engine rounding conformance for DuckDB oracle SQL.

Discovery (r08, measured): Spark's ``F.round(x, s)`` on DOUBLE rounds
the SHORTEST DECIMAL STRING of the value — ``BigDecimal.valueOf``
goes through ``Double.toString`` — HALF_UP, then back to double (and
BigDecimal has no signed zero, so -0.0 never escapes). DuckDB's
``round(x, s)`` rounds the SCALED BINARY value. The two agree on
virtually all doubles (0 divergences in 600k random draws across
three magnitude bands) but DIVERGE on every double whose shortest
decimal representation lands exactly on an ``s``-dp midpoint: for
``x = 0.00015`` (one double, reachable EXACTLY as the ratio 3/20000),
``0.00015 * 1e4 = 1.4999999999999998`` in binary so DuckDB emits
0.0001, while Spark rounds the string "0.00015" HALF_UP to 0.0002.
Measured on a 381-case adversarial midpoint corpus: 18 divergences
with plain ``round``, plus the signed-zero channel (-0.0 for inputs
in (-5e-5, 0)) that caused the three r07 hash fails.

Both channels close if the oracle replicates Spark's semantics
exactly, which DuckDB can express:

    CAST(round(CAST(CAST((x) AS VARCHAR) AS DECIMAL(38,24)), s)
         AS DOUBLE) + 0

- ``CAST(x AS VARCHAR)`` is DuckDB's shortest-round-trip rendering —
  the same string ``Double.toString`` produces;
- ``DECIMAL(38,24)`` holds that string exactly (17 significant digits
  max, |x| < 1e14 — far above any lane's rounded output) — a smaller
  scale is WRONG: DECIMAL(30,15) re-rounds the string at scale 15 and
  manufactured 88 new midpoint divergences in the same corpus;
- decimal ``round`` is HALF_UP (away from zero), matching BigDecimal;
- ``+ 0`` normalizes the signed zero DuckDB's decimal->double cast
  could reintroduce.

Verified bit-for-bit against the Decimal-string reference on 500,384
cases (midpoint corpus + uniform draws over [-1,1], [-1e-4,1e-4],
[-1e6,1e6]) and the reference verified against REAL PySpark
``F.round`` on 40,384 cases — 0 divergences both
(tests/test_oracle_parity.py::TestRoundConformance pins all three
legs). Applied mechanically to every ``round(expr, s)`` in oracle SQL
by :func:`spark_round_oracle` at ``@query`` registration, so a lane
author writes plain ``round`` and conformance is not a per-site
diligence item.
"""
from __future__ import annotations

import re

#: the house macro — see module docstring for why every piece matters
_TMPL = ("CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,24)), "
         "{scale}) AS DOUBLE) + 0")

_ROUND = re.compile(r"(?<![\w.])round\s*\(", re.IGNORECASE)
_INT = re.compile(r"-?\d+\Z")


def _comment_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of ``--``-to-end-of-line SQL comments."""
    spans = []
    for m in re.finditer(r"--[^\n]*", sql):
        spans.append((m.start(), m.end()))
    return spans


def spark_round_oracle(sql: str) -> str:
    """Rewrite every ``round(expr[, s])`` in oracle SQL to the
    Spark-semantics macro (module docstring), recursing into ``expr``
    so nested rounds conform too. Leaves untouched: occurrences inside
    ``--`` comments (an unbalanced comment fragment could otherwise
    swallow real SQL into the match), occurrences whose parens don't
    balance, and those whose scale argument isn't an integer literal.
    Apply ONCE, at ``@query`` registration."""
    comments = _comment_spans(sql)

    def in_comment(pos: int) -> bool:
        return any(s <= pos < e for s, e in comments)

    out: list[str] = []
    i, n = 0, len(sql)
    while True:
        m = _ROUND.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        if in_comment(m.start()):
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        p = m.end()            # index just past '('
        depth, j, last_comma = 1, p, None
        while j < n and depth:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                last_comma = j
            j += 1
        if depth:              # unbalanced — inert fragment, skip it
            out.append(sql[i:p])
            i = p
            continue
        inner_end = j - 1
        if last_comma is None:
            expr, scale = sql[p:inner_end], "0"
        else:
            expr, scale = sql[p:last_comma], sql[last_comma + 1:inner_end]
        scale = scale.strip()
        if not _INT.match(scale):
            out.append(sql[i:j])
            i = j
            continue
        out.append(sql[i:m.start()])
        out.append(_TMPL.format(expr=spark_round_oracle(expr.strip()),
                                scale=scale))
        i = j
    return "".join(out)
