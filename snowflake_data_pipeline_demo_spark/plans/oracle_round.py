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
Measured: 18 divergences on the original 381-case adversarial
midpoint probe corpus, plus the signed-zero channel (-0.0 for inputs
in (-5e-5, 0)) that caused the three r07 hash fails.

Both channels close if the oracle replicates Spark's semantics, which
DuckDB can express. The emitted macro is a guarded CASE (guards from
the r08 pass-3 review — the bare macro CRASHED on NaN/inf/1e15 where
both engines' plain rounds pass them through):

    CASE WHEN NOT isfinite(CAST((x) AS DOUBLE))
              THEN CAST((x) AS DOUBLE)            -- Spark: NaN/inf pass through
         WHEN abs(CAST((x) AS DOUBLE)) < 1e-7
              THEN 0.0                            -- below any s<=6 midpoint
         WHEN abs(CAST((x) AS DOUBLE)) < 1e13
              THEN CAST(round(CAST(CAST((x) AS VARCHAR)
                   AS DECIMAL(38,24)), s) AS DOUBLE) + 0
         WHEN abs(CAST((x) AS DOUBLE)) < 1e16
              THEN CAST(CAST(round(CAST(CAST((x) AS VARCHAR)
                   AS DECIMAL(38,22)), s) AS VARCHAR) AS DOUBLE) + 0
         ELSE CAST((x) AS DOUBLE) + 0 END         -- |x|>=1e16: see below

- ``CAST(x AS VARCHAR)`` is DuckDB's shortest-round-trip rendering —
  the same string ``Double.toString`` produces;
- ``DECIMAL(38,24)`` holds that string EXACTLY across its branch's
  whole domain: shortest reprs carry <= 17 significant digits, so
  |x| in [1e-7, 1e13) needs <= 24 fractional and <= 13 integer
  digits. A smaller scale is WRONG — DECIMAL(30,15) re-rounds the
  string at scale 15 and manufactured 88 new midpoint divergences in
  the same corpus;
- the ``DECIMAL(38,22)`` branch extends exactness over [1e13, 1e16):
  <= 16 integer digits and (17 sig digits - >= 14 integer digits) <= 3
  fractional digits fit 38,22 exactly. Added r09 (ADVICE): without it
  the identity ELSE silently assumed |values| < 1e13 for s < 4 —
  10000000000000.5 is a representable double whose s=0 HALF_UP round
  is 10000000000001, not itself. This branch routes its result back
  through VARCHAR (``CAST(CAST(round(...) AS VARCHAR) AS DOUBLE)``)
  because the direct decimal->double cast is 1-ULP LOSSY at these
  magnitudes (measured: 259-1419 divergences per 40k draws — the
  int128 payload rounds to double BEFORE the power-of-ten scaling,
  two roundings instead of one), while decimal->varchar->double is a
  single correctly-rounded string conversion (0 divergences across
  all scales 0-6 on the same draws). The |x| < 1e13 branch keeps the
  direct cast: verified bit-exact on its own domain (500k+ cases),
  and churn there would invalidate that verification for no defect;
- the |x| >= 1e16 identity branch is EXACT for EVERY s in [0, 6]:
  above 2^53 ~ 9.007e15 all doubles are integers, their shortest
  reprs carry no fractional digits, and BigDecimal quantize at any
  non-negative scale changes nothing;
- decimal ``round`` is HALF_UP (away from zero), matching BigDecimal;
- ``+ 0`` normalizes the signed zero the decimal->double cast could
  reintroduce;
- supported scales are 0..6 (the tiny-branch 0.0 needs the smallest
  midpoint 0.5*10^-s above 1e-7). An out-of-range scale is left
  UNREWRITTEN, which test_registered_oracles_conform then flags
  loudly — extending the envelope is a deliberate act, not a default.

The macro interpolates {e} several times (the guards plus the rounded
payloads), so a rounded expression MUST be deterministic — a
``random()`` inside ``round()`` would take different branches than it
rounds. :func:`spark_round_oracle` enforces this at registration
(raises on known non-deterministic functions inside a rounded
expression). The re-evaluation is also a per-row COST multiplier for
expressions carrying scalar subqueries; acceptable for sf0.01 oracle
runs (DuckDB), never on the Spark side (the macro exists only in
oracle SQL).

Verified bit-for-bit against the Decimal-string reference on 500k+
cases (midpoint corpus + uniform draws over [-1,1], [-1e-4,1e-4],
[-1e6,1e6]) and the reference verified against REAL PySpark
``F.round`` on 40k+ cases — 0 divergences both
(tests/test_oracle_parity.py::TestRoundConformance pins every leg).
Applied mechanically to every ``round(expr, s)`` in oracle SQL by
:func:`spark_round_oracle` at ``@query`` registration, so a lane
author writes plain ``round`` and conformance is not a per-site
diligence item. The rewrite is IDEMPOTENT (an already-emitted macro's
inner ``round(CAST(CAST((`` is recognized and skipped), so composed
oracles that interpolate another lane's registered ``.oracle`` text
are wrapped exactly once.
"""
from __future__ import annotations

import re

#: the guarded house macro — see module docstring for why every piece
#: matters. {e} = the expression, {s} = the integer scale.
_TMPL = (
    "CASE WHEN NOT isfinite(CAST(({e}) AS DOUBLE)) "
    "THEN CAST(({e}) AS DOUBLE) "
    "WHEN abs(CAST(({e}) AS DOUBLE)) < 1e-7 THEN 0.0 "
    "WHEN abs(CAST(({e}) AS DOUBLE)) < 1e13 "
    "THEN CAST(round(CAST(CAST(({e}) AS VARCHAR) AS DECIMAL(38,24)), "
    "{s}) AS DOUBLE) + 0 "
    "WHEN abs(CAST(({e}) AS DOUBLE)) < 1e16 "
    "THEN CAST(CAST(round(CAST(CAST(({e}) AS VARCHAR) AS "
    "DECIMAL(38,22)), {s}) AS VARCHAR) AS DOUBLE) + 0 "
    "ELSE CAST(({e}) AS DOUBLE) + 0 END"
)

#: function names whose appearance inside a ROUNDED expression makes
#: the macro's multi-interpolation unsound (different evaluations ->
#: inconsistent guard vs payload). Registration fails loudly instead.
_NONDETERMINISTIC = re.compile(
    r"(?<![\w.])(random|uuid|gen_random_uuid|now|current_timestamp|"
    r"current_time|current_date|today|get_current_timestamp)\s*(\(|\b)",
    re.IGNORECASE,
)

#: text that immediately follows ``round(`` in macro output — the
#: idempotence signature
_MACRO_SIG = "CAST(CAST(("

_ROUND = re.compile(r"(?<![\w.])round\s*\(", re.IGNORECASE)
_INT = re.compile(r"-?\d+\Z")

_MAX_SCALE = 6


def strip_noncode(sql: str) -> str:
    """Replace every character inside a single-quoted SQL string
    literal ('' escapes), a double-quoted identifier ("" escapes), a
    ``--``-to-end-of-line comment, or a ``/* */`` block comment with a
    space, preserving length and newlines. Both the rewriter and the
    conformance test operate on this projection, so a ``--`` or a
    paren INSIDE a literal/identifier/comment can neither hide a
    ``round(`` from the rewrite nor corrupt the paren scan (r08 pass-3
    review: the first cut's line-regex comment stripper treated
    '--sep' in a literal as a comment, silently exempting everything
    after it on the line; r09 ADVICE: block comments and quoted
    identifiers had the same hole). Block comments here do not nest —
    matching DuckDB's lexer, where ``/* /* */`` closes at the first
    ``*/``."""
    out = list(sql)
    i, n = 0, len(sql)
    in_str = in_ident = False
    while i < n:
        c = sql[i]
        if in_str or in_ident:
            q = "'" if in_str else '"'
            if c == q:
                if i + 1 < n and sql[i + 1] == q:  # ''/"" escape
                    out[i] = out[i + 1] = " "
                    i += 2
                    continue
                in_str = in_ident = False
            elif c != "\n":
                out[i] = " "
        elif c == "'":
            in_str = True
        elif c == '"':
            in_ident = True
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
            continue
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            end = n if j < 0 else j + 2  # unterminated -> to EOF
            while i < end:
                if sql[i] != "\n":
                    out[i] = " "
                i += 1
            continue
        i += 1
    return "".join(out)


def spark_round_oracle(sql: str) -> str:
    """Rewrite every ``round(expr[, s])`` in oracle SQL to the
    Spark-semantics macro (module docstring), recursing into ``expr``
    so nested rounds conform too. Skips: occurrences inside string
    literals or ``--`` comments, already-rewritten macros (idempotent
    — safe for composed oracles), unbalanced fragments, non-integer-
    literal scales, and scales outside [0, 6] (the conformance test
    then flags the surviving bare round loudly). Raises ValueError on
    a known non-deterministic function inside a rounded expression —
    the macro multi-evaluates {e}, so such an oracle would be silently
    flaky (r09 ADVICE)."""
    code = strip_noncode(sql)
    out: list[str] = []
    i, n = 0, len(sql)
    while True:
        m = _ROUND.search(code, i)
        if not m:
            out.append(sql[i:])
            break
        p = m.end()            # index just past '('
        if code[p:p + len(_MACRO_SIG)] == _MACRO_SIG:
            # already the macro (composed oracle) — copy through
            out.append(sql[i:p])
            i = p
            continue
        depth, j, last_comma = 1, p, None
        while j < n and depth:
            c = code[j]        # literal/comment chars are spaces here
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
            # expr slices the ORIGINAL text (literals must survive);
            # scale slices the code projection so a comment between
            # the comma and the integer doesn't block the parse
            expr, scale = sql[p:last_comma], code[last_comma + 1:inner_end]
        scale = scale.strip()
        if not _INT.match(scale) or not (0 <= int(scale) <= _MAX_SCALE):
            out.append(sql[i:j])
            i = j
            continue
        nd = _NONDETERMINISTIC.search(
            code[p:last_comma if last_comma is not None else inner_end]
        )
        if nd:
            # the macro evaluates the expression once per guard plus
            # once per payload — a non-deterministic expr would take
            # different branches than it rounds. Fail at registration,
            # not with a silently-flaky oracle.
            raise ValueError(
                f"round() over a non-deterministic expression "
                f"({nd.group(1)}) cannot be rewritten to the "
                f"multi-evaluation conformance macro: ...{expr.strip()[:80]}..."
            )
        out.append(sql[i:m.start()])
        out.append(_TMPL.format(e=spark_round_oracle(expr.strip()),
                                s=scale))
        i = j
    return "".join(out)
