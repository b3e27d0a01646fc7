package graft.functions

/** The house fixed-point base-2 log grade, shared by every op that needs
  * a monotone, engine-replayable stand-in for a transcendental log:
  * BM25's idf (`pipeline.Search`), word entropy and the naive-Bayes
  * log-probabilities (`pipeline.TextAnalysis`), and Kaplan-Meier's
  * negative log survival (`pipeline.TimeSeries`).
  *
  * Definition (integer arithmetic only, `bl = bitlen(x) = ⌊log2 x⌋ + 1`):
  *
  * {{{ lg64(x) = 64·bl + (x·64) DIV 2^(bl−1) − 64   for x ≥ 1 }}}
  *
  * i.e. 64 units per octave plus the leading SEVEN bits of x as a 6-bit
  * linear mantissa — the classic "characteristic + truncated mantissa"
  * fixed-point log.
  *
  * Contract (spec-pinned in `Lg64Spec`):
  *  - EXACT at powers of two: `lg64(2^k) = 64·(k+1)`.
  *  - Approximation: `lg64(x)` tracks `64·(log2 x + 1)` from BELOW
  *    within 7 units (the linear mantissa is the chord under concave
  *    log2 — max gap ~0.086 octaves ≈ 5.5 units — minus < 1 of floor
  *    error; never above) — precise enough that rankings agree with a
  *    real log beyond ~1.1% ratios.
  *  - Monotonicity: non-decreasing everywhere on x ≥ 1; STRICTLY
  *    increasing once the ratio x₂/x₁ reaches 1 + 1/64 ≈ 1.0156 — the
  *    widest plateau sits at the BOTTOM of each octave, where one
  *    mantissa unit spans x/64 of linear range (near the octave top
  *    the step tightens toward 2^(1/64) ≈ 1.011; 1/64-of-an-octave is
  *    the RESOLUTION, 1/64-of-x the worst-case tie width).
  *  - Differences `lg64(a) − lg64(b)` are therefore a monotone integer
  *    log-ratio grade — the form every call site actually consumes.
  *  - Domain: 1 ≤ x < 2^57 (the `x·64` product must fit a signed 64-bit
  *    long — Spark ANSI mode throws on overflow, spec-pinned at the
  *    boundary; every call site feeds counts, far below). x = 0 reads 0
  *    by the arithmetic (`bin(0)` has length 1); negative x is UNDEFINED
  *    (two's-complement bitlength) and must not reach this expression.
  *
  * Why SQL text rather than a Column: every caller embeds the grade
  * inside a larger single-`expr` integer formula (sums of products with
  * DIV), which keeps the whole thing one codegen'd projection; `$x` is
  * spliced (and therefore re-evaluated) three times, so pass a CHEAP
  * operand — a column reference or a small integer expression, never a
  * subquery. The same text replays verbatim in DuckDB oracles (`DIV` →
  * `//`, `shiftleft` → `<<`, `length(bin())` → `bit_length`-style
  * rewrites are handled by each oracle's mirror). */
object Lg64 {
  def sql(x: String): String =
    s"(64L * CAST(length(bin($x)) AS BIGINT) + (($x) * 64L) DIV shiftleft(1L, CAST(length(bin($x)) AS INT) - 1) - 64L)"
}
