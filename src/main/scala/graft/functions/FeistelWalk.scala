package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The q222 epoch-shuffle permutation as ONE native codegen expression:
  * pos = cycle-walked 4-round unbalanced Feistel over [0, 2^m), walked
  * back into [0, n) (Luby–Rackoff; Black & Rogaway CT-RSA'02). The walk
  * is a genuine per-row LOOP — unrolling it as 48 stacked projections
  * costs seconds of pure Catalyst analysis/optimization per run (an A/B
  * measured 4.6 s via lateral-alias selectExpr steps, and a naive
  * Column-composition build exploded CollapseProject into a 6.9 MiB
  * task binary), while this expression keeps the plan O(1) and the loop
  * in generated Java. The DuckDB oracle replays the SAME arithmetic as
  * 48 unrolled lateral-alias CTEs (Curation.epochShuffleSql shares the
  * constants below), so a green q222 row certifies kernel ≡ unroll.
  *
  * `n` (domain size) and `m` (domain bits) are plan-time literals —
  * model-sized driver state, like the BPE merge literals. All kernel
  * arithmetic is non-negative, so `& mask` ≡ `% 2^k` and `>>> k` ≡
  * `div 2^k` — the exact ops the oracle's `%` / `//` compute.
  */
case class FeistelWalk(idx: Expression, epoch: Expression, n: Long, m: Int)
    extends BinaryExpression {

  override def left: Expression = idx
  override def right: Expression = epoch

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_feistel_walk"

  override protected def nullSafeEval(i: Any, e: Any): Any =
    FeistelWalkKernel.walk(i.asInstanceOf[Long], e.asInstanceOf[Long], n, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, e) =>
      s"${ev.value} = graft.functions.FeistelWalkKernel$$.MODULE$$" +
        s".walk($i, $e, ${n}L, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FeistelWalk =
    copy(idx = newLeft, epoch = newRight)
}

object FeistelWalkKernel {
  /** Cycle-walk budget: the chance ANY of n elements needs more than k
    * applications is < n·2^-k (each application escapes the padding
    * [n, 2^m) with probability > 1/2 since 2^m < 2n) — 48 covers 10^10
    * chunks (100 TB at 2k tokens/chunk) with < 4·10^-5 to spare, and an
    * exceedance FAILS LOUDLY instead of emitting a non-position. */
  val Steps = 48

  // a fourth multiplicative-hash family (offsets 1009·epoch + 7919·round)
  // — same engine-portable arithmetic as q87/q126/q148: all operands
  // non-negative, products < 2^52, so the oracle's BIGINT math is exact
  val P = 1000003L
  val Mult = 2654435761L
  val Mod = 1048573L

  def walk(idx: Long, epoch: Long, n: Long, m: Int): Long = {
    val hb = m / 2
    val maskR = (1L << hb) - 1
    val shift = m - hb
    val maskL = (1L << shift) - 1
    def f4(x0: Long): Long = {
      var x = x0
      var r = 1
      while (r <= 4) {
        val rr = x & maskR
        val ll = x >>> hb
        val f = (((rr + epoch * 1009L + r * 7919L) % P) * Mult % Mod) & maskL
        x = (rr << shift) + (ll ^ f)
        r += 1
      }
      x
    }
    var c = f4(idx)
    var s = 1
    while (c >= n && s < Steps) { c = f4(c); s += 1 }
    if (c >= n)
      throw new IllegalStateException(
        s"epoch shuffle: cycle walk exceeded $Steps steps (n=$n, m=$m)")
    c
  }
}
