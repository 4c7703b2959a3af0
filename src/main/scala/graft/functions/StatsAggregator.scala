package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator-based statistics summary. */
final case class StatsBuf(n: Long, mean: Double, m2: Double, min: Double, max: Double)

/** `variance` is sample variance (n−1 denominator) and is None — surfaced
  * as SQL NULL — when n < 2, matching VAR_SAMP semantics in Spark/DuckDB. */
final case class StatsResult(n: Long, mean: Double, variance: Option[Double], min: Double, max: Double)

/** Typed custom aggregate (SURVEY.md §2.11 / §2.4 A2 — the Flink
  * `AggregateFunction` analog, flink/README.md:26: element + accumulator →
  * updated accumulator, with a merge for distributed partials).
  *
  * Uses Welford/Chan's parallel variance formulation so partial buffers
  * merge exactly — the property that makes it safe as a map-side-combined
  * distributed aggregate at any scale. Register with
  * `functions.udaf(StatsAggregator)` for DataFrame use or apply to a
  * typed `Dataset[Double]` column via `.agg(StatsAggregator.toColumn)`.
  */
object StatsAggregator extends Aggregator[Double, StatsBuf, StatsResult] {

  override def zero: StatsBuf =
    StatsBuf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: StatsBuf, x: Double): StatsBuf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    val m2 = b.m2 + delta * (x - mean)
    StatsBuf(n, mean, m2, math.min(b.min, x), math.max(b.max, x))
  }

  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      val mean = a.mean + delta * b.n / n
      val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n
      StatsBuf(n, mean, m2, math.min(a.min, b.min), math.max(a.max, b.max))
    }
  }

  override def finish(b: StatsBuf): StatsResult =
    if (b.n == 0) StatsResult(0L, Double.NaN, None, Double.NaN, Double.NaN)
    else StatsResult(b.n, b.mean, if (b.n < 2) None else Some(b.m2 / (b.n - 1)), b.min, b.max)

  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
}
