package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed `Aggregator[IN, BUF, OUT]` UDAF surface (SURVEY.md §7.3
  * names it as the optional UDAF tier next to the two
  * TypedImperativeAggregates in SketchAggregates) — exact money sum:
  * doubles enter, an integer-cents buffer accumulates (associative +
  * commutative ⇒ partial/final merge order cannot change the result),
  * one double division leaves. The Encoder-typed buffer serializes as
  * a primitive long between partial and final aggregation. */
object CentsSum extends Aggregator[Double, Long, Double] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: Double): Long = b + math.round(a * 100)
  override def merge(x: Long, y: Long): Long = x + y
  override def finish(r: Long): Double = r.toDouble / 100
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
