package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact weighted median as a typed `Aggregator` (SURVEY §2.10's one
  * declared custom-UDAF extension point).
  *
  * Semantics: the weighted LOWER median — the smallest value v whose
  * cumulative weight (over values ≤ v) reaches half the total weight.
  * With all weights 1 this is the classic lower median; it is also
  * exactly expressible as window SQL (sort by value, running sum of
  * weight, first row crossing totalW/2), which is what the DuckDB
  * oracle runs.
  *
  * Shape: a holistic aggregate cannot stream in constant memory, so —
  * like Spark's own `percentile` — the buffer is a value→total-weight
  * map, bounded by the number of DISTINCT values per group, not rows
  * (duplicate values collapse at update time, map-side; the buffer
  * object lives in the hash aggregate and mutates in place, Kryo only
  * serializes it across the partial/final shuffle). Partial maps merge
  * associatively, so Spark plans the normal partial/final aggregate:
  * the shuffle carries one compacted map per partition × group. For
  * unbounded-cardinality doubles at 100 TB the approximate path
  * (g13's GK approx_percentile) is the right tool; this is the exact twin.
  */
object WeightedMedian {

  type Buf = mutable.HashMap[Double, Double]

  val agg: Aggregator[(Double, Double), Buf, Double] =
    new Aggregator[(Double, Double), Buf, Double] {
      override def zero: Buf = mutable.HashMap.empty
      override def reduce(b: Buf, in: (Double, Double)): Buf = {
        val (v, w) = in
        b.update(v, b.getOrElse(v, 0.0) + w)
        b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
        small.foreach { case (v, w) =>
          big.update(v, big.getOrElse(v, 0.0) + w)
        }
        big
      }
      override def finish(b: Buf): Double = {
        if (b.isEmpty) return Double.NaN
        val half = b.valuesIterator.sum / 2.0
        val sorted = b.toArray.sortBy(_._1)
        var cum = 0.0
        var i = 0
        while (i < sorted.length) {
          cum += sorted(i)._2
          if (cum >= half) return sorted(i)._1
          i += 1
        }
        sorted.last._1
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: `weightedMedian(col("x"), col("w"))`. */
  def weightedMedian(value: Column, weight: Column): Column =
    udaf(agg).apply(value, weight)
}
