package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters as a mergeable typed `Aggregator` — the
  * constant-memory approximate twin of x7's exact top-k vocabulary,
  * the same relationship g13's sketches bear to the exact aggregates.
  *
  * The summary keeps at most k counters (Misra & Gries 1982). Update:
  * increment a present key; insert if there is room; otherwise
  * decrement ALL counters and drop zeros (charging one occurrence of
  * every tracked key against the new one). Merge adds counters
  * keywise, then restores the size bound by subtracting the (k+1)-th
  * largest count from every counter and dropping non-positives —
  * the mergeability construction of Agarwal et al. 2012 ("Mergeable
  * summaries"), which keeps the total undercount bound additive.
  *
  * Guarantees (n = stream length): every reported count is a LOWER
  * bound of the true count, short by at most n/(k+1); any key with
  * true frequency > n/(k+1) is guaranteed to survive. So k = 64
  * certifies everything above ~1.6 % frequency — at 100 TB the
  * buffer is still k counters per partition × group, and the shuffle
  * carries one k-entry map per partition.
  */
object HeavyHitters {

  type Buf = mutable.HashMap[String, Long]

  def aggK(k: Int): Aggregator[String, Buf, Map[String, Long]] =
    new Aggregator[String, Buf, Map[String, Long]] {
      override def zero: Buf = mutable.HashMap.empty

      override def reduce(b: Buf, key: String): Buf = {
        b.get(key) match {
          case Some(c) => b.update(key, c + 1)
          case None if b.size < k => b.update(key, 1L)
          case None =>
            // decrement-all: amortized O(1) per element — each stored
            // occurrence is decremented at most once
            val dead = mutable.ArrayBuffer.empty[String]
            b.mapValuesInPlace((_, c) => c - 1)
            b.foreach { case (t, c) => if (c <= 0) dead += t }
            dead.foreach(b.remove)
        }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
        mergeInto(big, small, k)
      }

      override def finish(b: Buf): Map[String, Long] = b.toMap

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder()
    }

  /** The MG summary merge: add the smaller side in, then restore the
    * k-counter bound by the subtract-the-(k+1)th construction —
    * preserves the n/(k+1) lower-bound envelope (Agarwal et al.
    * 2012, mergeable summaries). Shared by the Aggregator's shuffle
    * merge and the streaming state fold. */
  private[graft] def mergeInto(big: Buf,
      small: Iterable[(String, Long)], k: Int): Buf = {
    small.foreach { case (t, c) =>
      big.update(t, big.getOrElse(t, 0L) + c)
    }
    if (big.size > k) {
      // subtract the (k+1)-th largest count, keep strictly positive
      val counts = big.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      big.mapValuesInPlace((_, c) => c - cut)
      big.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(big.remove)
    }
    big
  }

  /** Immutable-map form of the merge, for driver-side state folds
    * (both sides are ≤ k entries — trivially bounded). */
  def mergeMaps(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val buf = mutable.HashMap.empty[String, Long]
    buf ++= a
    mergeInto(buf, b, k).toMap
  }

  /** Column form: `heavyHitters(64)(col("token"))` → map<string,bigint>
    * of surviving keys and their lower-bound counts. */
  def heavyHitters(k: Int)(key: Column): Column =
    udaf(aggK(k), Encoders.STRING).apply(key)
}
