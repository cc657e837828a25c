package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] =
    df.agg(HeavyHitters.heavyHitters(k)(col("token")).as("hh"))
      .head().getMap[String, Long](0).toMap

  test("MG bound: lower-bound counts, additive error, frequent keys survive") {
    val toks = Tables.documents(spark, sfSmoke)
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 64
    val err = n / (k + 1)
    val mg = sketch(toks, k)
    assert(mg.nonEmpty && mg.size <= k)
    mg.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(c >= exact(t) - err,
        s"$t undercounted past the bound: $c < ${exact(t)} - $err")
    }
    val mustSurvive = exact.filter(_._2 > err).keySet
    assert(mustSurvive.subsetOf(mg.keySet),
      s"guaranteed keys missing: ${mustSurvive -- mg.keySet}")
  }

  test("planted hot key survives a wide-partition merge with a tight count") {
    val hot = Seq.fill(10000)("hot")
    val noise = (0 until 5000).map(i => s"t$i")
    val toks = (hot ++ noise).toDF("token").repartition(32)
    val n = hot.length + noise.length
    val k = 64
    val mg = sketch(toks, k)
    assert(mg.contains("hot"))
    assert(mg("hot") >= hot.length - n / (k + 1))
    assert(mg("hot") <= hot.length)
  }
}
