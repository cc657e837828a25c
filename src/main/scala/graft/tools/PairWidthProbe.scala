package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the round-14 pairStats width decision: times the
  * d8-shaped pair kernel (paragraph grain, the query whose pair
  * exchange AQE coalesced to 4 tasks) with the pair-emission
  * exchange (a) AQE-coalesced (`repartition(col)`) vs (b) pinned at
  * the session width (`repartition(n, col)`), ALTERNATING a/b/a/b in
  * one JVM so the comparison is same-window paired (the only honest
  * protocol on this shared host — BASELINE.md r12/r13). Reimplements
  * the kernel inline so both shapes exist in one binary; semantics
  * are irrelevant here (count-only action), only the exchange shape
  * differs. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.PairWidthProbe <sfDir> <reps>
  */
object PairWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count()

    def pairCount(widthPin: Boolean): Long = {
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val paras = docs.select(col("doc_id"), posexplode(expr(
        """transform(array(split(text, ' ')), toks ->
             transform(sequence(0,
                 cast(ceil(size(toks) / 25.0) as int) - 1),
               i -> array_join(slice(toks, i * 25 + 1, 25), ' ')))[0]"""))
        .as(Seq("para_idx", "ptext")))
        .select((col("doc_id") * 1024 + col("para_idx")).as("doc_id"),
          col("ptext").as("text"))
      val exploded = graft.dedup.Dedup.shinglePairs(paras)
      val re =
        if (widthPin) exploded.repartition(cpus.toInt, col("s"))
        else exploded.repartition(col("s"))
      re.groupBy("s")
        .agg(count(lit(1)).as("df"), collect_list(col("doc_id")).as("ids"))
        .filter(col("df") >= 2 && col("df") <= 1000)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
               transform(slice(ids, i + 2, size(ids)),
                 y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"""))
          .as("p"))
        .groupBy("p.a", "p.b").agg(count(lit(1)).as("shared"))
        .count()
    }

    (1 to reps).foreach { r =>
      Seq(false, true).foreach { pin =>
        val t0 = System.nanoTime()
        val c = pairCount(pin)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[pairwidth] rep $r pin=$pin: $sec%.3f s ($c pairs)")
      }
    }
    spark.stop()
  }
}
