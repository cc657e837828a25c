package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sim.Similarity

/** Dev tool: measures ANN recall vs the n1 brute-force ground truth
  * and LSH bucket occupancy across (planes, tables) settings — the
  * numbers behind DedupSimSpec's recall/occupancy gates. Not part of
  * the library surface.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairs(Similarity.n1SimTopkBruteforce(spark, dir))
    println(s"n1 truth pairs: ${truth.size}")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val auto = Similarity.n2AutoDial(n)
    println(s"n2 auto-dial for n=$n: planes=${auto._1} tables=${auto._2}")
    // "quick" second arg: only the auto-dial + n3/n4 (skip the grid)
    val dials = if (args.length > 1 && args(1) == "quick") Seq(auto)
      else (Seq((4, 4), (6, 4), (8, 4), (8, 8), (8, 12),
        (8, 16), (9, 8), (10, 6), (10, 8)) :+ auto).distinct
    for ((b, l) <- dials) {
      import org.apache.spark.sql.functions.{col, max, sum}
      val got = pairs(Similarity.n2Impl(spark, dir, b, l))
      val recall = (got & truth).size.toDouble / truth.size
      val bdf = Similarity.n2Buckets(spark, dir, b, l).cache()
      val sizes = bdf.groupBy("table_id", "bucket").count()
      val occ = sizes.agg(max("count")).head().getLong(0)
      // pre-distinct (query, member) comparisons — the join cost dial
      val cost = bdf.filter(col("vec_id") % 50 === 0)
        .join(sizes, Seq("table_id", "bucket"))
        .agg(sum("count")).head().getLong(0)
      bdf.unpersist()
      println(f"n2 planes=$b tables=$l recall=$recall%.3f " +
        f"maxBucket=$occ candCost=$cost")
    }
    val ivf = pairs(Similarity.n3SimIvfTopk(spark, dir))
    println(f"n3 ivf recall=${(ivf & truth).size.toDouble / truth.size}%.3f")
    val pq = pairs(Similarity.n4SimPqTopk(spark, dir))
    println(f"n4 pq recall=${(pq & truth).size.toDouble / truth.size}%.3f")
    val ivfpq = pairs(Similarity.n6SimIvfPqTopk(spark, dir))
    println(
      f"n6 ivfpq recall=${(ivfpq & truth).size.toDouble / truth.size}%.3f")
    spark.stop()
  }
}
