package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Leg-by-leg wall-time probe for the n8 build/serve split (round-13
  * diagnosis): the r12 ladder attributed n8's 13.2×-per-decade to the
  * O(n·cells) cell ASSIGNMENT, but a flop count says assignment is
  * seconds at sf10 while the serve leg's CANDIDATE MASS —
  * queries(n/25) × probes(cells/4) × cellsize(√2n) ≈ 434M rows — is
  * the 5 GB shuffle the bench artifact recorded. This main times
  * fit / encode / persist / serve separately so the round fixes the
  * real payer instead of the suspected one.
  *
  * Usage: runMain graft.tools.N8Probe <sfDir>
  */
object N8Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"N8PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val planted = base
      .filter(col("vec_id") % graft.dedup.Dedup.D7PlantStride === 0)
      .select((col("vec_id") + graft.dedup.Dedup.D7PlantOffset)
        .as("vec_id"), col("embedding"))
    val emb = base.union(planted).localCheckpoint(true)
    val total = t("count")(emb.count())

    val model = t("fit")(
      graft.sim.Similarity.fitIvfPqCached(spark, emb, total, dir,
        s"probe_${System.nanoTime()}"))
    val codes = t("encode(action=count)") {
      val c = graft.sim.Similarity.encodeIvfPq(spark, emb, model)
        .localCheckpoint(true)
      c.count(); c
    }
    val served = t("serve") {
      graft.sim.Similarity.serveIvfPq(spark, emb, model, codes, total,
        col("vec_id") >= graft.dedup.Dedup.D7PlantOffset, k = 1).count()
    }
    println(s"N8PROBE served_rows $served total_vectors $total")
    spark.stop()
  }
}
