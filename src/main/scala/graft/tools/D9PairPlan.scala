package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Dev tool: print the physical plan of d9's WITHIN-CELL pair phase,
  * which the query's own explain hides behind the star loop's
  * localCheckpoint (the plan shows only `Scan ExistingRDD`). Prints
  * BOTH shapes — the r13 cell-keyed self-join (reconstructed inline)
  * and the r14 single-exchange list kernel now in d9KeepList — so
  * the committed plan diff is reviewable. Not part of the driver
  * contract. Usage: runMain graft.tools.D9PairPlan <sfDir>
  */
object D9PairPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    import graft.sim.Similarity
    val base = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val planted = base
      .filter(col("vec_id") % graft.dedup.Dedup.D9PlantStride === 0)
      .select((col("vec_id") + graft.dedup.Dedup.D9PlantOffset)
        .as("vec_id"), col("embedding"))
    val corpus = base.union(planted)
    val total = corpus.count()
    val (cells, _) = Similarity.n3AutoDial(total)
    val cents = Similarity.fitCentroids(corpus, cells, total)
    val assigned = Similarity.cosineAssign(corpus, cents)
    val tau = graft.dedup.Dedup.D9Tau

    println("\n========== d9_pair_phase BEFORE (r13 cell-keyed self-join) ==========")
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(GraftFunctions.floatCosine("ea", "eb") >= tau)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .explain("formatted")

    println("\n========== d9_pair_phase AFTER (r14 single-exchange list kernel) ==========")
    assigned
      .repartition(4, col("cell"))
      .groupBy("cell")
      .agg(collect_list(struct(col("vec_id").as("id"),
        col("embedding").as("v"))).as("members"))
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
             transform(slice(members, i + 2, size(members)),
               y -> struct(least(x.id, y.id) AS a, greatest(x.id, y.id) AS b,
                 float_cosine(x.v, y.v) AS c))))""")).as("p"))
      .filter(col("p.c") >= tau)
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .explain("formatted")
    spark.stop()
  }
}
