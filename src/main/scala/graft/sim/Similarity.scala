package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions
import graft.ops.Det

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * n1 is the exact brute-force baseline (cross join, the oracle);
  * n2 is the sign-random-projection LSH-bucketed variant — the 100 TB
  * path: queries only join vectors in their own bucket, so the
  * shuffle is an equi-join on bucket id instead of a cross join.
  * All cosine math is explicit sequential double arithmetic (see
  * Dedup.d5) so DuckDB reproduces it bit-for-bit.
  */
object Similarity {

  /** N1 — brute-force cosine top-k: every 50th vector is a query;
    * rank all other vectors by cosine, keep top 5. Deterministic
    * tiebreak on neighbor id. Cosine is graft's native codegen'd
    * [[graft.functions.FloatCosine]] expression — one fused primitive
    * loop per pair inside WholeStageCodegen, bit-identical to the
    * oracle's norm-then-divide SQL (index-order accumulation). */
  def n1SimTopkBruteforce(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val scored = queries.as("q").join(emb.as("v"),
        col("q.q_id") =!= col("v.vec_id"))
      .select(col("q.q_id"), col("v.vec_id").as("neighbor_id"),
        GraftFunctions.floatCosine("q.embedding", "v.embedding")
          .as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("neighbor_id"), col("rank"),
        Det.r6(col("cosine")).as("cosine"))
  }

  private val NumPlanes = 8

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim i): small signed value from integer arithmetic (public LCG
    * constants), reproducible with no RNG. */
  private def planeComponent(j: Int, i: Int): Double =
    (((j * 73856093 + i * 19349663) % 97 + 97) % 97 - 48) / 48.0

  /** N2 — LSH-bucketed cosine top-k (scale path of n1): sign-random-
    * projection hashing (Charikar 2002). Bucket id = sign bits of the
    * vector against 8 fixed hyperplanes; queries compare only against
    * same-bucket vectors. Recall vs n1 is
    * asserted in ScalaTest; no SQL oracle (scheme-specific). */
  def n2SimLshTopk(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    import s.implicits._
    // Bucket assignment as a kernel: the expression form (8 planes ×
    // 64 flat terms) spends more time in codegen compilation than the
    // data takes to process. Plane components are deterministic, so
    // the table is built once per task.
    val planes = Array.tabulate(NumPlanes, 64)((j, i) => planeComponent(j, i))
    val buckets = Tables.embeddings(s, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          var bucket = 0L
          var j = 0
          while (j < NumPlanes) {
            var dot = 0.0; var i = 0
            while (i < 64) { dot += v(i) * planes(j)(i); i += 1 }
            if (dot >= 0) bucket |= 1L << j
            j += 1
          }
          (id, bucket)
        }
      }.toDF("vec_id", "bucket")
    val emb = Tables.embeddings(s, dir).join(buckets, "vec_id")
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"), col("bucket"))
    val scored = queries.as("q").join(emb.as("v"),
        col("q.bucket") === col("v.bucket") &&
          col("q.q_id") =!= col("v.vec_id"))
      .select(col("q.q_id"), col("v.vec_id").as("neighbor_id"),
        GraftFunctions.floatCosine("q.embedding", "v.embedding")
          .as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("neighbor_id"), col("rank"),
        Det.r6(col("cosine")).as("cosine"))
  }

  private val IvfCells = 16
  private val IvfProbes = 4

  /** N3 — IVF-style ANN (inverted-file coarse quantization as in
    * Jégou et al. 2011, "Product quantization for nearest neighbor
    * search" — the IVF stage without PQ): a k-means coarse quantizer
    * (seeded, k=16) partitions vectors into cells; each query probes
    * its 4 nearest cells and brute-forces only those (cosine via the
    * native float_cosine expression). The third ANN shape next to brute
    * force (n1) and sign-LSH (n2): at 100 TB the inverted file is the
    * partitioning — vectors cluster-bucketed at write time, a query
    * touches nprobe/k of the data. Recall vs n1 asserted in
    * ScalaTest; rows-only (k-means isn't SQL-expressible). */
  def n3SimIvfTopk(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(s, dir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(IvfCells).setSeed(42).setMaxIter(5)
      .setFeaturesCol("features").fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"),
        col("prediction").as("cell"))
    // centroids as float arrays (cell-selection only — lossy cast OK)
    import s.implicits._
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray.map(_.toFloat))
    }.toSeq.toDF("cell", "centroid")
    val queries = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"),
        col("embedding").as("q_embedding"))
    val wCells = Window.partitionBy("q_id")
      .orderBy(col("centroid_sim").desc, col("cell"))
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("centroid_sim",
        GraftFunctions.floatCosine("q_embedding", "centroid"))
      .withColumn("cell_rank", row_number().over(wCells))
      .filter(col("cell_rank") <= IvfProbes)
      .select("q_id", "q_embedding", "cell")
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        GraftFunctions.floatCosine("q_embedding", "embedding")
          .as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("neighbor_id"), col("rank"),
        Det.r6(col("cosine")).as("cosine"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_sim_topk_bruteforce" -> n1SimTopkBruteforce,
    "n2_sim_lsh_topk" -> n2SimLshTopk,
    "n3_sim_ivf_topk" -> n3SimIvfTopk)

  val oracle: Map[String, String] = Map(
    "n1_sim_topk_bruteforce" ->
      s"""WITH e AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
               x -> x::double * x::double))) AS norm
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(q.embedding, v.embedding),
               p -> p[1]::double * p[2]::double)) / (q.norm * v.norm)
               AS cosine
           FROM e q JOIN e v ON q.vec_id % 50 = 0
             AND q.vec_id <> v.vec_id),
         ranked AS (
           SELECT q_id, neighbor_id, cosine,
             cast(row_number() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, neighbor_id) AS int) AS rank
           FROM scored)
         SELECT q_id, neighbor_id, rank, ${Det.sql("cosine", 6)} AS cosine
         FROM ranked WHERE rank <= 5""")
}
