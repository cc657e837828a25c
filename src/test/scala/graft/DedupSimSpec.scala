package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity

/** Consistency of the approximate (LSH/SimHash) dedup paths against
  * their exact counterparts — the guarantees ScalaTest can check that
  * the SQL oracle can't (hash schemes aren't SQL-expressible). */
class DedupSimSpec extends SparkTestBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame,
      a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d3 minhash-LSH pairs are a subset of d2 exact-jaccard pairs") {
    val exact = pairSet(Dedup.d2DedupNgramJaccard(spark, sfTest),
      "doc_a", "doc_b")
    val lsh = pairSet(Dedup.d3DedupMinhashLsh(spark, sfTest),
      "doc_a", "doc_b")
    assert(lsh.nonEmpty, "LSH found no pairs")
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-exact pairs: ${lsh -- exact}")
    // Banding (4 bands × 4 rows) recovers high-jaccard pairs w.h.p.
    assert(lsh.size >= exact.size / 2,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("d3 and d2 agree on jaccard for common pairs") {
    val exact = Dedup.d2DedupNgramJaccard(spark, sfTest)
      .withColumnRenamed("jaccard", "j_exact")
    val lsh = Dedup.d3DedupMinhashLsh(spark, sfTest)
    val joined = lsh.join(exact, Seq("doc_a", "doc_b"))
    assert(joined.filter(col("jaccard") =!= col("j_exact")).count() == 0)
  }

  test("d4 simhash finds near-identical documents") {
    val pairs = Dedup.d4DedupSimhash(spark, sfTest)
    assert(pairs.count() > 0)
    // hamming <= 3 enforced
    assert(pairs.filter(col("hamming") > 3).count() == 0)
  }

  test("d1 fingerprint dedup groups duplicate token-sets") {
    val grouped = Dedup.d1DedupExact(spark, sfTest)
    val total = grouped.agg(sum("n_docs")).head().getLong(0)
    val docs = Tables.documents(spark, sfTest).count()
    assert(total == docs, "every doc must land in exactly one group")
    assert(grouped.filter(col("n_docs") > 1).count() > 0,
      "testdata has planted fingerprint dups")
  }

  test("n2 LSH top-k cosines match n1 brute-force for common pairs") {
    val brute = Similarity.n1SimTopkBruteforce(spark, sfTest)
      .withColumnRenamed("cosine", "c1").withColumnRenamed("rank", "r1")
    val lsh = Similarity.n2SimLshTopk(spark, sfTest)
    val joined = lsh.join(brute, Seq("q_id", "neighbor_id"))
    assert(lsh.count() > 0)
    assert(joined.filter(col("cosine") =!= col("c1")).count() == 0,
      "cosine must be identical where both paths scored the pair")
  }

  test("n3 IVF top-k: cosines agree with n1; probing 4/16 cells keeps recall") {
    val brute = Similarity.n1SimTopkBruteforce(spark, sfTest)
      .withColumnRenamed("cosine", "c1").withColumnRenamed("rank", "r1")
    val ivf = Similarity.n3SimIvfTopk(spark, sfTest)
    assert(ivf.count() > 0)
    val joined = ivf.join(brute, Seq("q_id", "neighbor_id"))
    assert(joined.filter(col("cosine") =!= col("c1")).count() == 0)
    val recall = joined.count().toDouble / brute.count()
    assert(recall >= 0.2, s"IVF recall@5 too low: $recall")
  }

  test("n1 emits exactly top-5 per query with contiguous ranks") {
    val brute = Similarity.n1SimTopkBruteforce(spark, sfTest)
    val byQ = brute.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"))
    assert(byQ.filter(col("n") =!= 5 || col("maxr") =!= 5).count() == 0)
  }
}
