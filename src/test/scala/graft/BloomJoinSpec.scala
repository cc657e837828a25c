package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomJoin

class BloomJoinSpec extends SparkTestBase {

  test("bloom-pruned join is row-identical to the plain join") {
    val dim = Tables.part(spark, sfSmoke).filter(col("p_size") <= 3)
      .select("p_partkey", "p_brand")
    val fact = Tables.lineitem(spark, sfSmoke)
    val pruned = BloomJoin.bloomPruneJoin(fact, "l_partkey",
      dim, "p_partkey", expectedItems = 10000L)
      .select("l_orderkey", "l_partkey", "p_brand")
    val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_partkey", "p_brand")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(pruned).count() == 0)
  }

  test("the bloom prune drops most non-matching fact rows pre-shuffle") {
    val dim = Tables.part(spark, sfSmoke).filter(col("p_size") <= 3)
      .select("p_partkey")
    val fact = Tables.lineitem(spark, sfSmoke)
    val blob = BloomJoin.buildBloom(dim, "p_partkey",
      expectedItems = 10000L, fpp = 0.01)
    val total = fact.count()
    val kept = BloomJoin.prunedSide(fact, "l_partkey", blob).count()
    val matched = fact.join(dim,
      col("l_partkey") === col("p_partkey"), "left_semi").count()
    // never loses a match; at 1% fpp the survivors are ≈ the matches,
    // far below the full fact table the shuffle would otherwise move
    assert(kept >= matched)
    assert(kept <= matched + (total * 0.05).toLong,
      s"prune too weak: kept=$kept matched=$matched total=$total")
    assert(kept * 2 < total)
  }

  test("might_contain evaluates below the join in the plan") {
    val dim = Tables.part(spark, sfSmoke).filter(col("p_size") <= 3)
      .select("p_partkey", "p_brand")
    val out = BloomJoin.bloomPruneJoin(Tables.lineitem(spark, sfSmoke),
      "l_partkey", dim, "p_partkey", expectedItems = 10000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom predicate in the plan:\n$plan")
    // the predicate must sit on the fact scan side, not above the join:
    // in the plan tree string the Filter line carrying might_contain
    // appears BELOW the first join operator line (deeper = later)
    val lines = plan.linesIterator.toVector
    val joinIdx = lines.indexWhere(l =>
      l.contains("Join") || l.contains("join"))
    val bloomIdx = lines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"bloom filter should be under the join (join@$joinIdx bloom@$bloomIdx)")
  }
}
