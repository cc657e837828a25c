package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** HLL shard-rollup invariants — the properties that make the sketch
  * path trustworthy at 100 TB, pinned at test SF. */
class SketchesSpec extends SparkTestBase {

  test("x18: merged shard sketches equal the single-shot sketch exactly") {
    val dir = sfTest
    val rolled = Sketches.x18SketchRollup(spark, dir)
      .filter(col("shard") === -1)
      .select("distinct_est").as[Long](spark.implicits.newLongEncoder)
      .head()
    // one sketch over the whole table, no sharding
    val oneShot = Tables.documents(spark, dir)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(md5(col("text")))).as("est"))
      .select("est").as[Long](spark.implicits.newLongEncoder)
      .head()
    // register-max merge is associative + commutative: splitting the
    // corpus into shards and merging MUST reproduce the one-shot
    // sketch bit-for-bit (equality, not tolerance)
    assert(rolled === oneShot,
      s"shard rollup $rolled != single-shot $oneShot")
  }

  test("x18: estimate within HLL error envelope of the exact distinct") {
    val dir = sfTest
    val exact = Tables.documents(spark, dir)
      .select(md5(col("text")).as("fp")).distinct().count()
    val est = Sketches.x18SketchRollup(spark, dir)
      .filter(col("shard") === -1)
      .select("distinct_est").as[Long](spark.implicits.newLongEncoder)
      .head()
    // default lgK=12 → RSE ≈ 1.04/sqrt(4096) ≈ 1.6%; 5% is >3σ
    val relErr = math.abs(est.toDouble - exact) / exact
    assert(relErr < 0.05, s"est $est vs exact $exact: relErr $relErr")
  }

  test("x18: shard doc counts partition the corpus; shape is stable") {
    val dir = sfTest
    val rows = Sketches.x18SketchRollup(spark, dir)
    val total = Tables.documents(spark, dir).count()
    val shardSum = rows.filter(col("shard") >= 0)
      .agg(sum("n_docs")).head().getLong(0)
    val globalN = rows.filter(col("shard") === -1)
      .head().getAs[Long]("n_docs")
    assert(shardSum === total && globalN === total)
    assert(rows.count() === Sketches.Shards + 1)
  }
}
