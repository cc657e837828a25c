package graft

/** The scrub/pin contract [[Bench]] relies on: dead single-query
  * checkpoints are dropped, registered session caches survive AND
  * stay readable (their lineage is truncated — surviving in the
  * registry but losing blocks would fail every later consumer). */
class SessionCachesSpec extends SparkTestBase {

  test("scrub drops dead checkpoints, pinned caches survive readable") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val dead = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val deadIds = sc.getPersistentRDDs.keySet -- before
    assert(deadIds.nonEmpty, "checkpoint must register as persistent")
    val pinnedDf = SessionCaches.pin(Seq(4L, 5L).toDF("y"))
    SessionCaches.scrub(spark)
    val live = sc.getPersistentRDDs.keySet
    assert(deadIds.forall(!live.contains(_)),
      s"dead checkpoint survived the scrub: ${deadIds & live}")
    // the pinned cache still answers — blocks intact despite the
    // truncated lineage
    assert(pinnedDf.as[Long].collect().sorted.toSeq == Seq(4L, 5L))
  }

  test("the cluster-labels session cache survives a scrub end-to-end") {
    // d6's labels are the highest-value pinned cache (x39 and the
    // pipeline consume them after other queries ran in between)
    val labels = graft.dedup.Dedup.d6DedupClusters(spark, sfSmoke)
    val n = labels.count()
    SessionCaches.scrub(spark)
    assert(labels.count() == n, "pinned labels lost blocks to scrub")
  }
}
