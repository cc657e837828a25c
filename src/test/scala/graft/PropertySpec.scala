package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests promised in SURVEY §5: the dedup-before-aggregate
  * invariant (§1.4), pivot∘unpivot identity on fixed band lists, and
  * the deterministic-rounding contract. ScalaCheck generators are
  * driven through fixed seeds (the scalatest-scalacheck bridge isn't
  * in the offline cache) — 10 generated cases per property, each a
  * real Spark job. */
class PropertySpec extends SparkTestBase {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default.withSize(30), Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  private val rowsGen: Gen[List[(String, Int, Double)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.oneOf("k1", "k2", "k3", "k4")
      band <- Gen.choose(1, 5)
      v <- Gen.choose(0, 1000).map(_ / 10.0)
    } yield (key, band, v))

  test("dedup-before-agg: aggregating the deduped grain never double-counts") {
    (1L to 10L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      import spark.implicits._
      // denormalized: complex-level value repeated on every unit row
      val complexLevel = rows.map { case (k, _, _) => k }.distinct
        .map(k => k -> k.length * 100.0).toMap
      val denorm = rows.map { case (k, b, v) =>
        (k, b, v, complexLevel(k)) }
        .toDF("key", "band", "v", "complex_value")
      val naive = denorm.agg(sum("complex_value")).head().getDouble(0)
      val deduped = denorm.select("key", "complex_value").distinct()
        .agg(sum("complex_value")).head().getDouble(0)
      val expected = complexLevel.values.sum
      assert(math.abs(deduped - expected) < 1e-9, s"seed $seed")
      if (rows.groupBy(_._1).exists(_._2.size > 1))
        assert(naive > deduped, s"seed $seed: naive must over-count")
    }
  }

  test("pivot then unpivot restores the long form on a fixed band list") {
    (1L to 10L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      import spark.implicits._
      val bands = 1 to 5
      val long = rows.toDF("key", "band", "v")
        .groupBy("key", "band").agg(sum("v").as("v"))
      val wide = long.groupBy("key").pivot("band", bands).sum("v")
        .na.fill(0.0, bands.map(_.toString))
      val back = wide.unpivot(Array(col("key")),
        bands.map(b => col(s"$b")).toArray, "band", "v")
        .filter(col("v") =!= 0.0)
        .select(col("key"), col("band").cast("int").as("band"), col("v"))
      val nonZero = long.filter(col("v") =!= 0.0)
      assert(nonZero.exceptAll(back).count() == 0, s"seed $seed")
      assert(back.exceptAll(nonZero).count() == 0, s"seed $seed")
    }
  }

  test("Det.r is scale-exact: rounding a 2-decimal value at 2 digits is identity") {
    val centsGen = Gen.choose(-100000000, 100000000)
    import spark.implicits._
    val cents = (1L to 20L).map(seed => sample(centsGen, seed))
    val got = cents.map(_ / 100.0).toDF("x")
      .select(col("x"), ops.Det.r2(col("x")).as("r"))
      .collect()
    got.foreach(r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"Det.r2(${r.getDouble(0)}) = ${r.getDouble(1)}"))
  }
}
