package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits: golden values and monotone locality") {
    // x=3 (011), y=5 (101): x-bits land at even positions, y at odd
    //   x0<<0 + y0<<1 + x1<<2 + y2<<5 = 1 + 2 + 4 + 32 = 39
    val z = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(z(0) == 39L)
    assert(z(1) == 0L)
    // 16 one-bits at even positions = 0x55555555; odd = 0xAAAAAAAA
    assert(z(2) == 0x55555555L)
    assert(z(3) == 0xAAAAAAAAL)
  }

  test("spark zValue matches the generated oracle SQL bit-for-bit") {
    val viaSql = Seq((12345L, 678L)).toDF("x", "y")
      .selectExpr(s"(${ZOrder.zValueSql("x", "y")}) AS z")
      .as[Long].head()
    val viaCol = Seq((12345L, 678L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].head()
    assert(viaSql == viaCol)
  }

  test("z-ordered layout prunes files on a 2-D box; linear layout cannot") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val li = Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

    // linear = the natural insertion order (sorted by l_orderkey):
    // one-dimensional clustering, partkey/suppkey scattered everywhere
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(s"$base/linear")
    ZOrder.zOrderWrite(li, s"$base/zorder", "l_partkey", "l_suppkey", 16)

    val r = li.agg(min("l_partkey").cast("long"),
      max("l_partkey").cast("long")).head()
    val (loP, hiP) = (r.getLong(0), r.getLong(1))
    val box = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("l_partkey").between(loP, loP + (hiP - loP) / 5) &&
        col("l_suppkey").between(1, 3))
    def filesTouched(path: String): Long =
      box(spark.read.parquet(path))
        .select(input_file_name()).distinct().count()

    val linearFiles = filesTouched(s"$base/linear")
    val zFiles = filesTouched(s"$base/zorder")
    // same rows either way — layout must never change results
    assert(box(spark.read.parquet(s"$base/zorder")).count() ==
      box(spark.read.parquet(s"$base/linear")).count())
    assert(box(spark.read.parquet(s"$base/zorder")).count() > 0)
    // the box covers ~20% x ~30% of the space: under linear layout it
    // is spread across (nearly) all files; z-ordering confines it
    assert(linearFiles >= 12, s"box should scatter under linear layout, got $linearFiles")
    assert(zFiles * 2 <= linearFiles,
      s"z-order should at least halve files touched: z=$zFiles linear=$linearFiles")
  }
}
