package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 / the 100 TB design
  * note: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the tool when one key dominates so heavily that even split shuffle
  * blocks hotspot a single task, or when AQE is unavailable
  * (streaming joins). Mechanics: the large side gets a deterministic
  * per-row salt in [0, salts); the small side is replicated once per
  * salt; the join key becomes (key, salt), spreading each hot key
  * over `salts` tasks. Row-content hashing keeps the salt
  * deterministic run-to-run (no rand()).
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // Replicating the small side is only sound when unmatched SMALL
    // rows never reach the output: under right/full outer each
    // unmatched small row would surface once per salt replica.
    val normalized = joinType.toLowerCase.replaceAll("[_ ]", "")
    // "semi"/"anti" are Spark's bare aliases for left_semi/left_anti —
    // equally replication-safe (only large-side rows can surface).
    require(Set("inner", "left", "leftouter",
        "leftsemi", "semi", "leftanti", "anti").contains(normalized),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, " +
        s"got '$joinType' (small-side replication breaks right/full outer)")
    val saltCol: Column =
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salts))
    val salted = large.withColumn("__salt", saltCol)
    val expanded = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
