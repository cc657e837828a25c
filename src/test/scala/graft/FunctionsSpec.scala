package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native FloatCosine expression: codegen path must agree exactly
  * with the interpreted HOF formulation (same IEEE op order), SQL
  * registration must resolve, and nulls must propagate. */
class FunctionsSpec extends SparkTestBase {

  test("float_cosine equals the HOF cosine bit-for-bit on embeddings") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfTest).limit(100)
    val hof = emb.as("q").crossJoin(emb.as("v"))
      .select(col("q.vec_id").as("a"), col("v.vec_id").as("b"),
        expr(
          """aggregate(zip_with(q.embedding, v.embedding,
               (x, y) -> cast(x AS double) * cast(y AS double)),
               cast(0 AS double), (acc, v) -> acc + v)
             / (sqrt(aggregate(transform(q.embedding,
                  x -> cast(x AS double) * cast(x AS double)),
                  cast(0 AS double), (acc, v) -> acc + v))
              * sqrt(aggregate(transform(v.embedding,
                  x -> cast(x AS double) * cast(x AS double)),
                  cast(0 AS double), (acc, v) -> acc + v)))""")
          .as("c_hof"))
    val native = emb.as("q").crossJoin(emb.as("v"))
      .select(col("q.vec_id").as("a"), col("v.vec_id").as("b"),
        GraftFunctions.floatCosine("q.embedding", "v.embedding")
          .as("c_native"))
    val joined = native.join(hof, Seq("a", "b"))
    // exact equality — both accumulate in index order in double
    assert(joined.filter(col("c_native") =!= col("c_hof")).count() == 0)
    assert(joined.count() == 100L * 100)
  }

  test("float_cosine resolves from SQL and handles nulls/self-similarity") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfSmoke).createOrReplaceTempView("emb_fn_test")
    val self = spark.sql(
      "SELECT float_cosine(embedding, embedding) AS c FROM emb_fn_test")
    assert(self.filter(abs(col("c") - 1.0) > 1e-12).count() == 0)
    val nulls = spark.sql(
      "SELECT float_cosine(NULL, embedding) AS c FROM emb_fn_test")
    assert(nulls.filter(col("c").isNotNull).count() == 0)
  }

  test("float_cosine: zero-norm and length-mismatch yield NULL, not NaN") {
    GraftFunctions.register(spark)
    // codegen path (column input) and interpreted path (literal fold)
    // must both null out instead of emitting 0/0 = NaN — NaN sorts
    // ABOVE every double and would falsely rank first in top-k desc.
    val df = spark.sql(
      """SELECT
           float_cosine(cast(array(0.0, 0.0) AS array<float>),
                        cast(array(1.0, 2.0) AS array<float>)) AS zero_norm,
           float_cosine(cast(array() AS array<float>),
                        cast(array() AS array<float>)) AS empty,
           float_cosine(cast(array(1.0) AS array<float>),
                        cast(array(1.0, 2.0) AS array<float>)) AS mismatch,
           float_cosine(cast(array(1.0, 0.0) AS array<float>),
                        cast(array(1.0, 0.0) AS array<float>)) AS ok""")
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 1.0)
  }
}
