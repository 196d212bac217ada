package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** GraftExtensions: the optimizer rule must rewrite the declarative HOF
  * dot product into the codegen'd expression, and the injected SQL
  * function must resolve.
  */
class ExtensionsSpec extends SparkSpec {

  test("RewriteDotProduct turns aggregate(zip_with(...)) into dotproductfloat") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val df = emb.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproductfloat"), s"not rewritten:\n$optimized")
    // and the rewrite preserves values bit-for-bit vs the raw expression
    val fast = df.collect().map(_.getDouble(0))
    val slow = emb.select(
      graft.functions.DotProductFloat(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    assert(fast.toSeq === slow.toSeq)
  }

  test("dot_product_float is callable from SQL") {
    graft.core.Tables.embeddings(spark, sf0001).createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      "SELECT vec_id, dot_product_float(embedding, embedding) AS d FROM emb_sql ORDER BY vec_id LIMIT 5")
      .collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("int-code kernels and nfc_normalize are callable from SQL") {
    import spark.implicits._
    Seq((Seq(1, 2, 3), Seq(4, 5, 6))).toDF("a", "b").createOrReplaceTempView("codes_sql")
    assert(spark.sql("SELECT dot_product_int(a, b) FROM codes_sql")
      .collect()(0).getLong(0) === 32L)
    Seq((Seq(0, 1), Seq(Seq(10L, 20L), Seq(30L, 40L)))).toDF("codes", "tbl")
      .createOrReplaceTempView("pq_sql")
    assert(spark.sql("SELECT code_lookup_sum(codes, tbl) FROM pq_sql")
      .collect()(0).getLong(0) === 50L)
    assert(spark.sql("SELECT nfc_normalize('e\\u0301')")
      .collect()(0).getString(0) === "é")
  }

  test("the rule does not fire on non-float arrays or different lambdas") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("dotproductfloat"))
    assert(df.collect()(0).getDouble(0) === 11.0)
  }
}
