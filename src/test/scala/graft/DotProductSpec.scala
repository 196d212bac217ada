package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProductFloat, VectorOps}

/** The codegen'd DotProductFloat must agree bit-for-bit with the
  * interpreted higher-order formulation (same widening, same order). */
class DotProductSpec extends SparkSpec {

  test("DotProductFloat ≡ aggregate(zip_with(...)) on the embeddings table") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).limit(100)
    val both = emb.select(
      DotProductFloat(col("embedding"), col("embedding")).as("fast"),
      VectorOps.dot(col("embedding"), col("embedding")).as("slow"))
    val rows = both.collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"mismatch: $r")
    }
  }

  test("nulls and empty arrays") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))
    ).toDF("a", "b")
      .select(DotProductFloat(col("a").cast("array<float>"), col("b").cast("array<float>")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) === 0.0)
  }

  test("codegen path is active (no fallback) in a whole-stage plan") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = emb.select(DotProductFloat(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan:\n$plan")
  }
}
