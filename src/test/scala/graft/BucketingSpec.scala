package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketing: pre-shuffled on-disk layout so fact⋈fact joins read
  * co-located buckets instead of exchanging — at 100 TB this removes the
  * single biggest shuffle in the pipeline (orders⋈lineitem). Asserted:
  * the bucketed sort-merge join plans ZERO exchanges on the join inputs.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders⋈lineitem joins with no exchange before the join") {
    Tables.orders(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bucketed")
    Tables.lineitem(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_bucketed")

    val joined = spark.table("lineitem_bucketed").hint("merge")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), plan)

    // correctness: same row count as the plain join
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === expected)
  }
}
