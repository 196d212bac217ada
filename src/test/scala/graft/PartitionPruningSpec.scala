package graft

import org.apache.spark.sql.functions._

/** Partition-pruning posture: at 100 TB the fact table lives as
  * directory-partitioned parquet, and both static pruning (literal
  * predicates on the partition column) and dynamic partition pruning
  * (runtime values from a selective dimension join) must reach the
  * scan — the difference between listing a handful of directories and
  * scanning the corpus.
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val partDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.core.Tables.lineitem(spark, sf0001)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("ship_year").parquet(dir)
    dir
  }

  test("static pruning: a literal partition predicate reaches the scan") {
    val expected = graft.core.Tables.lineitem(spark, sf0001)
      .filter(year(col("l_shipdate")) === 1997).count()
    val static = spark.read.parquet(partDir).filter(col("ship_year") === 1997)
    val p = static.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("ship_year"), p)
    // the data filter must NOT degrade to a post-scan filter on data pages
    assert(!p.contains("PushedFilters: [IsNotNull(ship_year)"), p)
    assert(static.count() === expected)
  }

  test("dynamic partition pruning fires off a broadcast dimension filter") {
    import spark.implicits._
    // the dim must be a real (file-backed) relation with a genuinely
    // selective predicate — an in-memory LocalRelation constant-folds
    // the filter away and DPP never considers it
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    (1995 to 2001).map(y => (y, if (y >= 1997 && y <= 1998) "pick" else "skip"))
      .toDF("y", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "pick")
    val joined = spark.read.parquet(partDir)
      .join(dim, col("ship_year") === col("y"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    val expected = graft.core.Tables.lineitem(spark, sf0001)
      .filter(year(col("l_shipdate")).isin(1997, 1998)).count()
    assert(joined.count() === expected)
  }
}
