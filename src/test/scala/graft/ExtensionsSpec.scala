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

  test("ThresholdLevenshtein swaps the banded DP into bounded-distance predicates") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{Levenshtein => CatLev}
    val names = Seq("kitten", "sitten", "sitting", "kitchen", "mitten", "abcdef")
    val df = names.flatMap(a => names.map(b => (a, b))).toDF("a", "b")
    // keep the literal relation from being constant-folded away so the
    // optimized plan still contains the predicate under inspection
    val exclKey = "spark.sql.optimizer.excludedRules"
    val prevExcl = spark.conf.getOption(exclKey)
    spark.conf.set(exclKey,
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {

    def thresholded(q: org.apache.spark.sql.DataFrame): Boolean =
      q.queryExecution.optimizedPlan
        .collect { case node => node.expressions }.flatten
        .exists(_.exists {
          case l: CatLev => l.threshold.isDefined
          case _ => false
        })

    val le = df.filter(levenshtein(col("a"), col("b")) <= 1)
    assert(thresholded(le), le.queryExecution.optimizedPlan.toString)
    val lt = df.filter(levenshtein(col("a"), col("b")) < 2)
    assert(thresholded(lt))
    val mirrored = df.filter(lit(1) >= levenshtein(col("a"), col("b")))
    assert(thresholded(mirrored))
    val unbounded = df.select(levenshtein(col("a"), col("b")).as("d")).filter(col("d") >= 0)
    assert(!thresholded(unbounded), "rule must not fire without a literal upper bound")

    // every rewritten form agrees with a plain-Scala DP, including k = 0
    def dp(x: String, y: String): Int = {
      val m = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j), m(i)(j - 1)) + 1,
          m(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      m(x.length)(y.length)
    }
    val want1 = names.flatMap(a => names.map(b => (a, b))).filter(p => dp(p._1, p._2) <= 1).sorted
    assert(le.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq === want1)
    val eq0 = df.filter(levenshtein(col("a"), col("b")) <= 0)
    assert(thresholded(eq0))
    assert(eq0.count() === names.length.toLong, "k = 0 keeps exactly the identical pairs")
    // null operands filter out in both formulations
    val withNull = Seq(("a", null), ("a", "a")).toDF("a", "b")
      .filter(levenshtein(col("a"), col("b")) <= 1)
    assert(withNull.count() === 1)

    } finally prevExcl match {
      case Some(v) => spark.conf.set(exclKey, v)
      case None => spark.conf.unset(exclKey)
    }
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
