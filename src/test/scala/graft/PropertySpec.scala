package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Parity

/** Property-based invariants (SURVEY.md §5): results must not depend on
  * row order or partitioning — the properties Crane's random routing +
  * master merge relied on, guaranteed here by the hash shuffle. Uses
  * scalacheck's runner directly (no scalatestplus bridge in the build).
  */
class PropertySpec extends SparkSpec {

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "", "x y")).map(_.mkString(" "))

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, s"$name: $res")
  }

  private def wcMap(lines: Seq[String], partitions: Int): Map[String, Long] = {
    import spark.implicits._
    val df = spark.createDataset(lines).repartition(partitions).toDF("value")
    Parity.wordCount(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("wordcount invariant under permutation and partitioning") {
    check("wc-invariance", Prop.forAll(Gen.listOfN(30, lineGen)) { corpus =>
      corpus.isEmpty || {
        val base = wcMap(corpus, 1)
        val shuffled = wcMap(new scala.util.Random(42).shuffle(corpus), 7)
        val expected = corpus.flatMap(_.split(" ", -1))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        base == shuffled && base == expected
      }
    })
  }

  test("filter+count equals manual predicate count") {
    check("filter-count", Prop.forAll(Gen.listOfN(50, Gen.chooseNum(-100, 200))) { xs =>
      import spark.implicits._
      val df = spark.createDataset(xs.map(x => ("u", x))).toDF("name", "followers")
      val got = Parity.filterCount(df, "followers", 50.0).collect()(0).getLong(1)
      got == xs.count(_ > 50).toLong
    })
  }

  test("pagerank contribution mass = sum over docs of n/(n+1)") {
    check("pr-mass", Prop.forAll(Gen.listOfN(20, Gen.chooseNum(0, 6))) { degs =>
      import spark.implicits._
      val rows = degs.zipWithIndex.map { case (k, i) =>
        (s"src$i", (0 until k).map(j => s"n${i}_$j"))
      }
      val df = spark.createDataset(rows).toDF("src", "neighbors")
      val got = Parity.pageRankContribs(df).collect().map(_.getDouble(1)).sum
      val want = degs.filter(_ > 0).map(k => k.toDouble / (k + 1)).sum
      math.abs(got - want) < 1e-9
    })
  }

  test("bloom prefilter + exact confirm ≡ anti-join for arbitrary key sets") {
    // the exactness contract of graft.functions.Bloom: whatever the
    // corpus/batch overlap, the two-path composition equals the plain
    // anti-join (no false negatives ever; false positives removed by
    // the confirm join)
    import org.apache.spark.sql.functions.col
    val keysGen = Gen.listOfN(60, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    check("bloom-exact", Prop.forAll(keysGen, keysGen) { (corpusKeys, batchKeys) =>
      corpusKeys.isEmpty || {
        import spark.implicits._
        val corpus = corpusKeys.distinct.toDF("k")
        val batch = batchKeys.distinct.toDF("k")
        val bloom = graft.functions.Bloom.buildBytes(corpus, col("k"), 128L)
        val got = batch.filter(!graft.functions.Bloom.mightContain(bloom, col("k")))
          .unionByName(batch.filter(graft.functions.Bloom.mightContain(bloom, col("k")))
            .join(corpus, Seq("k"), "left_anti"))
          .as[Long].collect().sorted.toSeq
        val want = batch.join(corpus, Seq("k"), "left_anti")
          .as[Long].collect().sorted.toSeq
        got == want
      }
    })
  }
}
