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

  test("chunker tiles any doc under any window/stride geometry") {
    // the invariants text_chunk_overlap's fixed 128/96 instance relies
    // on, proven over arbitrary text and geometry: chunk i sits at
    // i*step, holds exactly text[i*step, i*step+size), the chunk count
    // is floor(max(len-1,0)/step)+1, and the last chunk ends at len
    val geomGen = Gen.chooseNum(1, 20)
    val textsGen = Gen.listOfN(6, Gen.asciiPrintableStr)
    check("chunk-tile", Prop.forAll(textsGen, geomGen, geomGen) { (texts, a, b) =>
      val size = math.max(a, b)
      val step = math.min(a, b)
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val byDoc = graft.functions.TextAnalysis.chunksOf(df, size, step)
        .collect().groupBy(_.getLong(0))
      texts.zipWithIndex.forall { case (t, i) =>
        val rows = byDoc(i.toLong).sortBy(_.getLong(1))
        rows.length == math.max(t.length - 1, 0) / step + 1 &&
          rows.zipWithIndex.forall { case (r, j) =>
            r.getLong(2) == j.toLong * step &&
              r.getString(3) == t.slice(j * step, j * step + size)
          } &&
          rows.last.getLong(2) + rows.last.getString(3).length == t.length.toLong
      }
    })
  }
}
