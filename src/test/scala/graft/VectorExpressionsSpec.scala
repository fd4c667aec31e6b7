package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

class VectorExpressionsSpec extends GraftSuite {
  import spark.implicits._

  /** The HOF formulation the codegen expression replaces — kept here as the
    * semantic reference: left-to-right sequential fold. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("dot_product is bit-identical to the sequential-fold HOF form") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val pairs = vecs.as("l").join(vecs.as("r"),
        col("l.vec_id") < col("r.vec_id") && col("r.vec_id") < 40)
      .select(col("l.v").as("a"), col("r.v").as("b"))
    val mismatches = pairs.select(
        VectorExpressions.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("ref"))
      // bit-identity, not tolerance: both must fold in the same order
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("dot_product handles empty arrays and null inputs") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(VectorExpressions.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).isNullAt(0))
  }

  test("dot_product nulls on length mismatch and null elements, like the HOF form") {
    // the HOF reference yields NULL for a dimension mismatch (zip_with pads
    // with null) and for null elements; the codegen expression must agree
    // rather than silently summing the shorter prefix
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
              col("b").cast("array<double>").as("b"))
    val out = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // length mismatch
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null element
    assert(out(2).getDouble(0) == 11.0 && out(2).getDouble(1) == 11.0)
    // interpreted path agrees
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val o2 = df.select(VectorExpressions.dot(col("a"), col("b"))).collect()
      assert(o2(0).isNullAt(0) && o2(1).isNullAt(0) && o2(2).getDouble(0) == 11.0)
    }
  }

  test("dot_product evaluates both codegen and interpreted paths") {
    // interpreted path: eval via a filter on a literal-free comparison after
    // disabling whole-stage codegen
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val expected = 32.0
    assert(df.select(VectorExpressions.dot(col("a"), col("b"))).head().getDouble(0) == expected)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(VectorExpressions.dot(col("a"), col("b"))).head().getDouble(0) == expected)
    }
  }

  test("ngram_shingles equals the declarative HOF formulation on the corpus") {
    import graft.ops.Text
    val declarative = {
      val toks = Text.tokenize(col("text"))
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
        .otherwise(array(concat_ws(" ", toks)))
    }
    val diff = Tables.documents(spark, sf).select(
        graft.functions.TextExpressions.ngramShingles(col("text"), 3).as("fast"),
        declarative.as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .count()
    assert(diff == 0)
    // edge cases: empty text, single token, exact-n tokens
    val edge = Seq("", "one", "a b c").toDF("text").select(
      graft.functions.TextExpressions.ngramShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(edge(0) == Seq(""))
    assert(edge(1) == Seq("one"))
    assert(edge(2) == Seq("a b c"))
  }

  test("dot_product registers for SQL on an existing session") {
    org.apache.spark.sql.graft.GraftVectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("ngram_shingles registers for SQL with a literal width") {
    org.apache.spark.sql.graft.GraftTextExpressions.register(spark)
    val r = spark.sql("SELECT ngram_shingles('A b c d', 3) AS s").head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // a non-constant width is rejected at analysis time, not silently wrong
    intercept[Exception] {
      spark.sql("SELECT ngram_shingles('a b c', CAST(rand()*2 AS INT))").head()
    }
    // foldable CONSTANT expressions work: builders run before constant
    // folding, so the builder must eval them itself
    val f = spark.sql("SELECT ngram_shingles('a b c d', 1 + 2) AS s").head()
    assert(f.getSeq[String](0) == Seq("a b c", "b c d"))
    val c = spark.sql("SELECT ngram_shingles('a b c d', CAST(3 AS INT)) AS s").head()
    assert(c.getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("rolling_fingerprint registers for SQL and agrees across eval paths") {
    org.apache.spark.sql.graft.GraftTextExpressions.register(spark)
    // hand-derived: "Ab cd" → tokens (ab, cd); v₁ = 31·2 + 'a' = 159,
    // v₂ = 31·2 + 'c' = 161; acc = (159·1000003 + 161) mod 1e9+7
    val expected = ((159L * 1000003L + 161L) % 1000000007L)
    val r = spark.sql("SELECT rolling_fingerprint('Ab cd') AS f").head()
    assert(r.getLong(0) == expected)
    val df = Seq("Ab cd").toDF("text")
      .select(graft.functions.TextExpressions.rollingFingerprint(col("text")))
    assert(df.head().getLong(0) == expected)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.head().getLong(0) == expected)
    }
  }

  test("jaro_winkler matches the classic triples and the pinned corners") {
    org.apache.spark.sql.graft.GraftTextExpressions.register(spark)
    val cases = Seq(
      ("martha", "marhta", 0.961111),   // textbook triple
      ("dwayne", "duane", 0.84),
      ("dixon", "dicksonx", 0.813333),
      ("abcdef", "bcadef", 0.944444),   // odd mismatch count floor-halves
      ("abcdef", "abczzz", 0.666667),   // boost gated: jaro <= 0.7 unboosted
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("abc", "", 0.0), ("", "", 0.0),
      // non-ASCII: DuckDB compares UTF-8 BYTES (multi-byte code points
      // half-match) — values below read straight off
      // duckdb jaro_winkler_similarity, pinning the byte-level semantics
      ("café", "cafe", 0.848333),
      ("naïve", "naive", 0.857778),
      ("日本語", "日本誤", 0.955556),
      ("über", "uber", 0.783333),
      ("œuf", "oeuf", 0.666667))
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(col("a"), col("b"),
        round(graft.functions.TextExpressions.jaroWinkler(col("a"), col("b")), 6)
          .as("jw"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(2)).toMap
    cases.foreach { case (a, b, want) =>
      assert(got((a, b)) == want, s"($a, $b): got ${got((a, b))}, want $want") }
    // SQL registration + interpreted path agree with codegen
    val viaSql = spark.sql(
      "SELECT round(jaro_winkler('martha', 'marhta'), 6)").head().getDouble(0)
    assert(viaSql == 0.961111)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.collect().map(r => r.getDouble(2)).toSeq ==
        cases.map(_._3), "interpreted path diverged")
    }
  }

  test("GraftExtensions injects dot_product into a new session") {
    import org.apache.spark.sql.SparkSession
    // builder().getOrCreate() would return the shared test session and skip
    // extension wiring; clearing the defaults forces a NEW SparkSession on
    // the SAME SparkContext, with the extensions applied
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val fresh = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      val r = fresh.sql(
        "SELECT dot_product(array(1.0D, 1.0D), array(2.0D, 5.0D)) AS d").head()
      assert(r.getDouble(0) == 7.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private def withSQLConf(confs: (String, String)*)(f: => Unit): Unit = {
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
