package graft

import org.apache.spark.sql.functions._
import graft.ext.Profiling

class ProfilingSpec extends GraftSuite {
  import spark.implicits._

  test("profileNumeric: hand-computed stats, nulls counted not averaged") {
    val df = Seq(Some(2.0), Some(4.0), Some(6.0), None)
      .toDF("x").withColumn("y", lit(1.0))
    val p = Profiling.profileNumeric(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // x: n=3 (null excluded), mean 4, var (4+16+36)/3 - 16 = 2.666667
    assert(p("x") == ((3L, 1L, 2.0, 6.0, 4.0, 1.632993)))
    assert(p("y") == ((4L, 0L, 1.0, 1.0, 1.0, 0.0)))
  }

  test("profileNumeric: an all-null column reports NULL stats, not zeros") {
    val df = Seq(1, 2).toDF("k")
      .withColumn("z", lit(null).cast("double"))
    val r = Profiling.profileNumeric(df, Seq("z")).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 2L) // n=0, n_null=2
    assert(r.isNullAt(5) && r.isNullAt(6), // mean and stddev both NULL
      "an empty column must not fabricate a mean or dispersion")
  }

  test("profileNumeric: column names that are not bare SQL identifiers") {
    // the mean goes through expr() string parsing (decRatio6) — quoting
    // must keep names with spaces/keywords working, as Column-arithmetic
    // versions did
    val df = Seq(2.0, 4.0).toDF("my col")
    val r = Profiling.profileNumeric(df, Seq("my col")).collect().head
    assert(r.getString(0) == "my col")
    assert(r.getDouble(5) == 3.0) // mean
  }

  test("uniqueViolations and fkViolations surface the violating rows") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "orphan"), (9L, "orphan2"))
      .toDF("k", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val orphans = Profiling.fkViolations(child, parent, Seq("k" -> "pk"))
      .select("k").as[Long].collect().toSeq
    assert(orphans == Seq(9L, 9L))
    val dups = Profiling.uniqueViolations(child, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dups == Map(9L -> 2L))
  }

  test("constraintReport: one row per check, zero and nonzero counts") {
    val df = Seq(1L, 1L, 2L).toDF("k")
    val rep = Profiling.constraintReport(Seq(
        "has_dups" -> Profiling.uniqueViolations(df, Seq("k")),
        "none_negative" -> df.filter(col("k") < 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("has_dups" -> 1L, "none_negative" -> 0L))
  }

  test("correlations: exact ±1 on linear columns, NULL on constant columns") {
    val df = Seq(
      ("g1", 1L, 2L, 3L), ("g1", 2L, 4L, 2L), ("g1", 3L, 6L, 1L),
      ("g2", 5L, 1L, 1L), ("g2", 5L, 2L, 3L))
      .toDF("g", "x", "y", "z")
    val got = Profiling.correlations(df, "g",
        Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map { r => r.getString(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))) }.toMap
    // y = 2x and z = 4 - x in g1: exact ±1.0 (integer stats, exact sqrt);
    // x is constant in g2: NULL, never a 0/0 NaN
    assert(got == Map(
      "g1" -> ((3L, Some(1.0), Some(-1.0), Some(-1.0))),
      "g2" -> ((2L, None, None, Some(1.0)))))
  }

  test("ecdfNormalize: hand-computed percentile ranks, duplicates share one") {
    val df = Seq((1L, 10), (2L, 10), (3L, 20), (4L, 30)).toDF("id", "v")
    val got = Profiling.ecdfNormalize(df, "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.75, 4L -> 1.0))
  }

  test("chi2Cells: zero under exact independence, exact value when skewed") {
    // perfectly independent 2×2: every cell O == E → chi² contribution 0
    val indep = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("b", "y"))
    val g1 = Profiling.chi2Cells(indep.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getAs[Double]("chi2_cell"))
    assert(g1.length == 4 && g1.forall(_ == 0.0))
    // skewed 2×2 (3,1 / 1,3): N=8, marginals all 4, E=2 for every cell,
    // contribution (O−E)²/E = 0.5 each — and expected6 = 4·4/8 = 2.0
    val skew = Seq.fill(3)(("a", "x")) ++ Seq.fill(1)(("a", "y")) ++
      Seq.fill(1)(("b", "x")) ++ Seq.fill(3)(("b", "y"))
    val g2 = Profiling.chi2Cells(skew.toDF("u", "v"), "u", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("expected6"), r.getAs[Double]("chi2_cell"))))
      .toMap
    assert(g2.values.forall(_ == ((2.0, 0.5))), s"got $g2")
  }

  test("countMinSketch: mass conserved per row, estimates never undercount") {
    val docs = Seq(
      (1L, "a a a b c"),
      (2L, "b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    // under-provisioned width ⇒ guaranteed collisions among 26 tokens
    val audit = Profiling.cmsAudit(docs, "text", width = 8, depth = 4, k = 50)
      .collect()
    assert(audit.length == 26)
    assert(audit.forall(_.getAs[Boolean]("no_undercount")))
    val a = audit.map(r => r.getAs[String]("w") ->
      ((r.getAs[Long]("exact_cnt"), r.getAs[Long]("est")))).toMap
    assert(a("a")._1 == 3L && a("b")._1 == 2L && a("z")._1 == 1L)
    assert(audit.exists(r => r.getAs[Long]("est") >
      r.getAs[Long]("exact_cnt")), "width 8 over 26 tokens must collide")
    // every sketch row holds the full token mass (30 tokens)
    val toks = docs.select(explode(split(lower(trim(col("text"))), "\\s+"))
      .as("w")).groupBy("w").agg(count(lit(1)).as("cnt"))
    val rows = Profiling.countMinSketch(toks, "w", col("cnt"), 8, 4)
      .groupBy("j").agg(sum("c").as("mass")).collect()
    assert(rows.length == 4 && rows.forall(_.getAs[Long]("mass") == 30L))
  }

  test("simpsonDiversity: 0 when all-distinct, 1 when constant, exact 6dp") {
    val toks = Seq(
      ("s1", "a"), ("s1", "a"), ("s1", "b"),       // D = 2/6 = 1/3
      ("s2", "p"), ("s2", "q"), ("s2", "r"),       // all distinct ⇒ 0
      ("s3", "x"), ("s3", "x"), ("s3", "x"),       // constant ⇒ 1
      ("s4", "lone")                                // N=1 ⇒ filtered out
    ).toDF("source", "w")
    val got = Profiling.simpsonDiversity(toks, "source", col("w"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("simpson6")))).toMap
    assert(got == Map(
      "s1" -> ((3L, 2L, 0.333333)),
      "s2" -> ((3L, 3L, 0.0)),
      "s3" -> ((3L, 1L, 1.0))), s"got $got")
  }

  test("ksPairs: hand-computed D, 0 for identical, 1 for disjoint") {
    val df = Seq(
      ("a", 1L), ("a", 2L),      // vs b: D = 1/2 at x ∈ {1, 2}
      ("b", 2L), ("b", 3L),
      ("c", 1L), ("c", 2L),      // identical to a ⇒ D = 0
      ("d", 9L), ("d", 10L)      // disjoint from a ⇒ D = 1
    ).toDF("lang", "n_chars")
    val got = Profiling.ksPairs(df, "lang", "n_chars").collect()
      .map(r => (r.getAs[String]("ga"), r.getAs[String]("gb")) ->
        r.getAs[Double]("ks6")).toMap
    assert(got.size == 6)
    assert(got(("a", "b")) == 0.5)
    assert(got(("a", "c")) == 0.0)
    assert(got(("a", "d")) == 1.0)
    assert(got(("b", "c")) == 0.5 && got(("b", "d")) == 1.0 &&
      got(("c", "d")) == 1.0)
  }

  test("mannWhitneyPairs: hand-computed U and tie-corrected z") {
    // pair (a,b): A={1,2,3} < B={4,5,6} → U=0, var=na·nb·(n+1)/12=5.25,
    // z = -4.5/√5.25; pair (c,d): ties — C={1,1,2}, D={1,2,2}: doubled
    // avg ranks 4 and 10 → R_a=9, U=3, T=2·(27−3)=48,
    // var = 0.75·(7 − 48/30) = 4.05, z = -1.5/√4.05
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)) ++
      Seq(1, 1, 2).map(("c", _)) ++ Seq(1, 2, 2).map(("d", _)))
      .toDF("g", "x")
    val got = Profiling.mannWhitneyPairs(df, "g", "x").collect()
      .map(r => (r.getAs[String]("ga"), r.getAs[String]("gb")) ->
        ((r.getAs[Double]("u"), r.getAs[Double]("z6")))).toMap
    assert(got(("a", "b")) == ((0.0, -1.963961)), got.toString)
    assert(got(("c", "d")) == ((3.0, -0.745356)), got.toString)
    assert(got.size == 6)
  }

  test("cmJoinSizeAudit: exact at ample width, one-sided under collisions") {
    // A = {1,1,2,3}, B = {1,2,2,9} on k → exact = 2·1 + 1·2 = 4
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 9L).toDF("k")
    val ample = Profiling.cmJoinSizeAudit(a, b, "k", width = 1024, depth = 4)
      .collect().map(r => (r.getAs[Long]("est_j"), r.getAs[Long]("exact_size")))
    assert(ample.length == 4 && ample.forall(_._2 == 4L), ample.toSeq)
    assert(ample.forall(_._1 == 4L), s"collision-free width must be exact: ${ample.toSeq}")
    val tight = Profiling.cmJoinSizeAudit(a, b, "k", width = 2, depth = 4)
      .collect().map(r => (r.getAs[Long]("est_j"), r.getAs[Boolean]("no_undercount")))
    assert(tight.forall(t => t._1 >= 4L && t._2), s"one-sidedness violated: ${tight.toSeq}")
  }

  test("giniPerGroup: 0 when uniform, (n-1)/n when concentrated, exact ties") {
    val df = (Seq.fill(4)(("u", 4L)) ++ Seq(("s", 0L), ("s", 0L), ("s", 0L),
      ("s", 4L)) ++ Seq(("m", 1L), ("m", 2L), ("m", 3L), ("m", 4L)) ++
      Seq(("t", 1L), ("t", 1L), ("t", 2L)))
      .toDF("g", "x")
    val got = Profiling.giniPerGroup(df, "g", "x").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("gini6")).toMap
    assert(got("u") == 0.0, got.toString)
    assert(got("s") == 0.75, got.toString)      // total concentration: (n-1)/n
    assert(got("m") == 0.25, got.toString)      // 1..4 by hand
    assert(got("t") == 0.166667, got.toString)  // tie-block rank arithmetic
  }

  test("winsorizedStats: exact ceil(qn)-th order-statistic fences and clamped mean") {
    // g1: 1..19 plus a 1000 outlier → fences (1, 19), mean (209)/20
    // g2: 0..38 plus 2000 → k_lo=2 → lo=1, k_hi=38 → hi=37, clamp both ends
    val g1 = (1L to 19L) :+ 1000L
    val g2 = (0L to 38L) :+ 2000L
    val df = (g1.map(("g1", _)) ++ g2.map(("g2", _))).toDF("g", "x")
    val got = Profiling.winsorizedStats(df, "g", "x").collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("lo"), r.getAs[Long]("hi"),
          r.getAs[Double]("wmean6")))).toMap
    assert(got("g1") == ((20L, 1L, 19L, 10.45)), got.toString)
    assert(got("g2") == ((40L, 1L, 37L, 19.45)), got.toString)
  }

  test("skewReport: hand-computed share, gini, and salt recommendation") {
    // counts a:10, b:5, c:1 over 16 rows; 4 partitions → chunk 4 → salt 3
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq("c")).toDF("k")
    val r = Profiling.skewReport(df, col("k"), partitions = 4).collect().head
    assert(r.getAs[Long]("n_rows") == 16L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("top1_count") == 10L)
    assert(r.getAs[Double]("top1_share6") == 0.625)
    // gini of (1,5,10): (2·41 − 4·16)/(3·16) = 18/48
    assert(r.getAs[Double]("gini6") == 0.375, r.toString)
    assert(r.getAs[Int]("salt_factor") == 3, r.toString)
  }

  test("madPerGroup: lower-median and MAD ignore the spike") {
    // A = {1,2,3,4,100}: median 3, deviations {2,1,0,1,97} → MAD 1
    val df = (Seq(1L, 2L, 3L, 4L, 100L).map(("A", _)) ++
      Seq(5L, 5L, 5L).map(("B", _))).toDF("g", "x")
    val got = Profiling.madPerGroup(df, "g", "x").collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("median"), r.getAs[Long]("mad"))))
      .toMap
    assert(got("A") == ((5L, 3L, 1L)), got.toString)
    assert(got("B") == ((3L, 5L, 0L)), got.toString)
  }

  test("theilSenTrend: median pairwise slope, even and odd pair counts") {
    def day(d: Int, k: Int) = Seq.fill(k)(
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00"))
    // entity 1 counts (1,3,2,4) → slopes sorted (-1,.5,.5,1,2,2) → 0.75
    // entity 2 counts (1,2,4)   → slopes (1,1.5,2) → 1.5
    val ev = ((day(1, 1) ++ day(2, 3) ++ day(3, 2) ++ day(4, 4)).map((1L, _)) ++
      (day(1, 1) ++ day(2, 2) ++ day(3, 4)).map((2L, _))).toDF("e", "ts")
    val got = Profiling.theilSenTrend(ev, "e", "ts").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((6L, 0.75)), got.toString)
    assert(got(2L) == ((3L, 1.5)), got.toString)
  }

  test("lagAutocorr: linear ramp gives acf 1; gaps zero-fill over the span") {
    import java.sql.Timestamp
    def t(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d 0$i:00:00")
    // group a: daily counts 1,2,3,4,5 on days 0..4 (perfectly linear);
    // group b: one event on day 0 and day 2 → zero-filled [1,0,1,0,0]
    val rows =
      (0 to 4).flatMap(d => (0 to d).map(i => ("a", t(d, i)))) ++
        Seq(("b", t(0, 0)), ("b", t(2, 0)))
    val got = graft.ext.Profiling
      .lagAutocorr(rows.toDF("g", "ts"), "g", "ts", Seq(1))
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("acf")))).toMap
    assert(got("a")._1 == 4L && got("a")._2 == 1.0, got.toString)
    // b lag-1 pairs: x=[1,0,1,0], y=[0,1,0,0] → cov·n = −2, vx = 4, vy = 3
    assert(got("b")._1 == 4L &&
      got("b")._2 == -2.0 / math.sqrt(4.0 * 3.0), got.toString)
  }

  test("kAnonymityAudit flags small classes with exact 1/n risk") {
    val df = (Seq.fill(12)(("en", "a")) ++ Seq(("de", "b")) ++
      Seq.fill(4)(("fr", "c"))).toDF("lang", "source")
    val got = graft.ext.Profiling.kAnonymityAudit(df, Seq("lang", "source"), 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Boolean]("at_risk"),
          r.getAs[Double]("reident_risk6")))).toMap
    assert(got == Map(
      ("en", "a") -> ((12L, false, 0.083333)),
      ("de", "b") -> ((1L, true, 1.0)),
      ("fr", "c") -> ((4L, true, 0.25))), got.toString)
  }

  test("cupedReadout: theta from pooled stats, adjusted means via algebra") {
    import java.sql.Timestamp
    def t(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d 0$i:00:00")
    // cutover day 15. users 0/2 (variant 0): x=1,y=1 and x=2,y=2;
    // user 1 (variant 1): x=1,y=2. pooled: n=3 sx=4 sy=5 sxx=6 sxy=7
    // → theta = (3·7−4·5)/(3·6−4·4) = 1/2; E[X]=4/3
    // v0: meanY=3/2, adj = 3/2 − ½·(3/2 − 4/3); v1: 2 − ½·(1 − 4/3)
    val rows =
      Seq((0L, t(0, 1)), (0L, t(20, 1))) ++
        Seq((2L, t(0, 1)), (2L, t(1, 1)), (2L, t(20, 1)), (2L, t(21, 1))) ++
        Seq((1L, t(0, 1)), (1L, t(20, 1)), (1L, t(21, 1)))
    val got = graft.ext.Profiling
      .cupedReadout(rows.toDF("user_id", "ts"), "user_id", "ts", 15)
      .collect()
      .map(r => r.getAs[Int]("variant") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("mean_y"),
          r.getAs[Double]("theta"), r.getAs[Double]("mean_y_cuped")))).toMap
    assert(got(0)._1 == 2L && got(0)._2 == 1.5 && got(0)._3 == 0.5, got.toString)
    assert(got(0)._4 == 1.5 - 0.5 * (1.5 - 4.0 / 3.0), got.toString)
    assert(got(1)._1 == 1L && got(1)._2 == 2.0 &&
      got(1)._4 == 2.0 - 0.5 * (1.0 - 4.0 / 3.0), got.toString)
  }

  test("quantileNormalize maps every group onto the pooled distribution") {
    // pooled sorted [1,2,10,20]; both groups' rank-1 → pooled rank 2 (=2),
    // rank-2 → pooled rank 4 (=20): identical marginals after mapping
    val df = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L))
      .toDF("g", "v")
    val got = graft.ext.Profiling.quantileNormalize(df, "g", "v")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        r.getAs[Long]("qnorm")).toMap
    assert(got == Map(
      ("a", 1L) -> 2L, ("a", 2L) -> 20L,
      ("b", 10L) -> 2L, ("b", 20L) -> 20L), got.toString)
  }

  test("fdAudit: held and violated dependencies with exact fan-out") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y"), (3L, "y"), (4L, "z"))
      .toDF("k", "v")
    val got = graft.ext.Profiling.fdAudit(df, Seq("k" -> "v", "v" -> "k"))
      .collect()
      .map(r => r.getAs[String]("fd") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("violating"),
          r.getAs[Long]("max_fanout"), r.getAs[Boolean]("holds")))).toMap
    assert(got("k->v") == ((4L, 0L, 1L, true)), got.toString)
    // v=x maps to keys {1,2} → one violating class, fan-out 2
    assert(got("v->k") == ((3L, 1L, 2L, false)), got.toString)
  }

  test("cusumChangePoint locates a level shift at the scaled-CUSUM apex") {
    import java.sql.Timestamp
    def t(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:${i}%02d:00")
    // daily counts [1, 1, 11, 11]: S=24, D=4 → CUSUM·D over interior days
    // = [-20, -40, -20]; apex |−40| on day index 1
    val rows = Seq(("a", t(0, 1)), ("a", t(1, 1))) ++
      (1 to 11).map(i => ("a", t(2, i))) ++ (1 to 11).map(i => ("a", t(3, i)))
    val r = graft.ext.Profiling
      .cusumChangePoint(rows.toDF("g", "ts"), "g", "ts").collect().head
    assert((r.getAs[Int]("change_day"), r.getAs[Long]("max_abs_cusum_d"),
      r.getAs[Long]("n_days"), r.getAs[Long]("total")) ==
      ((1, 40L, 4L, 24L)), r.toString)
  }

  test("benfordScreen: integer-string digit, cents rounding, zero dropped") {
    // 0.004 rounds to 0 cents and must be excluded; 9.5 → 950 → digit 9;
    // 0.19 → 19 → digit 1 (first digit of the CENTS integer, documented)
    val df = Seq(1.0, 12.5, 0.19, 9.5, 0.004, 250.0).toDF("v")
    val got = graft.ext.Profiling.benfordScreen(df, "v")
      .collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share6")))).toMap
    assert(got == Map(
      1 -> ((3L, 0.6)),  // 100, 1250, 19
      2 -> ((1L, 0.2)),  // 25000
      9 -> ((1L, 0.2))), got.toString)
  }

  /** q216 pins: the gate corpus really is 2²⁰ documents (count prunes the
    * text construction — milliseconds), and a small-width audit over a
    * 256-doc analog of the SAME generator keeps the one-sided guarantee
    * under forced collisions (semantics are q141's, already
    * property-tested; this pins the generator wiring). */
  test("q216: corpus is 2^20 docs; small analog keeps no_undercount under collisions") {
    assert(Profiling.q216Corpus(spark).count() == (1L << 20))
    val rows = Profiling.cmsAudit(
        Profiling.q216Corpus(spark, docs = 256L), "text",
        width = 4, depth = 4, k = 20)
      .collect()
    assert(rows.length == 20, s"expected top-20 of 256 tokens, got ${rows.length}")
    assert(rows.forall(_.getAs[Boolean]("no_undercount")),
      rows.filterNot(_.getAs[Boolean]("no_undercount")).mkString(", "))
    // width 4 over 256 tokens: the pigeonhole guarantees real collisions,
    // so at least one estimate must strictly overshoot its exact count
    assert(rows.exists(r => r.getAs[Long]("est") > r.getAs[Long]("exact_cnt")),
      "no collision overshoot — the under-provisioned width is not biting")
  }

  test("q243 small analog: every planted hazard lane profiles exactly — " +
      "nulls counted, zero variance is 0.0, the all-NULL column stays NULL") {
    val got = Profiling.profileNumeric(
        Profiling.q243Frame(spark, 64L), Profiling.q243Cols)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 8)
    val p1 = got("p1")
    assert(p1.getLong(1) == 64L && p1.getLong(2) == 0L)
    assert(p1.getDouble(3) == 0.0 && p1.getDouble(4) == 63.0)
    assert(p1.getDouble(5) == 31.5) // 2016/64, decimal-exact half-up
    // population variance of 0..63 uniform = (64^2 - 1)/12 = 341.25
    val expStd = BigDecimal(math.sqrt(341.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p1.getDouble(6) == expStd, s"p1 stddev ${p1.getDouble(6)}")
    val p3 = got("p3") // ids 0,7,...,63 are NULL: 10 of 64
    assert(p3.getLong(1) == 54L && p3.getLong(2) == 10L)
    val p7 = got("p7") // constant column: exactly zero dispersion
    assert(p7.getDouble(5) == 42.0 && p7.getDouble(6) == 0.0)
    val p8 = got("p8") // all-NULL column: no fabricated statistics
    assert(p8.getLong(1) == 0L && p8.getLong(2) == 64L)
    assert(p8.isNullAt(3) && p8.isNullAt(4) && p8.isNullAt(5) &&
      p8.isNullAt(6))
    val p4 = got("p4") // 0.25-step doubles: binary-exact min/max/mean
    assert(p4.getDouble(3) == 0.0 && p4.getDouble(4) == 15.75)
    assert(p4.getDouble(5) == 7.875)
  }

  test("q243 synthetic frame is at the claimed scale and p5 crosses zero") {
    val f = Profiling.q243Frame(spark)
    assert(f.count() == (1L << 20))
    // the signed decRatio6 lane is only load-bearing if p5 goes negative
    assert(f.agg(min(col("p5"))).head.getLong(0) == 500000L - 1048575L)
  }

  test("q270 small analog: the correlation triangle matches a naive " +
      "driver-side co-moment replay bit-for-bit") {
    val rows = 16384L
    def naive(g: Long): (Double, Double, Double) = {
      val rs = (0L until rows / 4).map { j =>
        val x = j % 1000
        (x, 2 * x + (j + g) % 2, 999 - x)
      }
      val n = rs.size.toLong
      def corr(a: Seq[Long], b: Seq[Long]): Double = {
        val (sa, sb) = (a.sum, b.sum)
        val covn = n * a.zip(b).map { case (u, v) => u * v }.sum - sa * sb
        val vx = n * a.map(u => u * u).sum - sa * sa
        val vy = n * b.map(v => v * v).sum - sb * sb
        covn.toDouble / math.sqrt(vx.toDouble * vy.toDouble)
      }
      (corr(rs.map(_._1), rs.map(_._2)), corr(rs.map(_._1), rs.map(_._3)),
        corr(rs.map(_._2), rs.map(_._3)))
    }
    val got = Profiling.q270CorrelationsAtScale0(spark, rows)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    (0L until 4L).foreach { g =>
      val (n, cxy, cxz, cyz) = got(g)
      val (exy, exz, eyz) = naive(g)
      assert(n == rows / 4)
      assert(cxy == exy && cxz == exz && cyz == eyz,
        s"g=$g: ($cxy, $cxz, $cyz) vs ($exy, $exz, $eyz)")
      // z = 999 - x is exactly affine-negative
      assert(math.abs(cxz + 1.0) < 1e-12, s"corr_x_z $cxz")
      assert(cxy > 0.999, s"corr_x_y $cxy")
    }
  }

  test("q270 synthetic frame is at the claimed scale") {
    assert(Profiling.q270Frame(spark).count() == (1L << 20))
  }
}
