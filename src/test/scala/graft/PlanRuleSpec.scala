package graft

import org.apache.spark.sql.functions._
import graft.plans.LevenshteinBandGuard

/** The custom optimizer rule: exactness, idempotence, author-guard
  * respect, and the registered query actually receiving the rewrite. */
class PlanRuleSpec extends GraftSuite {
  import spark.implicits._

  private def naiveLev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  test("q126's join condition carries the band guard and the thresholded DP") {
    val p = ext.Similarity.q126FuzzyPairs(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("abs((length("), "length-band guard missing:\n" + p.take(600))
    assert(p.contains("Some(3)) >= 0"), "threshold push-down missing:\n" + p.take(600))
  }

  test("rewrite is exact: <=, <, reversed forms, nulls, all small bounds") {
    val vocab = Seq("", "a", "ab", "abc", "abd", "abcd", "xyz", "xyzzy",
      "abcdefg", null)
    val pairs = for (a <- vocab; b <- vocab) yield (a, b)
    val df = pairs.toDF("a", "b")
    for (d <- 0 to 3) {
      val expected = pairs.filter { case (a, b) =>
        a != null && b != null && naiveLev(a, b) <= d
      }.toSet
      val gotLe = df.filter(levenshtein(col("a"), col("b")) <= d)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(gotLe == expected, s"<= $d")
      val gotRev = df.filter(lit(d) >= levenshtein(col("a"), col("b")))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(gotRev == expected, s"$d >= lev")
      val gotLt = df.filter(levenshtein(col("a"), col("b")) < d + 1)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(gotLt == expected, s"< ${d + 1}")
    }
  }

  test("rule is idempotent and leaves an author-written band alone") {
    val base = Tables.part(spark, sf)
      .select(lower(col("p_name")).as("n1"),
        lower(substring(col("p_name"), 2, 100)).as("n2"))
    val plain = base.filter(levenshtein(col("n1"), col("n2")) <= 2)
      .queryExecution.analyzed
    val once = LevenshteinBandGuard(plain)
    val twice = LevenshteinBandGuard(once)
    assert(once != plain, "rule did not fire on the plain predicate")
    assert(twice.fastEquals(once), "rule is not idempotent")
    // an author-written length band for the same pair suppresses the
    // rewrite entirely — the hand guard wins
    val guarded = base.filter(
        abs(length(col("n1")) - length(col("n2"))) <= 2 &&
          levenshtein(col("n1"), col("n2")) <= 2)
      .queryExecution.analyzed
    assert(LevenshteinBandGuard(guarded).fastEquals(guarded),
      "rule rewrote a condition that already carries a band guard")
  }
}
