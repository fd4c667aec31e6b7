package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-lint guard closing the driver-side-materialization bug class,
  * the third sibling of [[BroadcastGuardSpec]] and [[WindowGuardSpec]]:
  * a `.collect()` / `.head()` / `.first()` on a data-scaled frame pulls
  * the corpus onto the driver — the "if you're iterating over collect()
  * results, the operator isn't distributed" failure that no local-scale
  * test can catch.
  *
  * Rule: every DataFrame action of those three forms under `src/main`
  * must carry a `collect-ok: <reason>` comment on the same line or
  * within the three preceding lines, stating WHY the collected frame is
  * driver-sized — a 1-row aggregate (convergence probe, halt vote,
  * min/max bounds), a `limit(k)`, or a per-file manifest with a bounded
  * file count. A new action without an annotation fails this spec, so
  * the driver-sized claim is made — and reviewed — explicitly at every
  * site. (`.count()` is exempt: it returns a scalar by construction.)
  */
class CollectGuardSpec extends AnyFunSuite {

  private val action = Seq(".collect()", ".head()", ".first()")

  test("every driver-side action in src/main carries a collect-ok " +
      "driver-sized rationale") {
    val violations = GuardLint.violations(
      l => action.exists(l.contains), "collect-ok:")
    assert(violations.isEmpty,
      "driver-side action without a collect-ok annotation (state why " +
        "the frame is driver-sized — 1-row aggregate, limit(k), bounded " +
        "manifest — or restructure so the data stays distributed):\n" +
        violations.mkString("\n"))
  }

  test("the guard itself sees the existing annotated sites (not vacuous)") {
    val n = GuardLint.annotationCount("collect-ok:")
    assert(n >= 6, s"expected the audited annotation corpus, found $n")
  }
}
