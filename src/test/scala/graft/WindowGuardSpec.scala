package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-lint guard closing the unpartitioned-global-window bug class,
  * mirroring [[BroadcastGuardSpec]]: a `Window.orderBy(...)` with no
  * `partitionBy` funnels the ENTIRE frame through one task (Spark itself
  * warns "No Partition Defined for Window operation"), which is the
  * classic silent single-task sort at 100 TB. The repo's three legitimate
  * sites all operate on frames bounded by construction or by an enforced
  * guard, and each says so in place.
  *
  * Rule: every `Window.orderBy(` call site under `src/main` that does not
  * chain from a `partitionBy` on the same line must carry a
  * `window-ok: <reason>` comment on the same line or within the three
  * preceding lines, stating WHY the windowed frame cannot scale with the
  * data — ≤ `buckets` range slices by construction, an enum-bounded
  * stratum catalog, a raise_error-enforced catalog cap. A new global
  * window without an annotation fails this spec, so the boundedness claim
  * has to be made — and reviewed — explicitly at every site; data-scaled
  * frames get a partitioned window or the rangePrefixSum two-level plan.
  */
class WindowGuardSpec extends AnyFunSuite {

  test("every unpartitioned Window.orderBy in src/main carries a " +
      "window-ok boundedness rationale") {
    val violations = GuardLint.violations(
      l => l.contains("Window.orderBy(") && !l.contains("partitionBy"),
      "window-ok:")
    assert(violations.isEmpty,
      "Window.orderBy without partitionBy and without a window-ok " +
        "annotation (state why the frame is bounded, or partition the " +
        "window / use rangePrefixSum):\n" + violations.mkString("\n"))
  }

  test("the guard itself sees the existing annotated sites (not vacuous)") {
    val n = GuardLint.annotationCount("window-ok:")
    assert(n >= 3, s"expected the audited annotation corpus, found $n")
  }
}
