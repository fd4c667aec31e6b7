package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-lint guard closing the cartesian-product bug class, fourth
  * sibling of [[BroadcastGuardSpec]] / [[WindowGuardSpec]] /
  * [[CollectGuardSpec]]: a `crossJoin` whose BOTH sides scale with the
  * data is O(n²) rows — harmless on a test corpus, non-terminating at
  * 100 TB.
  *
  * Rule: every `crossJoin(` call site under `src/main` must either take
  * an inline `broadcast(...)` argument (those are 1-row/fixed-size
  * scalar-attach joins, each already forced to carry a `bcast-ok:` size
  * rationale by BroadcastGuardSpec) or carry a `cross-ok: <reason>`
  * comment on the same line or within the three preceding lines stating
  * why at least one side is bounded — a pre-broadcast fixed frame (the
  * hyperplane list), an enum-bounded fixture. A new unannotated
  * cartesian fails this spec.
  */
class CrossJoinGuardSpec extends AnyFunSuite {

  test("every crossJoin in src/main is broadcast-scalar or carries a " +
      "cross-ok boundedness rationale") {
    val violations = GuardLint.violations(
      l => l.contains("crossJoin(") && !l.contains("crossJoin(broadcast("),
      "cross-ok:")
    assert(violations.isEmpty,
      "crossJoin that is neither crossJoin(broadcast(...)) nor " +
        "cross-ok-annotated (state why a side is bounded, or use an " +
        "equi/range join):\n" + violations.mkString("\n"))
  }

  test("the guard itself sees the existing annotated sites (not vacuous)") {
    val n = GuardLint.annotationCount("cross-ok:")
    assert(n >= 4, s"expected the audited annotation corpus, found $n")
  }
}
