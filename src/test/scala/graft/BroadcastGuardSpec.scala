package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-lint guard closing the forced-broadcast-of-data-scaled-frames
  * bug class (round-8 verdict: q3 broadcast the full customer table, q134
  * broadcast per-entity degree frames — harmless at test scale, OOM-grade
  * at 100 TB because a hard `broadcast()` hint overrides Catalyst's size
  * check).
  *
  * Rule: every `broadcast(` call site under `src/main` must carry a
  * `bcast-ok: <reason>` comment on the same line or within the three
  * preceding lines, stating WHY the broadcast side cannot scale with the
  * data — a 1-row aggregate, a fixed dim, a fixed-k frame (centroids,
  * sketch cells, hyperplanes, limit(k)), an enum/categorical-bounded
  * frame, a measured size guard (`limit(n+1).count <= n` probe), or a
  * caller knob with a documented contract. A new broadcast without an
  * annotation fails this spec, so the size-boundedness claim has to be
  * made — and reviewed — explicitly at every site; frames that grow with
  * the corpus get no hint and are left to AQE's runtime size check.
  */
class BroadcastGuardSpec extends AnyFunSuite {

  test("every broadcast() hint in src/main carries a bcast-ok size rationale") {
    val violations =
      GuardLint.violations(_.contains("broadcast("), "bcast-ok:")
    assert(violations.isEmpty,
      "broadcast() without a bcast-ok annotation (state why the frame " +
        "cannot scale with the data, or drop the hint and let AQE " +
        "decide):\n" + violations.mkString("\n"))
  }

  test("the guard itself sees the existing annotated sites (not vacuous)") {
    val n = GuardLint.annotationCount("bcast-ok:")
    assert(n >= 60, s"expected the audited annotation corpus, found $n")
  }
}
