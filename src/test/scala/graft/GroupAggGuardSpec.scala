package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-lint guard closing the unbounded-group-materialization bug
  * class, the fourth sibling of [[BroadcastGuardSpec]] /
  * [[WindowGuardSpec]] / [[CollectGuardSpec]]: a `collect_list` /
  * `collect_set` buffers an entire key group into ONE aggregation row —
  * if the group is corpus-scaled (a hot key, a stopword's postings, a
  * per-source rollup), that single row grows with the data and the task
  * that builds it OOMs at 100 TB no matter how many executors exist.
  * Local-scale tests can never catch this: every group is small at sf0.01.
  *
  * Rule: every `collect_list(` / `collect_set(` call under `src/main`
  * must carry a `groupagg-ok: <reason>` comment on the same line or
  * within the three preceding lines, stating WHY the group is bounded —
  * doc-sized (grouped by a document/order key, so the buffer is one
  * document's content), a fixed constant (dims, buckets, filter words),
  * an enum-bounded label, a documented-contract shape (posting lists,
  * exact-percentile semantics), or a test-sf fixture payload. A new call
  * without an annotation fails this spec, so the bounded-group claim is
  * made — and reviewed — explicitly at every site.
  */
class GroupAggGuardSpec extends AnyFunSuite {

  private val calls = Seq("collect_list(", "collect_set(")

  test("every collect_list/collect_set in src/main carries a groupagg-ok " +
      "bounded-group rationale") {
    val violations = GuardLint.violations(
      l => calls.exists(l.contains), "groupagg-ok:")
    assert(violations.isEmpty,
      "group-materializing aggregate without a groupagg-ok annotation " +
        "(state why the key group is bounded — doc-sized key, fixed " +
        "constant, enum label, documented contract):\n" +
        violations.mkString("\n"))
  }

  test("the lint is not vacuous: it sees the known annotated sites") {
    val annotated = GuardLint.annotationCount("groupagg-ok:")
    assert(annotated >= 17,
      s"expected >= 17 groupagg-ok annotations in src/main, found " +
        s"$annotated — if sites were legitimately removed, update this " +
        "count so the guard keeps teeth")
  }
}
