package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
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

  private val mainRoot = Paths.get("src/main/scala")

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("every crossJoin in src/main is broadcast-scalar or carries a " +
      "cross-ok boundedness rationale") {
    val violations = scalaFiles(mainRoot).flatMap { p =>
      val lines = Files.readAllLines(p).asScala.toVector
      lines.zipWithIndex.collect {
        case (line, i)
            if line.contains("crossJoin(") &&
              !line.contains("crossJoin(broadcast(") &&
              !line.trim.startsWith("import ") &&
              !line.trim.startsWith("//") &&
              !line.trim.startsWith("*") &&
              !(i - 3 to i).exists(j =>
                j >= 0 && lines(j).contains("cross-ok:")) =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(violations.isEmpty,
      "crossJoin that is neither crossJoin(broadcast(...)) nor " +
        "cross-ok-annotated (state why a side is bounded, or use an " +
        "equi/range join):\n" + violations.mkString("\n"))
  }

  test("the guard itself sees the existing annotated sites (not vacuous)") {
    val n = scalaFiles(mainRoot).map { p =>
      Files.readAllLines(p).asScala.count(_.contains("cross-ok:"))
    }.sum
    assert(n >= 4, s"expected the audited annotation corpus, found $n")
  }
}
