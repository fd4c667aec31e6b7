package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
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

  private val mainRoot = Paths.get("src/main/scala")

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("every broadcast() hint in src/main carries a bcast-ok size rationale") {
    val violations = scalaFiles(mainRoot).flatMap { p =>
      val lines = Files.readAllLines(p).asScala.toVector
      lines.zipWithIndex.collect {
        case (line, i)
            if line.contains("broadcast(") &&
              !line.trim.startsWith("import ") &&
              !line.trim.startsWith("//") &&
              !line.trim.startsWith("*") &&
              !(i - 3 to i).exists(j =>
                j >= 0 && lines(j).contains("bcast-ok:")) =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(violations.isEmpty,
      "broadcast() without a bcast-ok annotation (state why the frame " +
        "cannot scale with the data, or drop the hint and let AQE " +
        "decide):\n" + violations.mkString("\n"))
  }

  test("the guard itself sees the existing annotated sites (not vacuous)") {
    val n = scalaFiles(mainRoot).map { p =>
      Files.readAllLines(p).asScala.count(_.contains("bcast-ok:"))
    }.sum
    assert(n >= 60, s"expected the audited annotation corpus, found $n")
  }
}
