package graft

import org.apache.spark.sql.functions._
import graft.ext.Versioning

class VersioningSpec extends GraftSuite {
  import spark.implicits._

  test("upsert replaces matched keys, appends new ones, keeps the rest") {
    val current = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "v", "n")
    val updates = Seq((2L, "B2", 21), (9L, "new", 90)).toDF("id", "v", "n")
    val out = Versioning.upsert(current, updates, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set((1L, "a", 10), (2L, "B2", 21), (3L, "c", 30),
      (9L, "new", 90)))
  }

  test("upsert refuses mismatched column sets loudly") {
    val current = Seq((1L, "a")).toDF("id", "v")
    val updates = Seq((1L, "a", 1)).toDF("id", "v", "extra")
    intercept[IllegalArgumentException](
      Versioning.upsert(current, updates, Seq("id")))
  }

  test("snapshot diff labels all four statuses, null-safely") {
    val prev = Seq(
      (1L, Some("same"), 1), (2L, Some("old"), 2),
      (3L, Some("gone"), 3), (5L, None: Option[String], 5))
      .toDF("id", "v", "n")
    val next = Seq(
      (1L, Some("same"), 1), (2L, Some("new"), 2),
      (4L, Some("born"), 4), (5L, None: Option[String], 5))
      .toDF("id", "v", "n")
    val out = Versioning.snapshotDiff(prev, next, Seq("id"), Seq("v", "n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("q80 derivation: refresh shows changed and added, never removed") {
    val statuses = Versioning.q80SnapshotDiff(spark, sf)
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.contains("changed") && statuses.contains("added"))
    assert(!statuses.contains("removed"))
    val docs = Tables.documents(spark, sf)
    assert(statuses("changed") ==
      docs.filter(pmod(col("doc_id"), lit(7)) === 0).count())
    assert(statuses("added") ==
      docs.filter(pmod(col("doc_id"), lit(13)) === 0).count())
  }

  test("scd2 collapses runs into validity intervals with one open row") {
    import java.sql.Timestamp
    def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    // user 1: login,login,buy,login → login[10,30) buy[30,40) login[40,∞);
    // user 2: a single event → one open interval
    val events = Seq(
      (1L, ts(10), "login", 100L), (1L, ts(20), "login", 101L),
      (1L, ts(30), "buy", 102L), (1L, ts(40), "login", 103L),
      (2L, ts(99), "browse", 104L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Versioning.scd2(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(4)) ->
        (r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(5)))
      .toMap
    val us = 1000000L
    assert(got == Map(
      (1L, 1L) -> (("login", 10 * us, 30 * us, false)),
      (1L, 2L) -> (("buy", 30 * us, 40 * us, false)),
      (1L, 3L) -> (("login", 40 * us, -1L, true)),
      (2L, 1L) -> (("browse", 99 * us, -1L, true))))
  }

  test("deltaMaintainAgg equals a full recompute; drained groups vanish") {
    import spark.implicits._
    val base = Seq(("a", 10), ("a", 20), ("b", 5)).toDF("k", "v")
    val inserts = Seq(("a", 1), ("c", 7)).toDF("k", "v")
    // retract one of a's rows AND b's only row — b must leave the state
    val retracts = Seq(("a", 20), ("b", 5)).toDF("k", "v")
    val got = Versioning.deltaMaintainAgg(
        Versioning.aggState(base, Seq("k"), "v"), inserts, retracts,
        Seq("k"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // recompute over base ∪ inserts minus the retracted multiset
    assert(got == Map("a" -> ((2L, 11L)), "c" -> ((1L, 7L))))
  }

  test("tableChecksum: order-invariant, divergence-localizing, null-safe") {
    import spark.implicits._
    val rows = Seq((1L, "g1", "x"), (2L, "g1", "y"), (3L, "g2", null))
    val a = rows.toDF("id", "g", "v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Versioning.tableChecksum(df, "g", Seq("id", "v"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val base = sums(a)
    // row order / partitioning must not matter
    assert(sums(a.repartition(7).sortWithinPartitions(col("v"))) == base)
    // a single changed value diverges ONLY its group's checksum
    val b = sums(Seq((1L, "g1", "x"), (2L, "g1", "Y"), (3L, "g2", null))
      .toDF("id", "g", "v"))
    assert(b("g1") != base("g1") && b("g2") == base("g2"))
    // NULL and the string sentinel must not collide with a real value
    val c = sums(Seq((1L, "g1", "x"), (2L, "g1", "y"), (3L, "g2", ""))
      .toDF("id", "g", "v"))
    assert(c("g2") != base("g2"),
      "null sentinel collided — acceptable only under the documented contract")
  }

  test("snapshotDiffExplain names exactly the changed columns, in order") {
    val prev = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "t", "n")
    val next = Seq((1L, "a", 10L), (2L, "B", 21L), (3L, "c", 31L))
      .toDF("id", "t", "n")
    val got = Versioning.snapshotDiffExplain(prev, next, Seq("id"),
        Seq("t", "n"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        r.getAs[scala.collection.Seq[String]]("changed_cols")).toMap
    assert(got == Map(2L -> Seq("t", "n"), 3L -> Seq("n")), got.toString)
  }

  test("vacuumPlan: live never reclaimed, watermark splits retained/reclaimable") {
    val log = Seq(("k1", 0), ("k1", 1), ("k1", 2), ("k2", 0))
      .toDF("key", "version")
    val got = Versioning.vacuumPlan(log, Seq("key"), "version", watermark = 1L)
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Int]("version")) ->
        r.getAs[String]("status")).toMap
    assert(got == Map(
      ("k1", 0) -> "reclaimable", // superseded by v1 ≤ watermark
      ("k1", 1) -> "retained",    // superseded by v2 > watermark
      ("k1", 2) -> "live",
      ("k2", 0) -> "live"), got.toString)
  }

  /** q218 pin, small analog (8 entities × 512 observations): entity u's
    * state changes exactly every (u mod 7)+2 observations, so the SCD2
    * version count is the closed form ceil(512 / ((u mod 7)+2)) and
    * exactly one version per entity is current. */
  test("q218 small analog: version counts match the closed form, one current each") {
    val users = 8L
    val obs = 512L
    val got = Versioning.scd2(
        Versioning.q218Events(spark, rows = users * obs, users = users),
        "user_id", "state", "ts", "event_id")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        sum(col("is_current").cast("long")).as("n_current"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_versions"),
        r.getAs[Long]("n_current"))).toSet
    val expected = (0L until users).map { u =>
      val d = u % 7 + 2
      (u, (obs + d - 1) / d, 1L)
    }.toSet
    assert(got == expected,
      s"diff: ${(got -- expected).take(3)} / ${(expected -- got).take(3)}")
  }

  test("q218 full history is 2^20 observations") {
    assert(Versioning.q218Events(spark).count() == (1L << 20))
  }

  test("q242 small analog: update wave straddles the base — replaced keys " +
      "carry the new value, appended keys arrive, untouched keys survive") {
    // base 128 rows, wave k = 17m for m < 16: m ≤ 7 lands inside the base
    // (replace), m ≥ 8 beyond it (append) → 128 + 8 rows
    val got = Versioning.q242Merged(spark, base = 128L, wave = 16L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size == 136, s"expected 136 rows, got ${got.size}")
    (0L until 128L).foreach { k =>
      val exp = if (k % 17 == 0) ((5 * k + 1, "upd")) else ((3 * k, "base"))
      assert(got(k) == exp, s"k=$k: got ${got(k)}, expected $exp")
    }
    (8L until 16L).foreach { m =>
      val k = 17 * m
      assert(got(k) == ((5 * k + 1, "upd")), s"appended k=$k: got ${got(k)}")
    }
  }

  test("q242 full merge is 2^20 base + 3855 appended keys") {
    assert(Versioning.q242Merged(spark).count() == (1L << 20) + 3855L)
  }

  /** q252 pin, small analog (64 keys + 16 added): every status class lands
    * on its planted residue — including the two distinct 'changed' lanes
    * (v-only at k≡2, cat-only at k≡3: the compare must OR over columns). */
  test("q252 small analog: all four diff statuses on their planted residues") {
    val got = Versioning.q252Diff(spark, keys = 64L, added = 16L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 80, s"expected 80 keys, got ${got.size}")
    (0L until 80L).foreach { k =>
      val exp =
        if (k >= 64) "added"
        else if (k % 16 == 1) "removed"
        else if (k % 16 == 2 || k % 16 == 3) "changed"
        else "unchanged"
      assert(got(k) == exp, s"k=$k: got ${got(k)}, expected $exp")
    }
  }

  test("q252 full diff covers 2^20 + 2^16 keys") {
    assert(Versioning.q252Diff(spark).count() == (1L << 20) + (1L << 16))
  }
}
