package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout — the storage-side half of shuffle avoidance.
  *
  * Two tables bucketed (and sorted) on the same join key with the same
  * bucket count join with NO exchange: each scan is already co-partitioned
  * by bucket, so the sort-merge join runs bucket-to-bucket locally. At
  * 100 TB this converts every recurring fact⋈fact join on the bucket key
  * from a full-cluster shuffle into a per-bucket merge — the one-time
  * shuffle is paid at write time, amortized over every subsequent query.
  * (The reference's closest idea is its app-chosen partition label,
  * `examples/wordcount/wordcount.py:28-37`, which co-locates map output by
  * key range; bucketing is that idea made durable.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val w1 = path.fold(w0)(p => w0.option("path", p)) // external when given
    (if (sortCols.nonEmpty) w1.sortBy(sortCols.head, sortCols.tail: _*) else w1)
      .saveAsTable(table)
  }

  // ------------------------------------------------------- z-order layout

  /** The classic 16-bit Morton spread mask/shift ladder — one (shift,
    * mask) pair per step, shared verbatim by the Column chain and the
    * oracle SQL generator so the two engines compute from the same
    * constants by construction. */
  private val spreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Low 16 bits of `x`, spread so bit i lands at position 2i. */
  private def spread16(x: Column): Column =
    spreadSteps.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (a, (s, m)) => (a.bitwiseOR(shiftleft(a, s))).bitwiseAND(lit(m))
    }

  private[graft] def spread16Sql(x: String): String =
    spreadSteps.foldLeft(s"(CAST($x AS BIGINT) & 65535)") {
      case (a, (s, m)) => s"(($a | ($a << $s)) & $m)"
    }

  /** Z-order (Morton) value of two dimension columns, each quantized to
    * its low 16 bits: interleaves the bits so records close in BOTH
    * dimensions are close in one scalar sort key. */
  def zValue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  private[graft] def zValue16Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  // ------------------------------------------------------ hilbert layout

  /** Hilbert-curve index of `(x, y)`, each quantized to its low `bits`
    * bits — the locality-superior alternative to [[zValue16]]: consecutive
    * Hilbert values are ALWAYS adjacent cells (unit Manhattan step), where
    * the Morton curve takes long diagonal jumps at power-of-two
    * boundaries, so equal-size Hilbert buckets cover tighter (x, y)
    * rectangles and a range predicate on either dimension prunes more
    * files (`HilbertSpec` pins the bijection + unit-step property
    * exhaustively, and the jump-count advantage over Morton, on a full
    * small grid). Delta Lake's OPTIMIZE chose the same curve for the same
    * reason.
    *
    * Shape: the classic per-bit fold (quadrant digit + reflect/swap
    * rotation), unrolled at plan-build time into `bits` chained
    * projections with the rotation state (`_hx`, `_hy`) and the quadrant
    * digits (`_rx`, `_ry`) materialized as per-step columns — each alias
    * is referenced several times by the next step, which keeps
    * CollapseProject from inlining the chain into an exponential
    * expression tree, and whole-stage codegen fuses the chain back into
    * one pass per row. All integer arithmetic; the oracle generator
    * [[hilbertSqlCtes]] unrolls the identical constants. */
  def withHilbert(df: DataFrame, x: Column, y: Column, out: String,
                  bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 16, s"hilbert bits out of [1,16]: $bits")
    val n = 1L << bits
    val init = df
      .withColumn("_hx", x.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("_hy", y.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("_hd", lit(0L))
    val stepped = (bits - 1 to 0 by -1).foldLeft(init) { (d, k) =>
      val s = 1L << k
      d.withColumn("_rx",
          when(col("_hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("_ry",
          when(col("_hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("_hd", col("_hd") +
          lit(s * s) * (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        // reflect (rx=1: mirror both axes) then swap — but only in the
        // lower half (ry=0); computed from the PRE-update _hx/_hy, which
        // is why the new values land in fresh selects via a struct swap
        .withColumn("_nx",
          when(col("_ry") === 0,
            when(col("_rx") === 1, lit(n - 1) - col("_hy"))
              .otherwise(col("_hy"))).otherwise(col("_hx")))
        .withColumn("_ny",
          when(col("_ry") === 0,
            when(col("_rx") === 1, lit(n - 1) - col("_hx"))
              .otherwise(col("_hx"))).otherwise(col("_hy")))
        .withColumn("_hx", col("_nx")).withColumn("_hy", col("_ny"))
    }
    stepped.withColumn(out, col("_hd"))
      .drop("_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny")
  }

  /** CTE chain computing the identical Hilbert fold in DuckDB SQL —
    * generated from the same loop bounds and constants as [[withHilbert]],
    * so the two engines cannot drift. Emits CTEs `h{bits}` … `h0`; the
    * final `h0` holds `carry` plus the index as `hd`. NOTE: DuckDB's `^`
    * is POWER, so the quadrant digit uses `xor()`. */
  private[graft] def hilbertSqlCtes(base: String, carry: Seq[String],
                                    x: String, y: String,
                                    bits: Int = 16): String = {
    val n = 1L << bits
    val cols = carry.mkString(", ")
    val init = s"""h$bits AS (
      SELECT $cols, (CAST($x AS BIGINT) & ${n - 1}) AS hx,
             (CAST($y AS BIGINT) & ${n - 1}) AS hy,
             CAST(0 AS BIGINT) AS hd
      FROM $base)"""
    val steps = (bits - 1 to 0 by -1).map { k =>
      val s = 1L << k
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h$k AS (
      SELECT $cols,
             CASE WHEN $ry = 0 THEN
               (CASE WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END)
             ELSE hx END AS hx,
             CASE WHEN $ry = 0 THEN
               (CASE WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END)
             ELSE hy END AS hy,
             hd + CAST(${s * s} AS BIGINT) * xor(3 * $rx, $ry) AS hd
      FROM h${k + 1})"""
    }
    (init +: steps).mkString(",\n    ")
  }

  /** Balanced binary-search CASE tree mapping `x` to its bucket index
    * (= #boundaries ≤ x) in log₂ comparisons per row, all codegen'd CASE
    * WHEN — no interpreted HOF, no per-row array scan. NULL follows every
    * otherwise-branch down to bucket 0, deterministically. */
  private def bucketOf(x: Column, bounds: IndexedSeq[Double]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2
        when(x >= lit(bounds(mid - 1)), go(mid, hi)).otherwise(go(lo, mid - 1))
      }
    go(0, bounds.length)
  }

  /** Z-order-clustered parquet write: range-partition on the Morton key,
    * sort within each partition, drop the key. Multi-dimensional data
    * skipping at scale: parquet keeps per-row-group min/max for BOTH
    * source dimensions, and because z-neighbors agree on the high bits of
    * both, every file/row-group covers a narrow range of each — so a
    * predicate on EITHER dimension prunes most of a 100 TB table at scan
    * time, where a single-column sort serves only its leading column.
    * The write's one shuffle (the range exchange) is paid once and
    * amortized over every subsequent pruned scan — bucketing's argument,
    * applied to range predicates instead of equi-joins.
    *
    * `normalizeBits` > 0 (the default) rank-normalizes each dimension to
    * 2^bits quantile buckets before interleaving — the Delta-OPTIMIZE-style
    * fix for asymmetric ranges: interleaving RAW values when one column
    * spans 4 bits and the other 20 puts every decisive bit on the wide
    * column and clusters nothing on the narrow one. The boundary probe is
    * one `approx_percentile` aggregate (a write-time planning step, the
    * moral twin of RangePartitioner's sample pass), its ≤2×(2^bits−1)
    * boundaries ship inside the bucket expressions as literals, and the
    * per-row cost is 2×`bits` codegen'd comparisons. Pass 0 to interleave
    * raw low-16-bit values (the [[zValue16]] arithmetic q76's oracle
    * replays). */
  def zOrderWrite(df: DataFrame, path: String, x: Column, y: Column,
                  numFiles: Int, normalizeBits: Int = 6,
                  mode: String = "overwrite"): Unit = {
    require(normalizeBits >= 0 && normalizeBits <= 16,
      s"normalizeBits out of [0,16]: $normalizeBits")
    val z =
      if (normalizeBits == 0) zValue16(x, y)
      else {
        // 6 bits (64 quantile buckets/dim) is deliberate headroom, not a
        // limit: file placement consumes ~log2(numFiles) interleaved bits,
        // so 64 buckets/dim serves up to ~4096 files; the probe accuracy
        // only has to keep bucket POPULATIONS roughly even, so a coarse
        // 2000-sketch beats paying for precision the layout can't use.
        val n = 1 << normalizeBits
        val probs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
        // collect-ok: 1-row aggregate of two fixed-size percentile sketches
        val row = df.agg(
          percentile_approx(x.cast("double"), probs, lit(2000)).as("bx"),
          percentile_approx(y.cast("double"), probs, lit(2000)).as("by")).head()
        // empty input (or an all-null dimension) yields NULL boundary
        // arrays; empty bounds make bucketOf a constant 0, so the write
        // degrades to a single-bucket layout instead of an NPE
        def bounds(i: Int): IndexedSeq[Double] =
          if (row.isNullAt(i)) IndexedSeq.empty
          else row.getSeq[Double](i).toIndexedSeq
        spread16(bucketOf(x.cast("double"), bounds(0)))
          .bitwiseOR(shiftleft(spread16(bucketOf(y.cast("double"), bounds(1))), 1))
      }
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(mode).parquet(path)
  }

  // --------------------------------------------------------------- queries

  // --- q71_bucketed_join: co-located fact⋈fact through the bucket layout --
  /** Round-trips the layout the object exists for: lineitem and orders
    * written bucketed+sorted on the order key (pruned to the columns the
    * query needs), joined bucket-to-bucket, aggregated. The oracle computes
    * the same aggregate from the ORIGINAL parquet — so a row lost or
    * duplicated anywhere in the bucketed write/read/join path fails the
    * hash. The no-Exchange property of the join is pinned separately by
    * `BucketingSpec` (a plan assertion has no SQL oracle). Scratch
    * placement follows q58's GRAFT_SCRATCH_DIR contract: must be a shared
    * filesystem on a real cluster; the local default serves the
    * single-JVM harness. */
  def q71BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val scratch = Sink.scratchPath("graft_bucketed", dir)
    writeBucketed(graft.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity"),
      "g_lineitem_bkt", "l_orderkey", buckets = 8,
      sortCols = Seq("l_orderkey"), path = Some(s"$scratch/lineitem"))
    writeBucketed(graft.Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderpriority"),
      "g_orders_bkt", "o_orderkey", buckets = 8,
      sortCols = Seq("o_orderkey"), path = Some(s"$scratch/orders"))
    spark.table("g_lineitem_bkt")
      .join(spark.table("g_orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.Relational.dsum(col("l_quantity")).as("sum_qty"))
  }

  val q71BucketedJoinSql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           ${graft.ops.Relational.dsumSql("l_quantity")} AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority"""

  // --- q76_zorder: Morton-clustered write → read → z-bucket aggregate -----
  /** Round-trips events through [[zOrderWrite]] on (user_id, event_id),
    * then recomputes the Morton key on the read-back rows and aggregates
    * per high-byte z-bucket. The oracle replays the identical mask/shift
    * ladder (generated from the same constants) straight from the source
    * parquet — so a row lost by the clustered write, OR any bit-arithmetic
    * divergence in the interleave, fails the hash. File-level clustering
    * quality (per-file spread of both dimensions vs an unclustered write)
    * is a physical property with no SQL oracle; `BucketingSpec` pins it. */
  def q76Zorder(spark: SparkSession, dir: String): DataFrame = {
    val scratch = Sink.scratchPath("graft_zorder", dir)
    zOrderWrite(graft.Tables.events(spark, dir)
        .select("event_id", "user_id", "value"),
      scratch, col("user_id"), col("event_id"), numFiles = 8)
    spark.read.parquet(scratch)
      .withColumn("zv", zValue16(col("user_id"), col("event_id")))
      .groupBy(shiftright(col("zv"), 16).as("zbucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("zv")).as("min_zv"), max(col("zv")).as("max_zv"),
        graft.ops.Relational.dsum(col("value")).as("sum_value"))
  }

  val q76ZorderSql: String = s"""
    WITH z AS (SELECT value, ${zValue16Sql("user_id", "event_id")} AS zv
               FROM events)
    SELECT (zv >> 16) AS zbucket, COUNT(*) AS n_events,
           MIN(zv) AS min_zv, MAX(zv) AS max_zv,
           ${graft.ops.Relational.dsumSql("value")} AS sum_value
    FROM z GROUP BY 1"""

  // --- q132_hilbert: Hilbert-clustered write → read → h-bucket aggregate --
  /** q76's round-trip discipline on the Hilbert curve: cluster events by
    * [[withHilbert]] on (user_id, event_id), write range-partitioned on
    * the index, read back, recompute the index from the read rows, and
    * aggregate per high-16-bit Hilbert bucket. The oracle unrolls the
    * identical 16-step fold straight from the source parquet — one wrong
    * rotation, reflection constant, or quadrant digit anywhere in the 16
    * steps lands every row in a different bucket and fails the hash. */
  def q132Hilbert(spark: SparkSession, dir: String): DataFrame = {
    val scratch = Sink.scratchPath("graft_hilbert", dir)
    withHilbert(graft.Tables.events(spark, dir)
        .select("event_id", "user_id", "value"),
      col("user_id"), col("event_id"), "_hv")
      .repartitionByRange(8, col("_hv"))
      .sortWithinPartitions("_hv")
      .drop("_hv")
      .write.mode("overwrite").parquet(scratch)
    withHilbert(spark.read.parquet(scratch),
      col("user_id"), col("event_id"), "hv")
      .groupBy(shiftright(col("hv"), 16).as("hbucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("hv")).as("min_hv"), max(col("hv")).as("max_hv"),
        graft.ops.Relational.dsum(col("value")).as("sum_value"))
  }

  val q132HilbertSql: String = s"""
    WITH ${hilbertSqlCtes("events", Seq("value"), "user_id", "event_id")}
    SELECT (hd >> 16) AS hbucket, COUNT(*) AS n_events,
           MIN(hd) AS min_hv, MAX(hd) AS max_hv,
           ${graft.ops.Relational.dsumSql("value")} AS sum_value
    FROM h0 GROUP BY 1"""

  // --- q98_zonemap: min/max pruning manifest ------------------------------
  /** Zone-map manifest: per-zone (a fixed key range — the logical stand-in
    * for one file or row group) min/max/count statistics over a measure,
    * plus the pruning DECISION a scan planner would take for a given range
    * predicate: `scan_needed = max ≥ lo AND min ≤ hi`. This is the
    * file-skipping arithmetic behind parquet row-group stats and
    * Iceberg/Delta manifests, expressed as data so an auditor can verify
    * which zones a predicate touches. One scan, one map-side-partial
    * groupBy on the zone key — at 100 TB this runs as a metadata pass
    * whose output is ~(rows / zoneSize) rows.
    *
    * @param zoneSize  rows-per-zone granularity (key `div` zoneSize)
    * @param lo,hi     the range predicate being planned
    */
  def zoneMapStats(df: DataFrame, key: String, measure: String,
                   zoneSize: Long, lo: Double, hi: Double): DataFrame =
    df.groupBy(expr(s"$key div $zoneSize").as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(measure)).as("min_m"), max(col(measure)).as("max_m"))
      .withColumn("scan_needed",
        col("max_m") >= lo && col("min_m") <= hi)

  def q98Zonemap(spark: SparkSession, dir: String): DataFrame =
    zoneMapStats(graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity")),
      "l_orderkey", "l_quantity", zoneSize = 4096L, lo = 45.0, hi = 50.0)

  val q98ZonemapSql: String = """
    SELECT l_orderkey // 4096 AS zone, COUNT(*) AS n_rows,
           MIN(l_quantity) AS min_m, MAX(l_quantity) AS max_m,
           (MAX(l_quantity) >= 45.0 AND MIN(l_quantity) <= 50.0)
             AS scan_needed
    FROM lineitem GROUP BY 1"""

  // --- q110_pruned_read: manifest-driven file skipping, end to end --------
  /** The data-skipping loop CLOSED. q98 computes the pruning arithmetic as
    * data; this query acts on it against real files: write a
    * range-clustered copy (`repartitionByRange` on the filter key, so
    * each of the 8 files carries a tight, disjoint [min,max]), build the
    * per-file min/max manifest, answer a range query by OPENING ONLY the
    * surviving files, and hash-match the result against the oracle's
    * full-scan filter — a file the manifest skipped provably held no
    * qualifying row, which is the correctness contract behind
    * Delta/Iceberg data skipping.
    *
    * The query range [30%, 40%] of the keyspace is derived from min/max
    * with exact integer arithmetic mirrored in the oracle, so both
    * engines filter the identical key interval at any scale factor; the
    * `pruned` column certifies the skip actually happened (some file was
    * NOT opened). Driver-side steps are planning metadata only — the
    * 8-row manifest and the 2-value key bounds (like z-order's boundary
    * probe); at 100 TB both live in the table format's stats, written
    * once at ingest, and the surviving-file list feeds the scan planner
    * the same way. */
  def q110PrunedRead(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
    val scratch = Sink.scratchPath("graft_prune", dir)
    li.repartitionByRange(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(scratch)
    // collect-ok: 1-row min/max aggregate
    val bounds = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    // truncating long division == DuckDB's floor `//` here: all positive
    val lo = mn + 3L * (mx - mn) / 10L
    val hi = mn + 4L * (mx - mn) / 10L
    val manifest = spark.read.parquet(scratch)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("l_orderkey")).as("f_lo"), max(col("l_orderkey")).as("f_hi"))
      // collect-ok: one row per written file (8 by construction) — the
      // zone-map manifest a real lakehouse keeps in table metadata
      .collect()
    val files = manifest.filter(r => r.getLong(2) >= lo && r.getLong(1) <= hi)
      .map(_.getString(0))
    val pruned = files.length < manifest.length
    spark.read.parquet(files.toIndexedSeq: _*)
      .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        graft.ops.Relational.dsum(col("l_extendedprice")).as("sum_price"))
      .withColumn("pruned", lit(pruned))
  }

  val q110PrunedReadSql: String = s"""
    WITH b AS (SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
               FROM lineitem)
    SELECT l_returnflag, COUNT(*) AS n_rows,
           ${graft.ops.Relational.dsumSql("l_extendedprice")} AS sum_price,
           TRUE AS pruned
    FROM lineitem, b
    WHERE l_orderkey >= mn + (3 * (mx - mn)) // 10
      AND l_orderkey <= mn + (4 * (mx - mn)) // 10
    GROUP BY 1"""

  // --- q238_hilbert_atscale: the 16-step curve fold at 2^20 points ---------
  /** At-scale correctness coverage for [[withHilbert]] — q132 folds ~30k
    * events; this replays the full 16-step reflect/swap fold over 2²⁰
    * range-synthesized points spread across the whole 65,536² grid
    * (`x = 37·i mod 2¹⁶`, `y = 101·i mod 2¹⁶` — coprime strides, so both
    * coordinates sweep every residue and all 32 rx/ry branches fire at
    * volume). Every step is integer bit arithmetic, so the DuckDB oracle
    * replays the identical generated per-step CTE chain over the same
    * range generator — bit-for-bit, no rounding anywhere. Output: 1024
    * curve-bucket rollups (hd ≫ 22) whose exact id sums pin every
    * point's full 32-bit curve position. */
  private[graft] val q238Points = 1L << 20

  private[graft] def q238Frame(spark: SparkSession,
                               points: Long = q238Points): DataFrame =
    spark.range(points).select(col("id").as("pid"),
      pmod(col("id") * 37, lit(65536L)).as("x"),
      pmod(col("id") * 101, lit(65536L)).as("y"))

  def q238HilbertAtScale(spark: SparkSession, dir: String): DataFrame =
    withHilbert(q238Frame(spark), col("x"), col("y"), "hv")
      .groupBy(shiftright(col("hv"), 22).as("hbucket"))
      .agg(count(lit(1)).as("n_points"), sum(col("pid")).as("sum_pids"),
        min(col("hv")).as("min_hv"), max(col("hv")).as("max_hv"))

  private[graft] def q238OracleSql(points: Long = q238Points): String = s"""
    WITH ${hilbertSqlCtes(
      s"""(SELECT u.i AS pid, (u.i * 37) % 65536 AS x,
                 (u.i * 101) % 65536 AS y
          FROM range(0, $points) AS u(i)) src""",
      Seq("pid"), "x", "y")}
    SELECT (hd >> 22) AS hbucket, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(pid) AS BIGINT) AS sum_pids,
           MIN(hd) AS min_hv, MAX(hd) AS max_hv
    FROM h0 GROUP BY 1"""

  // --- q239_zorder_atscale: the Morton interleave at 2^20 points ----------
  /** q238's discipline pointed at [[zValue16]] — the OTHER curve: the
    * 5-step spread-shift-mask interleave over the same full-grid corpus
    * (coprime strides, every 16-bit residue in both coordinates, so all
    * mask boundaries fire at volume where q76's corpus stays in the low
    * corner). Pure integer bit arithmetic; the oracle replays the same
    * generated spread expression over the same range generator. Output:
    * 1024 z-bucket rollups whose exact id sums pin every point's full
    * 32-bit Morton position. */
  def q239ZorderAtScale(spark: SparkSession, dir: String): DataFrame =
    q238Frame(spark)
      .withColumn("zv", zValue16(col("x"), col("y")))
      .groupBy(shiftright(col("zv"), 22).as("zbucket"))
      .agg(count(lit(1)).as("n_points"), sum(col("pid")).as("sum_pids"),
        min(col("zv")).as("min_zv"), max(col("zv")).as("max_zv"))

  private[graft] def q239OracleSql(points: Long = q238Points): String = s"""
    WITH src AS (
      SELECT u.i AS pid, (u.i * 37) % 65536 AS x, (u.i * 101) % 65536 AS y
      FROM range(0, $points) AS u(i)),
    z AS (SELECT pid, ${zValue16Sql("x", "y")} AS zv FROM src)
    SELECT (zv >> 22) AS zbucket, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(pid) AS BIGINT) AS sum_pids,
           MIN(zv) AS min_zv, MAX(zv) AS max_zv
    FROM z GROUP BY 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q71_bucketed_join" -> q71BucketedJoin _,
        "q76_zorder" -> q76Zorder _,
        "q132_hilbert" -> q132Hilbert _,
        "q98_zonemap" -> q98Zonemap _,
        "q110_pruned_read" -> q110PrunedRead _,
        "q238_hilbert_atscale" -> q238HilbertAtScale _,
        "q239_zorder_atscale" -> q239ZorderAtScale _)

  def oracles: Map[String, String] =
    Map("q71_bucketed_join" -> q71BucketedJoinSql,
        "q76_zorder" -> q76ZorderSql,
        "q132_hilbert" -> q132HilbertSql,
        "q98_zonemap" -> q98ZonemapSql,
        "q110_pruned_read" -> q110PrunedReadSql,
        "q238_hilbert_atscale" -> q238OracleSql(),
        "q239_zorder_atscale" -> q239OracleSql())
}
