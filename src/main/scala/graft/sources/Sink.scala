package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Result materialization — `TextReduceWriter` parity
  * (`/root/reference/daemons/core/remap.py:178-188`: append `"k,v\n"` rows
  * to `data/<out>/reduce_<partition>`). Spark's writer subsumes it: format
  * choice instead of a writer class, `partitionBy` instead of the
  * per-partition file naming, atomic job commit instead of raw appends.
  * Parquet is the canonical sink (columnar, splittable, statistics);
  * CSV/text exist for interop with the reference's downstream consumers.
  */
object Sink {

  /** Scratch location for round-trip queries: `GRAFT_SCRATCH_DIR` else the
    * JVM tmpdir, suffixed with a sanitized input-dir tag so runs at
    * different scale factors never collide. On a multi-host cluster
    * GRAFT_SCRATCH_DIR must be a SHARED filesystem (HDFS/S3/NFS): a
    * driver-local tmpdir scatters part files across executor-local disks
    * and the read-back sees partial data. The local default serves the
    * single-JVM driver harness. */
  private[graft] def scratchPath(prefix: String, dir: String): String =
    sys.env.getOrElse("GRAFT_SCRATCH_DIR",
      System.getProperty("java.io.tmpdir")) +
      "/" + prefix + "_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil,
                   mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               partitionBy: Seq[String] = Nil,
               mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode).option("header", header.toString)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(path)
  }

  /** The literal `"k,v"` text-line sink of the reference. The caller
    * guarantees keys contain no commas — the same (documented) constraint
    * remap imposes (`remap.py:139`, split on first comma). NULL keys fail
    * loudly at write time: concat_ws silently SKIPS null arguments, so a
    * null key would write the bare value as the whole line and the row
    * would come back masquerading as a different key. */
  def writeKvText(df: DataFrame, keyCol: String, valueCol: String,
                  path: String, mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, raise_error, when}
    val k = when(col(keyCol).isNull,
        raise_error(lit(s"writeKvText: null key in column $keyCol")))
      .otherwise(col(keyCol))
    df.select(concat_ws(",", k, col(valueCol)).as("value"))
      .write.mode(mode).text(path)
  }

  /** Compat reader for the reference's own `"k,json"` line format — the
    * shuffle-run files `TextPartFileReader` consumes (S4,
    * `/root/reference/daemons/core/remap.py:150-170`: split each line on
    * the FIRST comma, `json.loads` the remainder). Lets a user point this
    * engine at data a remap deployment already wrote. The parse is all
    * codegen'd string/JSON expressions — no UDF, splittable like any text
    * scan.
    *
    * @param valueType JSON schema of the value part; remap always writes a
    *                  list, so the default mirrors its `(key, [values])`
    */
  def readKvText(spark: SparkSession, path: String,
                 valueType: DataType = ArrayType(StringType)): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, from_json, substring_index}
    spark.read.text(path).select(
      substring_index(col("value"), ",", 1).as("k"),
      from_json(expr("substring(value, instr(value, ',') + 1)"), valueType)
        .as("values"))
  }

  /** JSON-Lines sink — the lingua franca of LLM training corpora (one JSON
    * object per line, splittable, append-friendly). Spark's json writer IS
    * the jsonl format; this wrapper exists so the engine's sink surface
    * names it explicitly next to parquet/csv/kv-text. */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Schema-first JSONL reader. The schema is REQUIRED, not inferred:
    * inference is a full extra pass over the data (ruinous at 100 TB) and
    * silently widens types on dirty rows; a declared schema keeps the scan
    * single-pass, codegen'd, and lets corrupt lines surface through the
    * standard `_corrupt_record`/mode options instead of changing dtypes. */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  // --------------------------------------------------------------- queries

  // --- q58_kv_roundtrip: K2 writer → S4 compat reader → aggregate ---------
  /** Round-trips the reference's exact output contract: per-lang doc-id
    * lists written as `"k,json(list)\n"` lines ([[writeKvText]], matching
    * `remap.py:178-188`), read back through the compat reader
    * ([[readKvText]], matching `TextPartFileReader` `remap.py:150-170`),
    * then aggregated. The oracle computes the same aggregate straight from
    * the source parquet — so a corrupted write OR parse fails the hash. */
  def q58KvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = graft.Tables.documents(spark, dir)
      .groupBy(col("lang"))
      // groupagg-ok: kv-sink conformance fixture payload (per-lang ids at
      // test sf); the sink contract under test is value-size-agnostic
      .agg(to_json(sort_array(collect_list(col("doc_id").cast("string")))).as("v"))
    val path = scratchPath("graft_kv_roundtrip", dir)
    writeKvText(agg, "lang", "v", path)
    readKvText(spark, path)
      .select(col("k").as("lang"), explode(col("values")).as("d"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("d").cast("long")).as("min_doc"),
        max(col("d").cast("long")).as("max_doc"))
  }

  val q58KvRoundtripSql: String = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY lang"""

  /** ORC sink/source — Spark's other built-in columnar format (predicate
    * pushdown, column pruning, and min/max stripe statistics, same as
    * parquet). Exists so a deployment standardized on ORC (Hive-lineage
    * clusters) can use this engine without a format migration. */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files. THE operational chore of streaming/batch
    * ingest at scale — a crawl drop landing 10k tiny files makes every
    * subsequent scan pay 10k open/footer costs and floods the driver's
    * split enumeration; compaction amortizes that once. File count comes
    * from the actual on-disk byte size (FileSystem listing — metadata
    * only, no data read); the rewrite is one round-robin repartition.
    * Writes to a NEW directory: an in-place rewrite would delete its own
    * input mid-scan. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(conf)
    // compare FILESYSTEM-QUALIFIED paths: a raw string compare lets
    // aliases through (relative vs absolute spelling of one directory)
    // and the overwrite would delete the very directory being scanned;
    // nesting either way is the same self-destruction
    val qIn = fs.makeQualified(p).toString + "/"
    val qOut = fs.makeQualified(
      new org.apache.hadoop.fs.Path(outPath)).toString + "/"
    require(!qIn.startsWith(qOut) && !qOut.startsWith(qIn),
      s"compact: output must be outside the input ($qIn vs $qOut) — " +
        "an in-place or nested rewrite destroys its own input")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    require(nFiles <= Int.MaxValue,
      s"compact: $nFiles target files exceeds Int.MaxValue — raise targetFileBytes")
    spark.read.parquet(inPath)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  // --- q87_compaction: shatter → compact → read-back aggregate ------------
  /** Writes documents as 64 deliberately tiny files, compacts them, and
    * aggregates the compacted copy; the oracle aggregates the SOURCE
    * parquet, so a row lost or duplicated by either rewrite fails the
    * hash. The file-count reduction itself is a physical property pinned
    * by SinkStreamSpec. */
  def q87Compaction(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val shattered = scratchPath("graft_shatter", dir)
    val compacted = scratchPath("graft_compacted", dir)
    graft.Tables.documents(spark, dir)
      .repartition(64).write.mode("overwrite").parquet(shattered)
    compact(spark, shattered, compacted, targetFileBytes = 4L << 20)
    spark.read.parquet(compacted)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("doc_id")).as("n_ids"))
  }

  val q87CompactionSql: String = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(DISTINCT doc_id) AS n_ids
    FROM documents GROUP BY lang"""

  // --- q81_orc_roundtrip: documents → orc → read → aggregate --------------
  /** Same contract as q75 for the ORC path: the oracle aggregates the
    * source parquet, so a row or value lost in the ORC encode/decode
    * fails the hash. (DuckDB cannot read ORC — the oracle deliberately
    * checks the ROUND-TRIP against the source of truth instead.) */
  def q81OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    import org.apache.spark.sql.functions._
    val path = scratchPath("graft_orc_roundtrip", dir)
    writeOrc(docs, path)
    readOrc(spark, path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_text_len"),
        countDistinct(col("text")).as("n_texts"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(col("n_chars")).as("sum_chars"))
  }

  val q81OrcRoundtripSql: String = """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
           COUNT(DISTINCT text) AS n_texts,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source"""

  // --- q75_jsonl_roundtrip: documents → jsonl → read → aggregate ----------
  /** Round-trips the documents table through the JSONL sink/source, then
    * aggregates per language. The oracle computes the same aggregates
    * straight from the source parquet, so any JSON encode/decode infidelity
    * — a mangled escape, a dropped row, a type widened by inference (the
    * reader is schema-first precisely so this can't happen silently) —
    * shifts `sum_text_len`/`n_texts` and fails the hash. */
  def q75JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, dir)
    val path = scratchPath("graft_jsonl_roundtrip", dir)
    writeJsonl(docs, path)
    readJsonl(spark, path, docs.schema)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_text_len"),
        countDistinct(col("text")).as("n_texts"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(col("n_chars")).as("sum_chars"))
  }

  val q75JsonlRoundtripSql: String = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
           COUNT(DISTINCT text) AS n_texts,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang"""

  // --- q125_schema_merge: schema-evolution read across parquet versions ---
  /** The schema-evolution intake path: a corpus written in WAVES whose
    * schemas drifted (an early crawl without `source`/`n_chars`, a later
    * one without `lang`) reads back as ONE frame via `mergeSchema` —
    * missing columns become NULLs, matched by NAME not position. This is
    * the source-side twin of [[graft.ext.Versioning.upsert]]: evolution
    * without a rewrite of the old wave.
    *
    * Scale note: `mergeSchema` performs a footer-schema union across
    * files at planning time — per-FILE cost, not per-row; pushdown and
    * pruning still reach each file with its own physical schema. The
    * oracle reconstructs the same null pattern straight from `documents`,
    * so a column misalignment (the silent positional-union failure mode)
    * breaks the hash. */
  def q125SchemaMerge(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, dir)
    val path = scratchPath("graft_schema_merge", dir)
    // wave 1: the old schema (no source/n_chars); wave 2: the new one
    // (no lang) — written as separate parquet directories under one root
    docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$path/wave1")
    docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$path/wave2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$path/wave1", s"$path/wave2")
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"),
        col("lang"), col("source"), col("n_chars"))
  }

  val q125SchemaMergeSql: String = """
    SELECT doc_id, length(text) AS text_len,
           CASE WHEN doc_id % 2 = 0 THEN lang END AS lang,
           CASE WHEN doc_id % 2 = 1 THEN source END AS source,
           CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
    FROM documents"""

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q58_kv_roundtrip" -> q58KvRoundtrip _,
        "q125_schema_merge" -> q125SchemaMerge _,
        "q75_jsonl_roundtrip" -> q75JsonlRoundtrip _,
        "q81_orc_roundtrip" -> q81OrcRoundtrip _,
        "q87_compaction" -> q87Compaction _)

  def oracles: Map[String, String] =
    Map("q58_kv_roundtrip" -> q58KvRoundtripSql,
        "q125_schema_merge" -> q125SchemaMergeSql,
        "q75_jsonl_roundtrip" -> q75JsonlRoundtripSql,
        "q81_orc_roundtrip" -> q81OrcRoundtripSql,
        "q87_compaction" -> q87CompactionSql)
}
