package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Remap-parity MapReduce surface: the reference's *entire* user API is a
  * pair of Python generators driven by its file-based shuffle —
  * `map(k1,v1) → yield (partition, k2, v2)` (work loop
  * `/root/reference/daemons/core/module_mapper.py:43-65`) and
  * `reduce(k2, [v2]) → yield (k3, v3)` (sorted-run merge + group dispatch
  * `/root/reference/daemons/core/module_reducer.py:58-96`), with an optional
  * map-side combiner applied per key at partition flush
  * (`/root/reference/daemons/core/remap.py:136-144`) and an optional custom
  * sort key for secondary sort (`remap.py:132-139`).
  *
  * Here each hook maps onto the typed Dataset API so Catalyst/Tungsten own
  * the shuffle: `flatMap` (M1/M2), `groupByKey.flatMapGroups` (A4),
  * `Aggregator` with map-side partial merge (A1), and
  * `repartition.sortWithinPartitions` (O2/K1). The app-chosen partition
  * *label* of remap (M3 — e.g. wordcount's hand range-partitioning
  * `examples/wordcount/wordcount.py:28-37`) is exposed for parity but is
  * physical-only: results never depend on it, which a property test pins.
  */
object MapReduce {

  /** M1/M2 + A4: full map → shuffle-on-k2 → reduce pipeline.
    *
    * The partition label of the remap contract is dropped at the logical
    * level: remap routes each k2 to exactly one label, so grouping by k2
    * alone yields identical groups; Spark's hash shuffle replaces the
    * hand-rolled label routing (and fixes its inherent skew — remap's
    * `_default` label takes every non-a-z word).
    */
  def mapReduce[I, K2, V2, K3, V3](
      input: Dataset[I],
      mapFn: I => IterableOnce[(String, K2, V2)],
      reduceFn: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(
      implicit km: Encoder[(String, K2, V2)], kk: Encoder[K2],
      out: Encoder[(K3, V3)]): Dataset[(K3, V3)] =
    input.flatMap(mapFn)
      .groupByKey(_._2)
      .flatMapGroups((k: K2, rows: Iterator[(String, K2, V2)]) =>
        reduceFn(k, rows.map(_._3)))

  /** A1: map-side combiner as a typed `Aggregator`.
    *
    * Remap applies `combiner(values) → values` per key when a partition
    * flushes and again in the reducer; the parity form is an Aggregator
    * whose partial buffers are combined list-to-list. Catalyst runs
    * `reduce` map-side (partial aggregation) and `merge` after the
    * shuffle, so only combined buffers cross the wire — the same
    * bandwidth win remap's flush-time combiner buys, but with spill.
    * `flushAt` bounds the map-side buffer exactly like remap's intended
    * (never implemented — `remap.py:92-95`) spill threshold.
    */
  def combinerAggregator[K, V](combiner: Seq[V] => Seq[V], flushAt: Int = 1024)(
      implicit bufE: Encoder[Seq[V]]): Aggregator[(K, V), Seq[V], Seq[V]] =
    new Aggregator[(K, V), Seq[V], Seq[V]] {
      def zero: Seq[V] = Vector.empty
      def reduce(b: Seq[V], a: (K, V)): Seq[V] = {
        val nb = b :+ a._2
        if (nb.size >= flushAt) combiner(nb) else nb
      }
      def merge(b1: Seq[V], b2: Seq[V]): Seq[V] = combiner(b1 ++ b2)
      def finish(r: Seq[V]): Seq[V] = combiner(r)
      def bufferEncoder: Encoder[Seq[V]] = bufE
      def outputEncoder: Encoder[Seq[V]] = bufE
    }

  /** A1+A6 composed: group values per key with a combiner applied at every
    * partial-merge boundary (collation's `list(set(l))` combiner —
    * `/root/reference/examples/collation/collation.py:18-19,41-42`). */
  def groupWithCombiner[K, V](ds: Dataset[(K, V)], combiner: Seq[V] => Seq[V])(
      implicit kE: Encoder[K], bufE: Encoder[Seq[V]],
      outE: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1).agg(combinerAggregator[K, V](combiner).toColumn)

  /** O2/K1: secondary sort — remap's `TextPartitioner(customkey=...)`
    * (`remap.py:132-139`; insurance example sorts tuples by field 3 within
    * county partitions, `examples/secondarysort/secondarysort.py:9,14-17`).
    * One shuffle on the partition expression, then an in-partition sort —
    * never a global sort. At scale the partition expression should be
    * high-cardinality or salted; the guarantee is per-partition order only,
    * exactly remap's guarantee. */
  def secondarySort(df: DataFrame, partCol: Column, sortCols: Column*): DataFrame =
    df.repartition(partCol).sortWithinPartitions(partCol +: sortCols: _*)

  /** M3: app-chosen partition-label routing, physical-only parity knob. */
  def routeByLabel(df: DataFrame, label: Column): DataFrame =
    df.repartition(label)

  // --------------------------------------------------------------- queries

  // --- q59_typed_mr: the typed map/reduce contract, oracled ---------------
  /** Wordcount through the TYPED [[mapReduce]] path — the literal remap
    * user contract (`map` yields `(label, word, 1)` with the reference's
    * a2e/f2n/o2s/t2z/_default routing, `reduce` sums;
    * `examples/wordcount/wordcount.py:20-41`) — sharing q24's oracle, so
    * the generator-based API is hash-certified equivalent to the
    * declarative pipeline, not just spec-equivalent. */
  def q59TypedMr(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def label(w: String): String = w.head match {
      case c if c >= 'a' && c <= 'e' => "a2e"
      case c if c >= 'f' && c <= 'n' => "f2n"
      case c if c >= 'o' && c <= 's' => "o2s"
      case c if c >= 't' && c <= 'z' => "t2z"
      case _ => "_default"
    }
    val lines = graft.Tables.documents(spark, dir).select("text").as[String]
    mapReduce[String, String, Long, String, Long](
      lines,
      // Locale.ROOT: default-locale toLowerCase diverges from Catalyst's
      // locale-independent lower() under e.g. tr_TR ('I' → dotless 'ı'),
      // which would break the hash-shared q24 oracle
      line => line.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
        .filter(_.nonEmpty).map(w => (label(w), w, 1L)),
      (w, vs) => Iterator.single((w, vs.sum)))
      .toDF("word", "n")
  }

  // --- q61_typed_combiner: the A1 combiner contract, oracled --------------
  /** Collation through the TYPED combiner path — remap's `list(set(l))`
    * combiner applied at every partial-merge boundary
    * (`examples/collation/collation.py:8,18-19,41-42`) becomes a
    * [[combinerAggregator]] whose buffers Catalyst merges map-side. Shares
    * q25's oracle, so the Aggregator-based combiner is hash-certified
    * equivalent to the declarative collect_set pipeline. */
  def q61TypedCombiner(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pairs = graft.Tables.documents(spark, dir)
      .select("text", "source").as[(String, String)]
      .flatMap { case (text, source) =>
        text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
          .filter(_.nonEmpty).map(w => (w, source))
      }
    groupWithCombiner[String, String](pairs, vs => vs.distinct)
      .toDF("word", "sources")
      .select(col("word"),
        size(col("sources")).as("n_sources"),
        array_join(array_sort(col("sources")), ",").as("sources_csv"))
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q59_typed_mr" -> q59TypedMr _,
        "q61_typed_combiner" -> q61TypedCombiner _)

  def oracles: Map[String, String] =
    Map("q59_typed_mr" -> graft.ops.Text.q24WordcountSql,
        "q61_typed_combiner" -> graft.ops.Text.q25CollationSql)
}
