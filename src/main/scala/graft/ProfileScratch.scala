package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCRATCH stage-attribution profiler for the r15 optimization round —
  * times labeled sub-pipelines of the expensive dedup gates so changes
  * target the stage that actually costs. Not part of any driver surface;
  * deleted before close-out.
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      CacheRegistry.unpersistAll(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // inline replica of Dedup.bandBuckets (private there)
    def bands16(withSig: DataFrame, id: String): DataFrame = {
      val bands = 16
      val r = size(col("sig")) / lit(bands)
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b),
            slice(col("sig"), lit(b) * r.cast("int") + 1, r.cast("int"))).as("bh"))
      }
      withSig.select(col(id), explode(array(bandCols: _*)).as("bb"))
        .select(col(id), col("bb.band").as("band"), col("bb.bh").as("bh"))
    }

    // variant: plain bh array + posexplode, element_at instead of slice
    def bands16PosExplode(withSig: DataFrame, id: String): DataFrame = {
      val bands = 16
      val r = (size(col("sig")) / lit(bands)).cast("int")
      val bhs = (0 until bands).map { b =>
        xxhash64(lit(b), slice(col("sig"), lit(b) * r + 1, r))
      }
      withSig.select(col(id), posexplode(array(bhs: _*)).as(Seq("band", "bh")))
    }
    // variant: static r=4, element_at args, no slice alloc
    def bands16Static(withSig: DataFrame, id: String): DataFrame = {
      val bands = 16
      val bhs = (0 until bands).map { b =>
        xxhash64((lit(b) +: (1 to 4).map(j =>
          element_at(col("sig"), b * 4 + j))): _*)
      }
      withSig.select(col(id), posexplode(array(bhs: _*)).as(Seq("band", "bh")))
    }

    val which = sys.env.getOrElse("PROFILE_WHICH", "q253")

    if (which.contains("bands")) {
      val corpus = ext.Dedup.q253Corpus(spark)
      val sig = ext.Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 64)
      time("bands: current slice+struct") { exec(bands16(sig, "doc_id")) }
      time("bands: posexplode+slice") { exec(bands16PosExplode(sig, "doc_id")) }
      time("bands: static element_at") { exec(bands16Static(sig, "doc_id")) }
      time("bands: current slice+struct (2nd)") { exec(bands16(sig, "doc_id")) }
      time("signatures only") { exec(sig) }
    }

    if (which.contains("q253")) {
      val corpus = ext.Dedup.q253Corpus(spark)
      val batch = ext.Dedup.q253Batch(spark)
      time("q253 corpus generation only") { exec(corpus) }
      time("q253 corpus signatures") {
        exec(ext.Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 64))
      }
      time("q253 corpus band rows") {
        exec(bands16(ext.Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 64), "doc_id"))
      }
      time("q253 bucket sizing over bAll") {
        val bNew = bands16(ext.Dedup.minHashSignatures(batch, "doc_id", "text", 3, 64), "doc_id")
        val bAll = bNew.unionByName(
          bands16(ext.Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 64), "doc_id"))
        exec(bAll.groupBy("band", "bh").agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= 10000).select("band", "bh"))
      }
      time("q253 verify-sets build (full union)") {
        val docs = corpus.unionByName(batch)
        exec(docs.select(col("doc_id").as("vid"),
          transform(array_distinct(ext.Dedup.shingles(col("text"), 3)),
            s => xxhash64(s)).as("sh")))
      }
      time("q253 full") { exec(ext.Dedup.q253IncrementalAtScale(spark, "")) }
    }

    if (which.contains("q250")) {
      val corpus = ext.Dedup.q250Corpus(spark)
      time("q250 corpus generation") { exec(corpus) }
      val sh0 = corpus.select(col("doc_id"),
        explode(array_distinct(ext.Dedup.shingles(col("text"), 3))).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("tok"))
      time("q250 exploded tokens") { exec(sh0) }
      time("q250 df counts") {
        exec(sh0.groupBy("tok").agg(count(lit(1)).as("dfq")))
      }
      time("q250 ranked sets (collect_list)") {
        val dfc = sh0.groupBy("tok").agg(count(lit(1)).as("dfq"))
        exec(sh0.join(dfc, Seq("tok")).groupBy("doc_id")
          // groupagg-ok: one document's hashed shingle tokens — doc-sized
          // (the stage-attribution replica of ngramJaccardPairs' own
          // annotated sets build)
          .agg(sort_array(collect_list(struct(col("dfq"), col("tok"))))
            .as("ranked")))
      }
      time("q250 full") {
        exec(SparkEntry.queries("q250_jaccard_atscale")(spark, "/root/testdata/sf0.1"))
      }
    }

    if (which.contains("q209")) {
      time("q209 full") {
        exec(SparkEntry.queries("q209_minhash_atscale")(spark, "/root/testdata/sf0.1"))
      }
    }
    spark.stop()
  }
}
