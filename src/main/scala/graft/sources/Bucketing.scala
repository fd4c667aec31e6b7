package graft.sources

import org.apache.spark.sql.DataFrame

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
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
