package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Dedup
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.nearDupMinHash(docs, "doc_id", "text")
    println("DBGfinal rows: " + out.count())
    println("DBGpair: " + out.filter(col("id_a") === 33 && col("id_b") === 436).count())
    spark.stop()
  }
}
