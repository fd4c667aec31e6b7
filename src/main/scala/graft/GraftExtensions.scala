package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.{GraftTextExpressions, GraftVectorExpressions}

/** Spark session extension wiring graft's native expressions into SQL —
  * the supported injection point for expression libraries:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or for spark-submit / cluster deployment:
  *   //   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * For a session that already exists, `GraftVectorExpressions.register`
  * adds the same functions to its registry directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftVectorExpressions.dotProductDescription)
    ext.injectFunction(GraftTextExpressions.ngramShinglesDescription)
    ext.injectFunction(GraftTextExpressions.rollingFingerprintDescription)
    ext.injectFunction(GraftTextExpressions.jaroWinklerDescription)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandGuard)
  }
}
