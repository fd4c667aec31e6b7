package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftVectorExpressions

/** Graft-facing vector functions backed by native Catalyst expressions
  * (implementation in `org.apache.spark.sql.graft` — see the packaging
  * note there). */
object VectorExpressions {
  /** Codegen'd dot product over two Array[Double] columns; left-to-right
    * summation order, bit-identical to a sequential fold. */
  def dot(a: Column, b: Column): Column = GraftVectorExpressions.dot(a, b)
}

/** Graft-facing text functions backed by native Catalyst expressions. */
object TextExpressions {
  /** Codegen'd word n-gram shingles (lowercase, whitespace-split). */
  def ngramShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.GraftTextExpressions.ngramShingles(text, n)

  /** Codegen'd MinHash signature: k seed-chained xxhash64 minima over the
    * n-gram shingle set, one pass per row (bit-identical to
    * `min_j(xxhash64(shingle, j))` — see the expression's scaladoc). */
  def minHashSignature(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.graft.GraftTextExpressions.minHashSignature(text, n, k)

  /** Codegen'd 64-bit SimHash over the token multiset (bit-identical to
    * the packed-lane aggregate form — see the expression's scaladoc). */
  def simHash64(text: Column): Column =
    org.apache.spark.sql.graft.GraftTextExpressions.simHash64(text)

  /** Codegen'd polynomial rolling hash over the token stream. */
  def rollingFingerprint(text: Column): Column =
    org.apache.spark.sql.graft.GraftTextExpressions.rollingFingerprint(text)

  /** Codegen'd Jaro-Winkler similarity (DuckDB-pinned semantics). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftTextExpressions.jaroWinkler(a, b)
}
