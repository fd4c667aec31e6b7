package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: lowercase, whitespace-split, emit all
  * n-token windows joined by single spaces; a document shorter than n
  * tokens contributes its whole token string (so every document has at
  * least one shingle).
  *
  * Semantically identical to the declarative form
  * `when(size(toks) >= n, transform(sequence(0, size(toks)-n),
  *   i => concat_ws(" ", slice(toks, i+1, n)))).otherwise(array(concat_ws(" ", toks)))`
  * with `toks = filter(split(lower(text), "\\s+"), _ =!= "")` — but that
  * form nests four higher-order functions, which evaluate interpreted with
  * per-element lambda dispatch (measured ~0.7 ms/doc; it floors every
  * dedup query and is re-evaluated per plan branch). This expression is
  * one JIT-compiled method per row inside whole-stage codegen.
  */
case class NGramShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(input: Any): Any =
    NGramShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NGramShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object NGramShingles {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // ASCII corpus: Locale.ROOT lowercase matches Spark's `lower` (and the
    // DuckDB oracle's) on every byte the testdata contains
    val toks = WS.split(text.toString.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
    if (toks.length >= n) {
      val out = new Array[AnyRef](toks.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(
        Array[AnyRef](UTF8String.fromString(toks.mkString(" "))))
    }
  }
}

/** Native polynomial rolling hash over the token stream: lowercase,
  * whitespace-split, per token v = 31·len + first-char code, then
  * acc = (acc·1000003 + v) mod 1e9+7 folded left-to-right from 0.
  *
  * Bit-identical to the declarative form
  * `aggregate(transform(tokenize(text), t => (length(t)*31 +
  * ascii(substring(t,1,1))).cast("long")), lit(0L), (acc, v) =>
  * pmod(acc*1000003 + v, lit(1000000007)))` — but that form is a
  * `transform`+`aggregate` HOF pair, which evaluates interpreted with
  * per-element lambda dispatch and an intermediate array allocation per
  * row (the same shape [[NGramShingles]]/`DotProduct` replaced with
  * measured 10×+ wins). This is one JIT-compiled loop per row inside
  * whole-stage codegen. Same ASCII-corpus caveat as [[NGramShingles]]:
  * `String.length`/`codePointAt` match Spark's `length`/`ascii` (and the
  * DuckDB oracle's) on every byte the testdata contains. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.RollingFingerprint.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): Long = {
    val toks = WS.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        // 31·len + first-char code; acc stays < 1e9+7 so acc·1000003 + v
        // peaks near 1e15 — no overflow anywhere near Long.MaxValue
        val v = 31L * t.length + t.codePointAt(0)
        acc = java.lang.Math.floorMod(acc * 1000003L + v, 1000000007L)
      }
      i += 1
    }
    acc
  }
}

/** Native Jaro-Winkler similarity — the string-similarity class the
  * Levenshtein family cannot cover (edit distance punishes transpositions
  * and rewards nothing for shared prefixes; names/titles need the
  * opposite). Semantics pinned to the textbook algorithm AS DuckDB
  * implements it (validated against its `jaro_winkler_similarity` on the
  * classic triples martha/marhta = 0.961111, dwayne/duane = 0.84,
  * dixon/dicksonx = 0.813333, plus probes that fix the two
  * underspecified corners: transpositions floor-halve (an odd mismatch
  * count truncates), and the 0.1·prefix boost applies only when jaro
  * exceeds 0.7 — both confirmed empirically, so the oracle replays
  * bit-for-bit). Either empty input → 0. A `BinaryExpression` with a
  * static-call `doGenCode`, so it stays inside whole-stage codegen like
  * its siblings. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Iterates UTF-8 BYTES, not UTF-16 code units: DuckDB's
    * `jaro_winkler_similarity` operates on the raw byte string, so
    * byte-level matching is what keeps the oracle pinning exact for
    * non-ASCII input too (multi-byte code points count as their byte
    * length and can half-match — identical to DuckDB, by construction). */
  def compute(au: UTF8String, bu: UTF8String): Double = {
    val s = au.getBytes
    val t = bu.getBytes
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    if (java.util.Arrays.equals(s, t)) return 1.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sM = new Array[Boolean](ls)
    val tM = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && t(j) == s(i)) {
          sM(i) = true; tM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mismatches = 0
    i = 0
    while (i < ls) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val trans = mismatches / 2 // floor-halved (DuckDB-confirmed)
    val mm = m.toDouble
    val jaro = (mm / ls + mm / lt + (mm - trans) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(ls, lt))
    while (l < maxL && s(l) == t(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}

/** Native MinHash signature: the k seed-chained xxhash64 minima over a
  * document's word n-gram shingles, computed in ONE JIT-compiled pass per
  * row. Bit-identical to the aggregate formulation
  * `min_j(xxhash64(shingle, j))` over the exploded distinct shingles:
  * `XxHash64` seed-chains its children, so `xxhash64(s, j)` =
  * `XXH64.hashInt(j, XXH64.hashUTF8String(s, 42))` — which this loop
  * exploits by hashing each shingle string ONCE and deriving the k
  * per-slot hashes with k 4-byte `hashInt` rounds, where the column form
  * re-hashed the full string k times per occurrence. Duplicate shingles
  * cannot change a minimum, so the distinct step is dropped too. A
  * document always yields ≥ 1 shingle ([[NGramShingles]] emits the whole
  * token string for short docs), so the output is non-null for non-null
  * text — null text stays null, which callers filter to reproduce the
  * explode form's silent doc drop. */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashSignature.compute($c, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def compute(text: UTF8String, n: Int, k: Int): GenericArrayData = {
    val sh = NGramShingles.compute(text, n)
    val mins = Array.fill(k)(Long.MaxValue)
    val m = sh.numElements()
    var i = 0
    while (i < m) {
      val base = XXH64.hashUTF8String(sh.getUTF8String(i), 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native 64-bit SimHash over the token multiset: lowercase,
  * whitespace-split, per-token `xxhash64` (seed 42 — the exact value
  * `xxhash64(token)` produces), per-bit set-count votes, bit j of the
  * fingerprint set iff 2·count_j > n. Bit-identical to the packed-lane
  * aggregate formulation in `Dedup.simHash` (integer arithmetic
  * throughout — pinned by DedupSpec old-vs-new), but computed in one
  * JIT-compiled pass per row: no token explode, no 33-buffer hash
  * aggregate, no shuffle. Returns null for a document with no tokens
  * (empty/whitespace text), which callers filter — reproducing the
  * aggregate form's silent drop of token-less docs. Same ASCII-corpus
  * lowercase caveat as [[NGramShingles]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhash")
      s"""java.lang.Long $tmp = org.apache.spark.sql.graft.SimHash64.compute($c);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? 0L : $tmp.longValue();""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): java.lang.Long = {
    val toks = WS.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val counts = new Array[Int](64)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        n += 1
        val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
        var j = 0
        while (j < 64) {
          counts(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    if (n == 0) return null
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (2L * counts(j) > n) fp |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }
}

object GraftTextExpressions {
  def ngramShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(NGramShingles(ExpressionUtils.expression(text), n))

  def simHash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  def minHashSignature(text: Column, n: Int, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(text), n, k))

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def rollingFingerprint(text: Column): Column =
    ExpressionUtils.column(RollingFingerprint(ExpressionUtils.expression(text)))

  /** SQL registration triple: `rolling_fingerprint(text)`. */
  val rollingFingerprintDescription:
      (org.apache.spark.sql.catalyst.FunctionIdentifier,
       org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
       Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_fingerprint"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[RollingFingerprint].getName, "rolling_fingerprint"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        "rolling_fingerprint(text) takes exactly one argument")
      RollingFingerprint(children.head)
    })

  /** SQL registration triple: `ngram_shingles(text, n)` with `n` a literal
    * integer (the shingle width is part of the compiled expression, so a
    * column-valued n is rejected at analysis time). */
  val ngramShinglesDescription:
      (org.apache.spark.sql.catalyst.FunctionIdentifier,
       org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
       Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_shingles"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[NGramShingles].getName, "ngram_shingles"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "ngram_shingles(text, n) takes exactly two arguments")
      // Any foldable int expression works, not just a bare Literal:
      // function builders run during resolution BEFORE constant folding,
      // so `ngram_shingles(t, 1 + 2)` or `CAST(3 AS INT)` arrive unfolded
      // even though they are constants — eval() folds them here.
      val n = children(1) match {
        case e if e.foldable &&
            e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval() match {
            case i: Int => i
            case _ => throw new IllegalArgumentException(
              "ngram_shingles: n must not be null")
          }
        case other => throw new IllegalArgumentException(
          s"ngram_shingles: n must be a constant integer, got $other")
      }
      NGramShingles(children.head, n)
    })

  /** SQL registration triple: `jaro_winkler(a, b)`. */
  val jaroWinklerDescription:
      (org.apache.spark.sql.catalyst.FunctionIdentifier,
       org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
       Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[JaroWinkler].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "jaro_winkler(a, b) takes exactly two arguments")
      JaroWinkler(children.head, children(1))
    })

  /** Register on an EXISTING session's function registry — the
    * already-running-session counterpart of `GraftExtensions`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(ngramShinglesDescription, rollingFingerprintDescription,
      jaroWinklerDescription).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
