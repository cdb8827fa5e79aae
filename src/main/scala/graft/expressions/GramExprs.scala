package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for the native character-gram expressions.
  *
  * Both expressions replicate `TextFns.charShingles(text, k)` gram
  * enumeration EXACTLY, including its two quirks, so swapping the HOF
  * forms for these changes no result bit:
  *   - the window COUNT comes from the ORIGINAL text's character length
  *     (`length(text) - k + 1`), while the gram CONTENT is sliced from
  *     the LOWERCASED text — for the rare inputs where lowering changes
  *     the code-point count (e.g. Turkish dotted I) trailing windows
  *     clamp to partial or empty grams, and those partial grams
  *     participate in the min / distinct-count like any other;
  *   - fewer than one window (original length < k) yields the HOF
  *     empty-array results: null fingerprint, 0 distinct grams.
  *
  * Grams are handled as byte slices of the lowered UTF-8 buffer
  * (code-point offsets walked once); md5 runs straight over the slice —
  * the same bytes Spark's `md5(string)` hashes — and the 16-byte digest
  * is compared unsigned, which is exactly the lexicographic order of
  * its lowercase-hex rendering that `array_min` compares.
  */
object GramExprs {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".getBytes

  /** Code-point start offsets of `b`; returns the count via offs(last). */
  private def walkOffsets(b: Array[Byte]): (Array[Int], Int) = {
    val offs = new Array[Int](b.length + 1)
    var i = 0
    var n = 0
    while (i < b.length) {
      offs(n) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      n += 1
    }
    offs(n) = b.length
    (offs, n)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Min md5 (lowercase hex) over the k-char grams; null if the original
    * text has fewer than k characters.
    */
  def minGram(text: UTF8String, k: Int): UTF8String = {
    val origChars = text.numChars
    if (origChars < k) return null
    val lower = text.toLowerCase
    val b = lower.getBytes
    val (offs, lowN) = walkOffsets(b)
    val md = digest.get()
    var best: Array[Byte] = null
    var s = 0
    val windows = origChars - k + 1
    while (s < windows) {
      val from = offs(math.min(s, lowN))
      val until = offs(math.min(s + k, lowN))
      md.reset()
      md.update(b, from, until - from)
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      s += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HEX((best(j) >> 4) & 0xF)
      out(2 * j + 1) = HEX(best(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Count of distinct k-char grams; 0 if the original text has fewer
    * than k characters.
    */
  def distinctGrams(text: UTF8String, k: Int): Int = {
    val origChars = text.numChars
    if (origChars < k) return 0
    val lower = text.toLowerCase
    val b = lower.getBytes
    val (offs, lowN) = walkOffsets(b)
    val seen = new java.util.HashSet[UTF8String]()
    var s = 0
    val windows = origChars - k + 1
    while (s < windows) {
      val from = offs(math.min(s, lowN))
      val until = offs(math.min(s + k, lowN))
      seen.add(UTF8String.fromBytes(b, from, until - from))
      s += 1
    }
    seen.size
  }

  val EMPTY: org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[AnyRef])

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HEX((d(j) >> 4) & 0xF)
      out(2 * j + 1) = HEX(d(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Distinct winnowing-selected fingerprints: min md5 of every
    * w-window over the k-char gram digests (whole gram set if fewer
    * than w grams; empty if fewer than k chars). See `WinnowedFps`.
    */
  def winnowedFps(text: UTF8String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val origChars = text.numChars
    val windows = origChars - k + 1
    if (windows <= 0) return EMPTY
    val lower = text.toLowerCase
    val b = lower.getBytes
    val (offs, lowN) = walkOffsets(b)
    val md = digest.get()
    val ds = new Array[Array[Byte]](windows)
    var s = 0
    while (s < windows) {
      val from = offs(math.min(s, lowN))
      val until = offs(math.min(s + k, lowN))
      md.reset()
      md.update(b, from, until - from)
      ds(s) = md.digest()
      s += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val nSel = math.max(windows - w + 1, 1)
    var j = 0
    while (j < nSel) {
      var best: Array[Byte] = null
      var i = j
      val end = math.min(j + w, windows)
      while (i < end) {
        if (best == null || unsignedLess(ds(i), best)) best = ds(i)
        i += 1
      }
      seen.add(toHex(best))
      j += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native document fingerprint: min md5 over character k-grams — the
  * 1-permutation MinHash `TextFns.fingerprint` computes with
  * `array_min(transform(charShingles(...), md5))`, without the
  * interpreted HOF chain: no gram array materialization, no per-element
  * boxed lambda dispatch, one digest reused across the row. Stays
  * inside whole-stage codegen via a single static call.
  *
  * Null semantics: null text -> null (UnaryExpression default); text
  * shorter than k characters -> null (the HOF form's
  * `array_min(empty)`).
  */
case class Md5MinGram(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"gram size must be positive, got $k")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_min_gram expects a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GramExprs.minGram(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.GramExprs.minGram($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5MinGram =
    copy(child = newChild)

  override def prettyName: String = "md5_min_gram"
}

/** Native distinct character-k-gram count — the codegen form of
  * `size(array_distinct(charShingles(text, k)))`: no gram array, no
  * interpreted transform, one hash set per row.
  *
  * Null semantics: null text -> 0, NOT null — `charShingles`' length
  * guard is `when(length(text) >= k, ...).otherwise(empty)`, and a null
  * length falls into the otherwise branch, so the HOF form counts an
  * empty array. Shorter than k -> 0 likewise.
  */
case class DistinctGramCount(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"gram size must be positive, got $k")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"distinct_gram_count expects a string input, got ${other.simpleString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else GramExprs.distinctGrams(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0 :
          graft.expressions.GramExprs.distinctGrams(${c.value}, $k);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctGramCount =
    copy(child = newChild)

  override def prettyName: String = "distinct_gram_count"
}

/** Native winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): the distinct min-md5 of every w-length sliding window
  * over the character k-gram hashes — `Dedup.winnowedPairs`' per-doc
  * selection step in ONE pass per row.
  *
  * Why native and not HOFs/window functions: the lambda forms re-inline
  * the hash-array (and even the `lower(text)`) expression into every
  * per-window evaluation — CollapseProject cannot see through a lambda
  * body — giving O(n^2) digest/char work per document; the
  * explode+sliding-window-min form fixes the asymptotics but pays a
  * full shuffle on doc id plus a per-doc sort. Here: one lowercase, one
  * offset walk, n digests, an O(n*w) min scan (w is a small constant),
  * and one linked hash set, all inside the scan projection.
  *
  * Gram enumeration matches `charShingles`/`minGram` exactly (window
  * count from the ORIGINAL char length, content from the lowered
  * buffer, partial trailing grams on length-changing lowers). Docs with
  * fewer than w grams winnow their whole gram set (one fingerprint);
  * fewer than k chars -> empty. Selection keeps hash VALUES only, so
  * window ties cannot produce engine-divergent sets; output order is
  * first-selection order (consumers explode + aggregate — order-blind).
  *
  * Null semantics: null text -> EMPTY array (the HOF guard's
  * `otherwise(empty)` branch), matching `DistinctWordShingles`.
  */
case class WinnowedFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2, s"gram size must be >= 2, got $k")
  require(w >= 1, s"window size must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowed_fps expects a string input, got ${other.simpleString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramExprs.EMPTY
    else GramExprs.winnowedFps(v.asInstanceOf[UTF8String], k, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
          graft.expressions.GramExprs.EMPTY() :
          graft.expressions.GramExprs.winnowedFps(${c.value}, $k, $w);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFps =
    copy(child = newChild)

  override def prettyName: String = "winnowed_fps"
}
