package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row MinHash / SimHash signatures.
  *
  * The relational signature shapes (`Dedup.minhashSignatures` /
  * `simhashSignatures*`) explode every token or shingle into a row
  * stream and aggregate the mins/votes back per doc — correct and
  * codegen-friendly, but the explode feeds a SHUFFLE whose volume is
  * the token count of the corpus. At 100 TB that shuffle IS the cost of
  * near-dedup. These expressions compute the identical signature in one
  * tight per-row loop: tokenize, one md5 per token/shingle, running
  * mins / vote counters on the stack — no explode, no aggregate, no
  * exchange. Only the band keys (a few longs per doc) ever shuffle.
  *
  * Value-identity with the relational forms (and so with the DuckDB
  * oracle SQL, which mirrors them):
  *  - tokenization is lowercase + maximal runs of non-`\s` chars —
  *    exactly `filter(split(lower(text), "\\s+"), _ != "")`;
  *  - the hash is md5 over the UTF-8 bytes of the token / of the
  *    space-joined 3-token shingle;
  *  - MinHash derives k hash functions arithmetically from the two
  *    60-bit md5 halves (Kirsch-Mitzenmacher, h1 + i*h2 — nibbles 0-14
  *    and 16-30, most-significant first, same as
  *    `conv(substring(hex, 1|17, 15), 16, 10)`);
  *  - SimHash16 votes on the high bit of each of the 16 nibbles (bit
  *    15-i for nibble i); SimHash64 votes on all 64 nibble bits, band b
  *    = nibbles [4b, 4b+3] parsed most-significant-first;
  *  - docs with no tokens (SimHash) / fewer than 3 tokens (MinHash over
  *    3-gram shingles) return null, mirroring the relational forms'
  *    no-rows-after-explode absence.
  */
object SignatureExprs {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Lowercased tokens: maximal runs of non-whitespace characters. */
  private[expressions] def tokenize(text: UTF8String): Array[String] = {
    val s = text.toLowerCase.toString
    val out = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) out.add(s.substring(start, i))
    }
    out.toArray(new Array[String](out.size))
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5(s: String): Array[Byte] = {
    val md = digest.get()
    md.reset()
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def nibble(d: Array[Byte], i: Int): Int =
    if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xF else d(i >> 1) & 0xF

  /** 60-bit value of nibbles [from, from+15), most significant first. */
  private def hex15(d: Array[Byte], from: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 15) { v = (v << 4) | nibble(d, from + i); i += 1 }
    v
  }

  /** k-position MinHash over 3-token shingles; null if < 3 tokens. */
  def minhashSig(text: UTF8String, k: Int): GenericArrayData = {
    val toks = tokenize(text)
    if (toks.length < 3) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j + 2 < toks.length) {
      val d = md5(toks(j) + " " + toks(j + 1) + " " + toks(j + 2))
      val h1 = hex15(d, 0)
      val h2 = hex15(d, 16)
      var i = 0
      while (i < k) {
        val h = h1 + i.toLong * h2
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(Long.box(_): AnyRef))
  }

  /** 16-bit SimHash over the token bag; null if no tokens. */
  def simhash16(text: UTF8String): java.lang.Long = {
    val toks = tokenize(text)
    if (toks.isEmpty) return null
    val votes = new Array[Int](16)
    var t = 0
    while (t < toks.length) {
      val d = md5(toks(t))
      var i = 0
      while (i < 16) {
        votes(i) += (if (nibble(d, i) >= 8) 1 else -1)
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 16) {
      if (votes(i) >= 0) sig |= 1L << (15 - i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  /** 64-bit SimHash as four 16-bit band values [s0..s3]; null if no
    * tokens.
    */
  def simhash64(text: UTF8String): GenericArrayData = {
    val toks = tokenize(text)
    if (toks.isEmpty) return null
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val d = md5(toks(t))
      var b = 0
      while (b < 4) {
        val hb = (nibble(d, 4 * b) << 12) | (nibble(d, 4 * b + 1) << 8) |
          (nibble(d, 4 * b + 2) << 4) | nibble(d, 4 * b + 3)
        var j = 0
        while (j < 16) {
          votes(b * 16 + j) += (if (((hb >> j) & 1) == 1) 1 else -1)
          j += 1
        }
        b += 1
      }
      t += 1
    }
    val out = new Array[AnyRef](4)
    var b = 0
    while (b < 4) {
      var s = 0L
      var j = 0
      while (j < 16) {
        if (votes(b * 16 + j) >= 0) s |= 1L << j
        j += 1
      }
      out(b) = Long.box(s)
      b += 1
    }
    new GenericArrayData(out)
  }
}

sealed trait SignatureExpr extends UnaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string input, got ${other.simpleString}")
    }

  /** Fully-qualified static call computing this signature. */
  protected def staticCall(input: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      val boxed = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .boxedType(dataType)
      val unbox = if (dataType == LongType) s"$tmp.longValue()" else tmp
      s"""
         |$boxed $tmp = ${staticCall(c)};
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $unbox; }
       """.stripMargin
    })
}

/** k-position MinHash signature over 3-token shingles (array<bigint>). */
case class MinHashSig(child: Expression, k: Int) extends SignatureExpr {
  require(k > 0 && k <= 6, s"k must be in 1..6 (h1 + 5*h2 < 2^63), got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    SignatureExprs.minhashSig(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(input: String): String =
    s"graft.expressions.SignatureExprs.minhashSig($input, $k)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** 16-bit SimHash (bigint in [0, 65535]). */
case class SimHash16Sig(child: Expression) extends SignatureExpr {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val v = SignatureExprs.simhash16(input.asInstanceOf[UTF8String])
    if (v == null) null else v.longValue()
  }
  override protected def staticCall(input: String): String =
    s"graft.expressions.SignatureExprs.simhash16($input)"
  override protected def withNewChildInternal(newChild: Expression): SimHash16Sig =
    copy(child = newChild)
  override def prettyName: String = "simhash16_sig"
}

/** 64-bit SimHash as four 16-bit bands (array<bigint> of size 4). */
case class SimHash64Sig(child: Expression) extends SignatureExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    SignatureExprs.simhash64(input.asInstanceOf[UTF8String])
  override protected def staticCall(input: String): String =
    s"graft.expressions.SignatureExprs.simhash64($input)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Sig =
    copy(child = newChild)
  override def prettyName: String = "simhash64_sig"
}
