package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels for the MinHash/LSH family (d03/d06/d10 and the
  * streaming dedup cycle). The shingle DEFINITION is the repo-wide one
  * (ExtensionsCore.shinglesOfDocs, cited to the DuckDB oracle): tokens
  * are `split(text, ' ')` with empty tokens kept (every single space is
  * a split point, trailing empties included — Spark's StringSplit runs
  * with limit -1), shingles are 3-token windows re-joined by ' ', and
  * h32 is the first-4-md5-bytes portable hash (H32Digest).
  *
  * The byte-scan trick that makes the kernels allocation-light: because
  * every inter-token delimiter is EXACTLY one space character, the
  * 3-token shingle `concat_ws(' ', t[i], t[i+1], t[i+2])` is byte-for-
  * byte the SLICE of the original text from token i's first byte to
  * token i+2's last byte. So the kernels never build token arrays or
  * shingle strings — they scan space positions once and hash (or
  * set-insert) byte slices of the input. 0x20 cannot occur inside a
  * UTF-8 multibyte sequence, so the scan is byte-safe. */
object MinhashKernel {

  /** Signature width (minima count) — 16 hashes in 4 bands of 4, the
    * d03 banding (ExtensionsDedup.bandedSignatures). */
  val K = 16
  private val P = 2147483647L

  private val md = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Byte positions of every space, plus the token count (spaces+1). */
  private def spacePositions(bytes: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) n += 1; i += 1 }
    val pos = new Array[Int](n)
    var j = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { pos(j) = i; j += 1 }
      i += 1
    }
    pos
  }

  private def h32Slice(d: MessageDigest, bytes: Array[Byte],
                       from: Int, until: Int): Long = {
    d.reset()
    d.update(bytes, from, until - from)
    val dig = d.digest()
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  /** The 16-minima MinHash signature of a document, computed in ONE
    * row-local pass — no exploded shingle rows, no distinct shuffle
    * (min is insensitive to duplicate shingles), no aggregation.
    * Returns an EMPTY array for texts with fewer than 3 tokens (such
    * docs have no shingles and thus no signature — the caller filters,
    * matching the aggregate form where they simply produce no row). */
  def sig16(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val sp = spacePositions(bytes)
    val tokens = sp.length + 1
    if (tokens < 3) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val d = md.get()
    val nWin = tokens - 2
    var i = 0
    while (i < nWin) {
      val from = if (i == 0) 0 else sp(i - 1) + 1
      val until = if (i + 2 == tokens - 1) bytes.length else sp(i + 2)
      val h = h32Slice(d, bytes, from, until)
      var k = 0
      while (k < K) {
        val v = (h * (2L * k + 1L) + 1000003L * k) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** Exact Jaccard (ppm, floor) of two documents' DISTINCT shingle
    * sets, computed at PAIR grain from the raw texts — the row-local
    * twin of the frame-grain verifiedJaccard (set sizes and the
    * intersection over shingle STRINGS, so h32 collisions cannot skew
    * it). Returns -1 when the union is empty (neither doc has a
    * shingle — unreachable from LSH candidates, whose docs have
    * signatures by construction; the expression maps it to NULL). */
  def jaccardPpm(a: UTF8String, b: UTF8String): Long = {
    val setA = shingleSet(a)
    val setB = shingleSet(b)
    var common = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) common += 1
    val union = setA.size().toLong + setB.size().toLong - common
    if (union == 0L) -1L
    else common.toLong * 1000000L / union
  }

  private val W1Prefix = "w1#".getBytes("UTF-8")

  /** Token-frequency SimHash at `bits` width (32 or 64), one row-local
    * pass — the native twin of the (doc, token)-count aggregation form
    * (ExtensionsDedup.simhashSig): tokens are `split(text, ' ')` with
    * empties kept, per-distinct-token occurrence counts weight the
    * ±1 bit contributions, bit k reads h32(token) for k < 32 and the
    * independently salted h32("w1#" + token) above, and a positive sum
    * sets the bit. Matches the aggregate form bit-for-bit (DedupSpec).
    */
  def simhash(text: UTF8String, bits: Int): Long = {
    val bytes = text.getBytes
    val sp = spacePositions(bytes)
    val tokens = sp.length + 1
    // Distinct tokens with occurrence counts (UTF8String keys compare
    // by bytes, so slices are exact).
    val counts = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i < tokens) {
      val from = if (i == 0) 0 else sp(i - 1) + 1
      val until = if (i == tokens - 1) bytes.length else sp(i)
      val tok = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, until))
      counts.merge(tok, 1, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Long](bits)
    val d = md.get()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      val c = e.getValue.toLong
      d.reset()
      d.update(tb)
      val dig0 = d.digest()
      val h0 = ((dig0(0) & 0xffL) << 24) | ((dig0(1) & 0xffL) << 16) |
        ((dig0(2) & 0xffL) << 8) | (dig0(3) & 0xffL)
      var h1 = 0L
      if (bits > 32) {
        d.reset()
        d.update(W1Prefix)
        d.update(tb)
        val dig1 = d.digest()
        h1 = ((dig1(0) & 0xffL) << 24) | ((dig1(1) & 0xffL) << 16) |
          ((dig1(2) & 0xffL) << 8) | (dig1(3) & 0xffL)
      }
      var k = 0
      while (k < bits) {
        val h = if (k < 32) h0 else h1
        val sign = if (((h >> (k % 32)) & 1L) == 1L) 1L else -1L
        sums(k) += c * sign
        k += 1
      }
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (sums(k) > 0L) sig += (1L << k)
      k += 1
    }
    sig
  }

  private def shingleSet(text: UTF8String): java.util.HashSet[UTF8String] = {
    val bytes = text.getBytes
    val sp = spacePositions(bytes)
    val tokens = sp.length + 1
    val set = new java.util.HashSet[UTF8String]()
    if (tokens < 3) return set
    var i = 0
    val nWin = tokens - 2
    while (i < nWin) {
      val from = if (i == 0) 0 else sp(i - 1) + 1
      val until = if (i + 2 == tokens - 1) bytes.length else sp(i + 2)
      set.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, until)))
      i += 1
    }
    set
  }

  /** The distinct n-token gram STRINGS of a document, first-occurrence
    * order, one row-local pass — the native twin of the
    * transform+explode+DISTINCT gram generators
    * (ExtensionsCore.shinglesOfDocsExploded / grams8OfDocsExploded):
    * same token rule (every single space is a split point, empty tokens
    * kept), same windows (none when the doc has fewer than n tokens),
    * distinct BY STRING. `explode(distinct_grams(text, n))` therefore
    * yields exactly the rows the exploded form's corpus-wide
    * (doc, gram) DISTINCT shuffle used to — with the dedup done in the
    * row scan instead of an exchange. */
  def distinctGrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val sp = spacePositions(bytes)
    val tokens = sp.length + 1
    if (tokens < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val nWin = tokens - n + 1
    while (i < nWin) {
      val from = if (i == 0) 0 else sp(i - 1) + 1
      val until = if (i + n - 1 == tokens - 1) bytes.length else sp(i + n - 1)
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, until)))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

}

/** Per-document MinHash signature as a native codegen expression
  * (preference order (b)): the aggregate form pays an exploded
  * corpus×shingles frame, a distinct shuffle, and a 16-column min
  * hash-aggregation; this is one generated-code call per document row.
  * Empty array (not NULL) for <3-token docs so the codegen stays the
  * simple non-null form — callers filter `size(sig) > 0`. */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.sig16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashKernel.sig16($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  def apply(c: Column): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(c)))
}

/** Pair-grain exact shingle-Jaccard as a native codegen expression —
  * lets the LSH verify tail run as (candidates ⋈ texts) + one kernel
  * call instead of three corpus-wide joins over the exploded distinct
  * shingle frame. NULL when neither side has a shingle. */
case class ShingleJaccardPpm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"shingle_jaccard_ppm requires two string inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_jaccard_ppm"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = MinhashKernel.jaccardPpm(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("jacc")
      s"""
         |long $v = graft.functions.MinhashKernel.jaccardPpm($a, $b);
         |if ($v < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleJaccardPpm {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ShingleJaccardPpm(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

/** Per-document token-frequency SimHash as a native codegen expression
  * — replaces the tokRows explode + (doc, token)-count shuffle + `bits`
  * conditional-sum aggregation with one generated-code call per row
  * (the MinhashSig rationale for the SimHash family, d04/d12). */
case class SimhashSig(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 32 || bits == 64, s"simhash width $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_sig requires a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashKernel.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {
  def apply(c: Column, bits: Int): Column =
    ColumnBridge.column(SimhashSig(ColumnBridge.expression(c), bits))
}

/** Per-document distinct n-gram strings as a native codegen expression:
  * `explode(distinct_grams(text, n))` replaces the transform + explode
  * + corpus-wide DISTINCT shuffle of the exploded gram generators —
  * the dedup happens inside the row scan, so the shingle/gram frames
  * (d14 candidates, t21/t22 novelty, d09/t16 contamination, d11
  * substring windows, the streaming twins) stop paying an exchange
  * just to be distinct. Empty array for <n-token docs (such docs have
  * no windows — the exploded form simply produced no rows). */
case class DistinctGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram width $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"distinct_grams requires a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_grams"

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.distinctGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashKernel.distinctGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctGrams {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(DistinctGrams(ColumnBridge.expression(c), n))
}
