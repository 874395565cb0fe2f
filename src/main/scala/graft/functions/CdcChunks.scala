package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the whole FastCDC chunk walk of one
  * document — candidate scan, [minLen, maxLen] normalization, and chunk
  * hashing — as ONE tight per-row loop returning
  * `array<struct<ch: string, cl: bigint>>`.
  *
  * Why an Expression and not the relational spelling: the per-position
  * boundary hash needs the document text at every position, and both
  * relational routes pay for that association — an explode carries (and
  * row-copies) the full text once per position (Σ chars × doc size of
  * UnsafeRow traffic; the r7 shape), while a `filter(sequence(...))`
  * higher-order lambda evaluates the hash expression interpreted (the
  * first r8 shape). Both measured 5.8–7.5 s at sf0.1 with the hash work
  * itself a fraction of that. Here the loop runs compiled against the
  * document's UTF-8 bytes directly: one char→byte offset table per doc,
  * then windows and chunks hash in place with zero row amplification —
  * the boundary scan can even skip the positions inside (prev, prev+min)
  * that normalization could never accept, which the declarative forms
  * must hash anyway. Semantics are BIT-IDENTICAL to the SQL spelling
  * (md5: `conv(substring(md5(substring(text,i,8)),1,8),16,10) % m`;
  * fast: `pmod(xxhash64(substring(text,i,8)), m)` at Spark's seed 42),
  * so the md5 form stays hash-verified against the DuckDB recursive-CTE
  * oracle. Evaluation is per-ROW (CodegenFallback) — one interpreted
  * call per document dispatching into compiled JVM code, not one per
  * position. */
case class CdcChunkWalk(child: Expression, window: Int, modulus: Int,
                        minLen: Int, maxLen: Int, fast: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects STRING, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ch", StringType, nullable = false),
    StructField("cl", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override protected def withNewChildInternal(newChild: Expression): CdcChunkWalk =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // char index -> byte offset (chars, not bytes: substring() semantics)
    var nChars = 0
    var off = 0
    while (off < bytes.length) {
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    val charOff = new Array[Int](nChars + 1)
    var c = 0
    off = 0
    while (off < bytes.length) {
      charOff(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    charOff(nChars) = bytes.length
    if (nChars < window) return new GenericArrayData(Array.empty[Any])
    val md = if (fast) null
             else java.security.MessageDigest.getInstance("MD5")
    // boundary condition at 1-based char position i
    def isCut(i: Int): Boolean = {
      val s = charOff(i - 1)
      val len = charOff(i - 1 + window) - s
      if (fast) {
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s,
                                      len, 42L)
        val m = h % modulus
        (if (m < 0) m + modulus else m) == 0L
      } else {
        md.reset()
        md.update(bytes, s, len)
        val d = md.digest()
        // first 8 hex digits as an unsigned 32-bit value — exactly
        // conv(substring(md5(...), 1, 8), 16, 10)
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        v % modulus == 0L
      }
    }
    // the normalized walk: next cut = first candidate in
    // [prev+minLen, prev+maxLen] (candidates exist only at positions
    // 2..nChars-window+1), else the forced prev+maxLen; stop once the
    // cut would pass doc end
    val cuts = scala.collection.mutable.ArrayBuffer(1)
    var done = false
    while (!done) {
      val b = cuts.last
      val lo = math.max(b + minLen, 2)
      val hi = math.min(b + maxLen, nChars - window + 1)
      var i = lo
      var cand = -1
      while (cand < 0 && i <= hi) {
        if (isCut(i)) cand = i
        i += 1
      }
      val nxt = if (cand > 0) cand else b + maxLen
      if (nxt <= nChars) cuts += nxt else done = true
    }
    def chunkHash(s: Int, e: Int): UTF8String = {
      val bs = charOff(s - 1)
      val bl = charOff(e - 1) - bs
      if (fast)
        UTF8String.fromString(XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + bs, bl, 42L).toString)
      else {
        md.reset()
        md.update(bytes, bs, bl)
        val d = md.digest()
        val sb = new java.lang.StringBuilder(32)
        var k = 0
        while (k < 16) {
          sb.append(Character.forDigit((d(k) >> 4) & 0xf, 16))
          sb.append(Character.forDigit(d(k) & 0xf, 16))
          k += 1
        }
        UTF8String.fromString(sb.toString)
      }
    }
    val out = new Array[Any](cuts.length)
    var j = 0
    while (j < cuts.length) {
      val s = cuts(j)
      val e = if (j + 1 < cuts.length) cuts(j + 1) else nChars + 1
      out(j) = InternalRow(chunkHash(s, e), (e - s).toLong)
      j += 1
    }
    new GenericArrayData(out)
  }
}
