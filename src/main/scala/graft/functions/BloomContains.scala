package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: membership probe of a 64-bit key against a
 * Bloom filter whose bit array ships WITH THE PLAN (a reference object in
 * the generated class, broadcast to every executor exactly like a literal).
 *
 * This is the decontamination prefilter shape (The Pile, RefinedWeb,
 * carbon-filter practice): the benchmark/eval n-gram set collapses to a
 * fixed-size bit array on the driver, and the corpus-side gram stream is
 * probed INSIDE whole-stage codegen before anything shuffles — at 100 TB
 * the gram stream never leaves its scan task unless the filter says the
 * gram might be contaminated. The filter is one-sided (no false
 * negatives), so an exact confirm-join on the survivors reproduces the
 * exact answer; the Bloom pass only removes provably-clean volume.
 *
 * Probe scheme (Kirsch–Mitzenmacher double hashing over a splitmix64
 * finalizer, power-of-two bit count → mask, no modulo): deterministic pure
 * integer math, identical in `eval` and `doGenCode`.
 */
case class BloomContains(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0,
    s"bloom word count must be a power of two, got ${bits.length}")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  private val mask: Long = bits.length.toLong * 64L - 1L

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects a bigint key, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val h1 = BloomContains.mix64(h)
    val h2 = BloomContains.mix64(h + 0x9E3779B97F4A7C15L) | 1L
    var j = 0
    var hit = true
    while (hit && j < numHashes) {
      val idx = (h1 + j.toLong * h2) & mask
      hit = (bits((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) != 0L
      j += 1
    }
    hit
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      s"""
         |long $z = $h;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |long $h1 = $z ^ ($z >>> 31);
         |$z = $h + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |long $h2 = ($z ^ ($z >>> 31)) | 1L;
         |${ev.value} = true;
         |for (int $j = 0; $j < $numHashes; $j++) {
         |  long $idx = ($h1 + (long) $j * $h2) & ${mask}L;
         |  if (($bitsRef[(int) ($idx >>> 6)] & (1L << (int) ($idx & 63L))) == 0L) {
         |    ${ev.value} = false; break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains"
}

object BloomContains {
  import org.apache.spark.sql.GraftBridge

  /** splitmix64 finalizer — the shared scrambler for build and probe. */
  def mix64(h: Long): Long = {
    var z = h
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Smallest power-of-two bit count giving ~`bitsPerKey` bits per key
    * (floor 1024 bits so an empty/near-empty build stays well-formed). */
  def sizeFor(nKeys: Long, bitsPerKey: Int = 10): Int = {
    val want = math.max(1024L, nKeys * bitsPerKey.toLong)
    var m = 1024L
    while (m < want) m <<= 1
    require(m <= (1L << 34), s"bloom of $m bits exceeds the plan-shippable cap")
    m.toInt
  }

  /** Build the bit array over 64-bit keys with the same double-hash probe
    * sequence the expression checks. */
  def build(keys: Iterator[Long], mBits: Int, numHashes: Int = 7): Array[Long] = {
    require((mBits & (mBits - 1)) == 0, s"mBits must be a power of two, got $mBits")
    val words = new Array[Long](math.max(16, mBits / 64))
    val mask = mBits.toLong - 1L
    keys.foreach { h =>
      val h1 = mix64(h)
      val h2 = mix64(h + 0x9E3779B97F4A7C15L) | 1L
      var j = 0
      while (j < numHashes) {
        val idx = (h1 + j.toLong * h2) & mask
        words((idx >>> 6).toInt) |= 1L << (idx & 63L).toInt
        j += 1
      }
    }
    words
  }

  /** Column-API entry point. */
  def contains(key: Column, bits: Array[Long], numHashes: Int = 7): Column =
    GraftBridge.columnOf(BloomContains(GraftBridge.expressionOf(key), bits, numHashes))
}
