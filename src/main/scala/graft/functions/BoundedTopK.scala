package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded-heap top-k aggregate: keeps the k largest (score, id) pairs per
 * group with a size-k min-heap.
 *
 * The window formulation (`row_number() over (partition by q order by score
 * desc)` then `rn <= k`) SORTS every scored row of a partition; at 100 TB
 * ANN scale that's billions of rows sorted to keep 5. This aggregate is
 * algebraic: partial heaps of size k build map-side, only k rows per
 * partition per group cross the shuffle, merge is O(k log k). This is the
 * `TypedImperativeAggregate`-style optimization SURVEY §4 flags, done as a
 * typed `Aggregator` exposed through `udaf()`.
 *
 * Ordering matches the window tie-break exactly: score desc, then id asc —
 * results are bitwise-identical to the window top-k, so the DuckDB oracle
 * is unchanged when this is swapped in.
 */
object BoundedTopK {

  final case class Scored(score: Double, id: Long)

  /** score desc, id asc — the canonical deterministic top-k order. */
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final case class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    override def zero: List[Scored] = Nil

    // buffer kept sorted worst-first (list head = current kth place);
    // k is small (≤ tens), so linear insertion beats heap constant factors
    override def reduce(buf: List[Scored], in: Scored): List[Scored] =
      if (buf.lengthCompare(k) < 0) insert(buf, in)
      else if (better(in, buf.head)) insert(buf.tail, in)
      else buf

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(reduce)

    override def finish(buf: List[Scored]): Seq[Scored] =
      buf.sortWith(better)

    private def insert(buf: List[Scored], in: Scored): List[Scored] = {
      val (worse, rest) = buf.span(s => !better(s, in))
      worse ::: in :: rest
    }

    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Untyped column form: `topK(k)(score, id)` → array<struct<score,id>>
    * ordered best-first (one argument column per `Scored` field). */
  def topK(k: Int): ((Column, Column) => Column) = {
    val fn = udaf(TopKAgg(k))
    (score: Column, id: Column) => fn(score, id)
  }
}
