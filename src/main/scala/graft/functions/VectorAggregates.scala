package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the `TypedColumn`/`Aggregator` extension path
  * from the custom-operator preference order): single-pass element-wise
  * vector sum. Versus the posexplode route (q56), this keeps each vector
  * as ONE row through the aggregation — the shuffle carries one partial
  * array per (group, partition) instead of `dim` rows per vector, which is
  * the shape you want when `dim` is large (1024+ embedding models) and the
  * group count is modest.
  *
  * Mutable-buffer contract: `reduce`/`merge` mutate and return their first
  * argument (the documented Aggregator optimization); a zero-length buffer
  * is the zero element so the dimension needn't be known up front.
  */
object VecSumAgg extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    if (v == null) return buf
    val b = if (buf.length >= v.length) buf
            else java.util.Arrays.copyOf(buf, v.length)
    var i = 0
    while (i < v.length) { b(i) += v(i); i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
