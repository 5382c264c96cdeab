package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** DDSketch quantile summary (Masson, Rim & Lee, "DDSketch: A Fast and
  * Fully-Mergeable Quantile Sketch with Relative-Error Guarantees",
  * VLDB 2019): positive values hash to geometric buckets
  * `i = ceil(log_γ(x))` with `γ = (1+α)/(1−α)`, so bucket `i` covers
  * `(γ^(i−1), γ^i]` and the midpoint-style estimate `2γ^i/(γ+1)` is
  * within relative error α of EVERY value in the bucket (the two edge
  * ratios are exactly `1−α` and `1+α`). Merging is pointwise count
  * addition — lossless with respect to the guarantee and fully
  * order-independent, so Catalyst plans a map-side partial aggregate and
  * only `O(log(max/min)/α)` buckets per partition reach the shuffle: the
  * 100 TB quantile play (exact percentile_disc at that scale sorts the
  * whole column; this shuffles a few hundred counters per partition).
  * Because bucket counts are a pure function of the input MULTISET, the
  * emitted quantile estimates are deterministic under any partitioning /
  * merge order — which is what lets a SQL oracle assert the α-bound
  * booleans as constant-true while the estimates themselves stay
  * engine-internal (their log/pow arithmetic has no cross-engine
  * bit-parity contract; same convention as q_approx_agg).
  *
  * Output row: (n, p50, p95, p99) — n includes non-positive inputs,
  * which land in a dedicated zero bucket BELOW every geometric bucket
  * (rank-correct for them; their estimate is 0.0, outside the relative
  * guarantee, which only ever applies to positive data like prices).
  * Quantile rank convention matches percentile_disc / quantile_disc:
  * the 1-based rank is `max(1, ceil(q·n))`.
  */
case class DdSketch(
    child: Expression,
    alpha: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DdSketch.Buffer] {

  require(alpha > 0 && alpha < 1, "dd_sketch requires 0 < alpha < 1")

  private val gamma: Double = (1 + alpha) / (1 - alpha)
  private val lnGamma: Double = math.log(gamma)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("p50", DoubleType, nullable = true),
    StructField("p95", DoubleType, nullable = true),
    StructField("p99", DoubleType, nullable = true)))
  override def prettyName: String = "dd_sketch"

  override def createAggregationBuffer(): DdSketch.Buffer =
    new DdSketch.Buffer(mutable.HashMap.empty, 0L, 0L)

  override def update(buf: DdSketch.Buffer, input: InternalRow): DdSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].doubleValue()
      buf.n += 1
      if (x <= 0.0) buf.nZero += 1
      else {
        val i = math.ceil(math.log(x) / lnGamma).toInt
        buf.counts.update(i, buf.counts.getOrElse(i, 0L) + 1L)
      }
    }
    buf
  }

  override def merge(buf: DdSketch.Buffer, other: DdSketch.Buffer): DdSketch.Buffer = {
    buf.n += other.n
    buf.nZero += other.nZero
    other.counts.foreach { case (i, c) =>
      buf.counts.update(i, buf.counts.getOrElse(i, 0L) + c)
    }
    buf
  }

  /** Element estimate at the percentile_disc rank of q: walk buckets in
    * index order (zero bucket first) until the cumulative count reaches
    * `max(1, ceil(q·n))`.
    */
  private def quantile(buf: DdSketch.Buffer, q: Double): Any = {
    if (buf.n == 0L) null
    else {
      val k = math.max(1L, math.ceil(q * buf.n).toLong)
      if (k <= buf.nZero) java.lang.Double.valueOf(0.0)
      else {
        var cum = buf.nZero
        var est: Any = null
        val it = buf.counts.toArray.sortBy(_._1).iterator
        while (est == null && it.hasNext) {
          val (i, c) = it.next()
          cum += c
          if (cum >= k)
            est = java.lang.Double.valueOf(2.0 * math.pow(gamma, i) / (gamma + 1))
        }
        est
      }
    }
  }

  override def eval(buf: DdSketch.Buffer): Any =
    InternalRow(buf.n, quantile(buf, 0.5), quantile(buf, 0.95),
      quantile(buf, 0.99))

  override def serialize(buf: DdSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeLong(buf.nZero)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (i, c) => out.writeInt(i); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DdSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.n = in.readLong()
    buf.nZero = in.readLong()
    val sz = in.readInt()
    (0 until sz).foreach(_ => buf.counts.update(in.readInt(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdSketch =
    copy(child = newChildren.head)
}

object DdSketch {
  /** Mutable DD state: geometric bucket counts, total n, non-positive n. */
  final class Buffer(val counts: mutable.HashMap[Int, Long], var n: Long,
      var nZero: Long)

  /** Idempotently register `dd_sketch(value, alpha)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dd_sketch",
      exprs => {
        require(exprs.length == 2,
          s"dd_sketch(value, alpha) takes exactly 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "dd_sketch(value, alpha): alpha must be a literal")
        val a = exprs(1).eval() match {
          // SQL fractional literals arrive as Catalyst Decimal, not Number
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"dd_sketch alpha literal has unsupported type: $other")
        }
        DdSketch(exprs.head, a)
      },
      "built-in")
}
