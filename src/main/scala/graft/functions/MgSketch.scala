package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982) in the
  * MERGEABLE form of Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * at most `m` counters; an absent item with all counters occupied
  * decrements every counter instead of being stored, and two summaries
  * merge by pointwise-adding counters then subtracting the (m+1)-th
  * largest total and dropping non-positives. The buffer is O(m)
  * regardless of input size and merges losslessly with respect to the
  * error guarantee — so Catalyst plans a map-side partial aggregate and
  * only m counters per partition reach the shuffle: the 100 TB
  * frequent-items play (a groupBy(token) at that scale shuffles the
  * whole vocabulary; this shuffles m rows per partition).
  *
  * Output row: (items: map<string,long>, n: long, err: long) where
  *   c(x) <= true(x)                 for every stored counter, and
  *   true(x) - c(x) <= err           for EVERY item (absent => c = 0),
  * with err = (n - sum(counters)) / (m + 1), the total-decrement bound.
  * Both inequalities hold for ANY partitioning / merge order — that
  * order-independence is what lets a SQL oracle assert them as
  * constant-true booleans while the counter values themselves legally
  * vary run to run.
  */
case class MgSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSketch.Buffer] {

  require(m > 0, "mg_sketch requires capacity m > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", MapType(StringType, LongType), nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): MgSketch.Buffer =
    new MgSketch.Buffer(mutable.HashMap.empty, 0L)

  override def update(buf: MgSketch.Buffer, input: InternalRow): MgSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val s = v.toString
      buf.counts.get(s) match {
        case Some(c) => buf.counts.update(s, c + 1)
        case None if buf.counts.size < m => buf.counts.update(s, 1L)
        case None =>
          // classic MG step: the incoming item cancels one unit of every
          // stored counter; zeros vacate their slots
          val dead = mutable.ArrayBuffer.empty[String]
          buf.counts.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.counts.update(k, c - 1)
          }
          dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(buf: MgSketch.Buffer, other: MgSketch.Buffer): MgSketch.Buffer = {
    buf.n += other.n
    other.counts.foreach { case (k, c) =>
      buf.counts.update(k, buf.counts.getOrElse(k, 0L) + c)
    }
    if (buf.counts.size > m) {
      // subtract the (m+1)-th largest counter from all, drop <= 0 —
      // restores |counters| <= m while charging every survivor the same
      // decrement, which is what keeps the error bound additive
      val d = buf.counts.values.toArray.sorted(Ordering[Long].reverse)(m)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.counts.foreach { case (k, c) =>
        if (c - d <= 0L) dead += k else buf.counts.update(k, c - d)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: MgSketch.Buffer): Any = {
    val ks = buf.counts.keys.toArray.sorted
    val keys = new GenericArrayData(
      ks.map(k => UTF8String.fromString(k)).toArray[Any])
    val vals = new GenericArrayData(ks.map(buf.counts).toArray[Any])
    val stored = buf.counts.values.sum
    InternalRow(new ArrayBasedMapData(keys, vals), buf.n,
      (buf.n - stored) / (m + 1).toLong)
  }

  override def serialize(buf: MgSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.n = in.readLong()
    val sz = in.readInt()
    (0 until sz).foreach(_ => buf.counts.update(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgSketch =
    copy(child = newChildren.head)
}

object MgSketch {
  /** Mutable MG state: stored counters + total items observed. */
  final class Buffer(val counts: mutable.HashMap[String, Long], var n: Long)

  /** Idempotently register `mg_sketch(value, m)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_sketch",
      exprs => {
        require(exprs.length == 2,
          s"mg_sketch(value, m) takes exactly 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "mg_sketch(value, m): m must be a literal integer")
        MgSketch(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      },
      "built-in")
}
