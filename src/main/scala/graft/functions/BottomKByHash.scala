package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic per-group sampling: the k values with the smallest
  * md5(value), returned sorted by hash — "bottom-k by hash" consistent
  * sampling (the fixed-size cousin of MinHash; the same sample is drawn
  * for the same group regardless of row order, partitioning, or engine).
  *
  * Why a custom TypedImperativeAggregate instead of a window: row_number
  * over (group, hash) sorts every row of every group; this aggregate keeps
  * an O(k) bounded max-heap per group, updates in O(log k) per row, and
  * its buffers MERGE — so Catalyst plans map-side partial aggregation and
  * only k rows per group per partition ever reach the shuffle. At 100 TB
  * that is the difference between sampling in one pass and sorting the
  * corpus.
  *
  * Deterministic (md5 + value tiebreak) => the DuckDB oracle reproduces
  * the exact sample with row_number over (md5(value), value).
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]] {

  require(k > 0, "bottom_k_by_hash requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "bottom_k_by_hash"

  // max-heap on (hash, value): head is the largest retained pair, evicted
  // when a smaller one arrives
  private def ord: Ordering[(String, String)] = Ordering.Tuple2[String, String]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
    mutable.PriorityQueue.empty[(String, String)](ord)

  // One digest instance per deserialized expression (= per task thread;
  // MessageDigest.digest resets after each call) and table-lookup hex —
  // the update path allocates only the 32-char result, no per-row
  // getInstance/format.
  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = HexChars(b >> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def update(buf: mutable.PriorityQueue[(String, String)],
      input: InternalRow): mutable.PriorityQueue[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val pair = (md5hex(s), s)
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, String)],
      other: mutable.PriorityQueue[(String, String)]): mutable.PriorityQueue[(String, String)] = {
    other.foreach { pair =>
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted(ord).map(p => UTF8String.fromString(p._2)).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeUTF(h); out.writeUTF(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readUTF())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(child = newChildren.head)
}

object BottomKByHash {
  /** Idempotently register `bottom_k_by_hash(value, k)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_by_hash",
      exprs => {
        require(exprs.length == 2,
          s"bottom_k_by_hash(value, k) takes exactly 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "bottom_k_by_hash(value, k): k must be a literal integer")
        BottomKByHash(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      },
      "built-in")
}
