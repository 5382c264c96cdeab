package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-session safety of the session-scoped shared substrates
  * (DedupOps.staged's per-key build locks, SourceOps' staged JSONL
  * datasets, SimilarityOps' IVF assignment + corpus-count caches): a
  * production session serves many queries AT ONCE, and the driver's
  * serial harness can never catch a build race. Eight substrate-sharing
  * queries start simultaneously on the shared session (a start latch
  * maximizes contention on the at-most-once build paths), twice over —
  * the first wave hits whatever is still cold in this JVM, the second
  * is warm by construction — and every wave's rows must equal the
  * serial baseline's.
  */
class ConcurrencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  // contention groups: four shingle-substrate consumers, two IVF-cache
  // consumers, two staged-JSONL consumers
  private val names = Seq(
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "text_boilerplate",
    "sim_ivf_topk", "sim_ivf_quantized",
    "source_jsonl_scan", "source_jsonl_pruned")

  private def runConcurrent(): Map[String, Seq[org.apache.spark.sql.Row]] = {
    val start = new CountDownLatch(1)
    val results =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[org.apache.spark.sql.Row]]()
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Throwable)]()
    val threads = names.map { n =>
      val t = new Thread(() => {
        start.await()
        try results.put(n, SparkEntry.queries(n)(spark, dir).collect().toSeq)
        catch { case e: Throwable => errors.add(n -> e) }
      }, s"conc-$n")
      t.setDaemon(true); t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(TimeUnit.MINUTES.toMillis(10)))
    assert(errors.isEmpty,
      Option(errors.peek())
        .map { case (n, e) => s"concurrent query $n failed: $e" }
        .getOrElse(""))
    import scala.jdk.CollectionConverters._
    results.asScala.toMap
  }

  test("8 substrate-sharing queries agree under concurrency (cold + warm)") {
    val wave1 = runConcurrent() // cold for whatever this JVM hasn't staged
    val wave2 = runConcurrent() // warm by construction
    val serial = names.map(n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().toSeq).toMap
    for (n <- names) {
      assert(wave1(n) == serial(n), s"$n: cold-concurrent != serial")
      assert(wave2(n) == serial(n), s"$n: warm-concurrent != serial")
    }
  }
}
