package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the Bench batch/streaming split registry
  * ([[SparkEntry.streamingQueries]]): a renamed or deleted drive must
  * fail HERE, not silently fall into the batch subtotal and skew the
  * round-over-round comparison the split exists to protect.
  */
class BenchSplitSpec extends AnyFunSuite {

  test("every registered streaming query exists in SparkEntry.queries") {
    val missing = SparkEntry.streamingQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"streamingQueries not in queries: $missing")
  }

  test("naming-convention queries are all registered as streaming") {
    // the *_stream suffix is the streaming-drive naming convention; a
    // new drive that follows it but skips the registry would be
    // misclassified into batch_sec
    val conventional = SparkEntry.queries.keySet.filter(_.endsWith("_stream"))
    val unregistered = conventional -- SparkEntry.streamingQueries
    assert(unregistered.isEmpty,
      s"*_stream queries missing from streamingQueries: $unregistered")
  }
}
