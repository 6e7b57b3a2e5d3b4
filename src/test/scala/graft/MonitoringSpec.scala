package graft

import org.apache.spark.sql.functions._

import graft.ops.Monitoring

class MonitoringSpec extends SparkSpec {

  test("metrics listener observes action durations and outcomes") {
    val l = Monitoring.install(spark)
    try {
      Tables.nation(spark, sf).groupBy("n_regionkey").count().collect()
      // listener callbacks are async; poll briefly
      var tries = 0
      while (l.metrics.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val ms = l.drain()
      assert(ms.nonEmpty, "no metrics captured")
      assert(ms.exists(m => !m.failed && m.durationMs >= 0))
    } finally spark.listenerManager.unregister(l)
  }

  test("runWithRestarts retries flaky work with backoff and succeeds") {
    var calls = 0
    val (result, attempts) = Monitoring.runWithRestarts(maxRestarts = 3, backoffMs = 10) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(result == 42 && attempts == 3)
  }

  test("runWithRestarts rethrows after exhausting restarts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Monitoring.runWithRestarts(maxRestarts = 2, backoffMs = 1) {
        calls += 1
        throw new RuntimeException("permanent")
      }
    }
    assert(e.getMessage == "permanent" && calls == 3)
  }
}
