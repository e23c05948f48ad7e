package graft.engine

import graft.SparkFixture
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** UPDATE/DELETE must not run a separate `filter(cond).count()` pass:
  * the affected-row count is an observed metric (CollectMetrics) on
  * the rewrite scan itself. Proven two ways: the payload counts stay
  * exact (incl. rows the WHERE doesn't match and an empty-match
  * UPDATE), and the Spark job count per statement is exactly 4 — the
  * narrow file-discovery query (predicate columns only; 2 jobs, AQE
  * runs its distinct's two stages as separate jobs), one rewrite job
  * over the affected files (scan + metric + checkpoint), one
  * append-write job. A count() pass would push it to 5. */
class SinglePassDmlSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS spdml")
    val loc = java.nio.file.Files.createTempDirectory("spdml").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE spdml LOCATION '$loc'")
    e
  }

  /** Count jobs started while `body` runs (listener events are async:
    * poll until the counter is quiet before reading it). */
  private def jobsDuring(body: => Payload): (Payload, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val p = body
      var last = -1
      var quiet = 0
      while (quiet < 2) {
        Thread.sleep(150)
        val cur = n.get()
        if (cur == last) quiet += 1 else { quiet = 0; last = cur }
      }
      (p, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("UPDATE runs discovery + one rewrite scan + one write, exact count") {
    g.execute("CREATE TABLE spdml.t (k INTEGER, v INTEGER)")
    g.execute("INSERT INTO spdml.t SELECT id, id * 10 FROM range(100)")
    val (p, jobs) = jobsDuring(g.execute("UPDATE spdml.t SET v = v + 1 WHERE k < 30"))
    assert(p == Payload.Update(30))
    assert(jobs == 4, s"expected discovery(2)+rewrite+write = 4 jobs, saw $jobs")
    g.execute("SELECT SUM(v) AS s FROM spdml.t") match {
      case Payload.Select(_, rows) =>
        // 10*(0+..+99) + 30 ones
        assert(rows.head.head == 49500L + 30L)
      case other => fail(s"$other")
    }
  }

  test("UPDATE with zero matching rows reports 0") {
    val (p, _) = jobsDuring(g.execute("UPDATE spdml.t SET v = 0 WHERE k > 1000"))
    assert(p == Payload.Update(0))
  }

  test("DELETE runs discovery + one rewrite scan + one write, exact count") {
    val (p, jobs) = jobsDuring(g.execute("DELETE FROM spdml.t WHERE k >= 70"))
    assert(p == Payload.Delete(30))
    assert(jobs == 4, s"expected discovery(2)+rewrite+write = 4 jobs, saw $jobs")
    g.execute("SELECT COUNT(*) AS n FROM spdml.t") match {
      case Payload.Select(_, rows) => assert(rows.head.head == 70L)
      case other => fail(s"$other")
    }
  }

  test("unconditional DELETE counts every row") {
    val (p, _) = jobsDuring(g.execute("DELETE FROM spdml.t"))
    assert(p == Payload.Delete(70))
    g.execute("SELECT COUNT(*) AS n FROM spdml.t") match {
      case Payload.Select(_, rows) => assert(rows.head.head == 0L)
      case other => fail(s"$other")
    }
  }
}
