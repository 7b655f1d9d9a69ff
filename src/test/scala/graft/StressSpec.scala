package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** Concurrent query+ingest stress — the Spark-side analog of the
  * reference's bench/qstress.c: multiple sessions hammer the same
  * scope with PK-checked inserts and reads; uniqueness must hold and
  * nothing must be lost. */
class StressSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  test("concurrent PK-checked inserts keep uniqueness, no lost rows") {
    val root = Files.createTempDirectory("stress-scope").toString
    val setup = new Engine(spark, root)
    assert(setup.sql("create scope stress") == Status(true, ""))
    setup.sql("use stress")
    setup.sql("create type item (id uint pk, tag text)")

    val sessions = 4
    val perSession = 10
    val pool = Executors.newFixedThreadPool(sessions)
    val start = new CountDownLatch(1)
    // every session tries the SAME ids: exactly one insert per id may
    // win; the others must fail with a duplicate-key status
    val results = (0 until sessions).map { sid =>
      pool.submit(new java.util.concurrent.Callable[Seq[Boolean]] {
        def call(): Seq[Boolean] = {
          val e = new Engine(spark, root)
          e.sql("use stress")
          start.await()
          (0 until perSession).map { i =>
            e.sql(s"insert into item (id, tag) ($i, 's$sid')") match {
              case Status(true, _) => true
              case Status(false, m) if m.contains("duplicate") => false
              case other => fail(s"unexpected $other")
            }
          }
        }
      })
    }
    start.countDown()
    val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // exactly one winner per id across all sessions
    val winsPerId = (0 until perSession).map(i =>
      outcomes.count(o => o(i)))
    assert(winsPerId.forall(_ == 1), s"wins per id: $winsPerId")
    // table holds exactly perSession unique rows
    val reader = new Engine(spark, root)
    reader.sql("use stress")
    val rows = reader.sql("select id from item") match {
      case Rows(df) => df.collect().map(_.getLong(0)).sorted.toSeq
      case other => fail(s"$other")
    }
    assert(rows == (0L until perSession.toLong))
  }
}
