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

  test("concurrent UPDATE rewrite never loses a concurrent insert") {
    val root = Files.createTempDirectory("stress-rw").toString
    val setup = new Engine(spark, root)
    setup.sql("create scope rwstress")
    setup.sql("use rwstress")
    setup.sql("create type acct (id uint pk, bal int)")
    setup.sql("insert into acct (id, bal) (0, 100)")

    // one session repeatedly rewrites (UPDATE = snapshot/delete/swap),
    // another appends fresh PKs; without the shared table write lock
    // an append landing between snapshot and delete is silently lost
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val n = 8
    val updater = pool.submit(new Runnable {
      def run(): Unit = {
        val e = new Engine(spark, root)
        e.sql("use rwstress")
        start.await()
        (0 until n).foreach { _ =>
          e.sql("update acct set bal = bal + 1 where id = 0") match {
            case Status(true, _) =>
            case other => fail(s"update failed: $other")
          }
        }
      }
    })
    val inserter = pool.submit(new Runnable {
      def run(): Unit = {
        val e = new Engine(spark, root)
        e.sql("use rwstress")
        start.await()
        (1 to n).foreach { i =>
          e.sql(s"insert into acct (id, bal) ($i, $i)") match {
            case Status(true, _) =>
            case other => fail(s"insert failed: $other")
          }
        }
      }
    })
    start.countDown()
    updater.get(300, TimeUnit.SECONDS)
    inserter.get(300, TimeUnit.SECONDS)
    pool.shutdown()

    val reader = new Engine(spark, root)
    reader.sql("use rwstress")
    val ids = reader.sql("select id from acct") match {
      case Rows(df) => df.collect().map(_.getLong(0)).sorted.toSeq
      case other => fail(s"$other")
    }
    assert(ids == (0L to n.toLong), s"lost rows: got $ids")
    // the updater's increments all survived too
    val bal = reader.sql("select bal from acct where id = 0") match {
      case Rows(df) => df.collect()(0).getLong(0)
      case other => fail(s"$other")
    }
    assert(bal == 100L + n)
  }
}
