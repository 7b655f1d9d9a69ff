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

  test("readers stay consistent while UPDATE rewrites flip versions") {
    val root = Files.createTempDirectory("stress-mvcc").toString
    val setup = new Engine(spark, root)
    setup.sql("create scope mvcc")
    setup.sql("use mvcc")
    setup.sql("create type row_t (id uint pk, x int)")
    (0 until 20).foreach(i => setup.sql(s"insert into row_t (id, x) ($i, 0)"))

    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = pool.submit(new Runnable {
      def run(): Unit = {
        val e = new Engine(spark, root)
        e.sql("use mvcc")
        start.await()
        (1 to 6).foreach { k =>
          e.sql(s"update row_t set x = $k") match {
            case Status(true, _) =>
            case other => fail(s"update failed: $other")
          }
        }
        stop.set(true)
      }
    })
    // reader hammers row-count scans: every scan must see a complete
    // snapshot (exactly 20 rows), never a half-deleted directory —
    // with in-place delete+swap this throws FileNotFound or drops rows
    val reader = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        val e = new Engine(spark, root)
        e.sql("use mvcc")
        start.await()
        var scans = 0
        while (!stop.get()) {
          e.sql("select id from row_t") match {
            case Rows(df) =>
              val n = df.collect().length
              assert(n == 20, s"scan saw $n rows")
              scans += 1
            case other => fail(s"read failed: $other")
          }
        }
        scans
      }
    })
    start.countDown()
    writer.get(300, TimeUnit.SECONDS)
    val scans = reader.get(300, TimeUnit.SECONDS)
    pool.shutdown()
    assert(scans > 0)
    // final state reflects the last committed rewrite
    val e = new Engine(spark, root)
    e.sql("use mvcc")
    val xs = e.sql("select x from row_t") match {
      case Rows(df) => df.collect().map(_.getLong(0)).toSet
      case other => fail(s"$other")
    }
    assert(xs == Set(6L))
  }
}
