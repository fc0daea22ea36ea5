package graft

import graft.sources.{GraftCatalog, GraftTable}
import org.apache.spark.sql.functions._

/** Catalog semantics: pinned-snapshot reads, all-or-nothing multi-table
  * commits, conflict detection, concurrent disjoint commits. */
class GraftCatalogSpec extends GraftSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i.toLong % 8, s"doc-$i"))
      .toDF("id", "bucket", "payload")

  test("pinned reads: catalog sees the committed state, not table HEAD") {
    val cat = freshDir("cat_pin_")
    val tA = freshDir("cat_pin_a_") + "/a"
    val tB = freshDir("cat_pin_b_") + "/b"
    GraftTable.append(rows(0, 40), tA, "bucket")
    GraftTable.append(rows(0, 10), tB, "bucket")
    GraftCatalog.commit(spark, cat, updates = Map.empty,
      register = Map("corpus" -> tA, "index" -> tB))
    // both tables advance — but no catalog commit yet
    GraftTable.append(rows(40, 90), tA, "bucket")
    GraftTable.append(rows(10, 30), tB, "bucket")
    assert(GraftCatalog.read(spark, cat, "corpus").count() == 40)
    assert(GraftCatalog.read(spark, cat, "index").count() == 10)
    assert(GraftTable.read(spark, tA).count() == 90, "table HEAD did advance")
    // ONE commit moves both pins — readers can never see a mixed state
    GraftCatalog.commit(spark, cat,
      updates = Map("corpus" -> 2L, "index" -> 2L))
    assert(GraftCatalog.read(spark, cat, "corpus").count() == 90)
    assert(GraftCatalog.read(spark, cat, "index").count() == 30)
    assert(GraftCatalog.current(spark, cat).get.version == 2L)
  }

  test("conflicting commit on a moved table fails; unrelated commit merges") {
    val cat = freshDir("cat_conf_")
    val tA = freshDir("cat_conf_a_") + "/a"
    val tB = freshDir("cat_conf_b_") + "/b"
    GraftTable.append(rows(0, 10), tA, "bucket")
    GraftTable.append(rows(0, 10), tB, "bucket")
    val v1 = GraftCatalog.commit(spark, cat, updates = Map.empty,
      register = Map("a" -> tA, "b" -> tB))
    // writer 1 advances a and commits (based on v1)
    GraftTable.append(rows(10, 20), tA, "bucket")
    GraftCatalog.commit(spark, cat, updates = Map("a" -> 2L),
      basedOn = Some(v1.version))
    // writer 2, still based on v1, tries to move a elsewhere: conflict
    intercept[GraftCatalog.CommitConflict] {
      GraftCatalog.commit(spark, cat, updates = Map("a" -> 1L),
        basedOn = Some(v1.version))
    }
    // writer 3, based on v1 but touching only b: merges cleanly and
    // PRESERVES writer 1's a-pin
    GraftTable.append(rows(10, 25), tB, "bucket")
    val v3 = GraftCatalog.commit(spark, cat, updates = Map("b" -> 2L),
      basedOn = Some(v1.version))
    assert(v3.tables.find(_.name == "a").get.snapshotId == 2L)
    assert(v3.tables.find(_.name == "b").get.snapshotId == 2L)
    assert(GraftCatalog.read(spark, cat, "a").count() == 20)
    assert(GraftCatalog.read(spark, cat, "b").count() == 25)
  }

  test("concurrent disjoint commits both survive") {
    val cat = freshDir("cat_race_")
    val tA = freshDir("cat_race_a_") + "/a"
    val tB = freshDir("cat_race_b_") + "/b"
    GraftTable.append(rows(0, 5), tA, "bucket")
    GraftTable.append(rows(0, 5), tB, "bucket")
    val v1 = GraftCatalog.commit(spark, cat, updates = Map.empty,
      register = Map("a" -> tA, "b" -> tB))
    GraftTable.append(rows(5, 15), tA, "bucket")
    GraftTable.append(rows(5, 20), tB, "bucket")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = Seq("a", "b").map { n =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            gate.await()
            GraftCatalog.commit(spark, cat, updates = Map(n -> 2L),
              basedOn = Some(v1.version)); ()
          } catch { case t: Throwable => errs.add(t) }
      })
    }
    gate.countDown()
    tasks.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.isEmpty, errs.toString)
    val cur = GraftCatalog.current(spark, cat).get
    assert(cur.version == 3L, s"both commits must publish: ${cur.version}")
    assert(cur.tables.find(_.name == "a").get.snapshotId == 2L)
    assert(cur.tables.find(_.name == "b").get.snapshotId == 2L)
  }

  test("unknown table and empty catalog fail fast") {
    val cat = freshDir("cat_fail_")
    intercept[IllegalStateException] {
      GraftCatalog.resolve(spark, cat, "nope")
    }
    val tA = freshDir("cat_fail_a_") + "/a"
    GraftTable.append(rows(0, 5), tA, "bucket")
    GraftCatalog.commit(spark, cat, updates = Map.empty,
      register = Map("a" -> tA))
    intercept[IllegalArgumentException] {
      GraftCatalog.commit(spark, cat, updates = Map("ghost" -> 1L))
    }
  }
}
