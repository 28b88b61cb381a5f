package graft.laketable

import graft.SparkSupport
import graft.core.ChangeEvent
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LakeTableSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  private def newTable(): LakeTable = {
    val t = new LakeTable(tmpDir("laketable") + "/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    t
  }

  private def someRows(n: Int) =
    (0 until n).map(i => (s"repo-$i", s"src/f$i.go", "c" * 40, "go", s"content-$i"))
      .toDF("repo", "path", "commit", "lang", "content")

  test("create + commit + read round-trip; empty table reads empty") {
    val t = newTable()
    assert(t.read().count() == 0)
    val df = someRows(10).withColumn("_bucket", LakeTable.bucketExpr(4))
    val files = t.writeDataFiles(df, 0)
    assert(files.nonEmpty && files.forall(_.bucket >= 0))
    t.commit(Set.empty, files, Map("k" -> "v"))
    assert(t.read().count() == 10)
    assert(t.summaryValue("k").contains("v"))
  }

  test("commit replaces only the named buckets") {
    val t = newTable()
    val df = someRows(20).withColumn("_bucket", LakeTable.bucketExpr(4))
    val files = t.writeDataFiles(df, 0)
    t.commit(Set.empty, files, Map.empty)
    val snap = t.currentSnapshot.get
    val bucketsPresent = snap.files.map(_.bucket).toSet
    val victim = bucketsPresent.head
    // replace victim bucket with nothing → its rows disappear, others remain
    val expectRemaining = t.readFiles(snap, snap.files.filterNot(_.bucket == victim)).count()
    t.commit(Set(victim), Nil, Map.empty)
    assert(t.read().count() == expectRemaining)
  }

  test("version-hint pointer gives time travel") {
    val t = newTable()
    val f1 = t.writeDataFiles(someRows(5).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
    val v1 = t.commit(Set.empty, f1, Map.empty).version
    val f2 = t.writeDataFiles(someRows(7).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
    val v2 = t.commit(Set.empty, f2, Map.empty).version
    assert(t.read(Some(v1)).count() == 5)
    assert(t.read(Some(v2)).count() == 12)
    assert(t.currentVersion.contains(v2))
  }

  test("compact merges crowded buckets without changing table contents") {
    val t = newTable()
    (1 to 6).foreach { i =>
      val f = t.writeDataFiles(someRows(10).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
      t.commit(Set.empty, f, Map.empty)
    }
    val before = t.read().orderBy("repo", "path").collect().toSeq
    val filesBefore = t.currentSnapshot.get.files.size
    t.compact(maxFilesPerBucket = 2)
    val after = t.read().orderBy("repo", "path").collect().toSeq
    assert(after == before, "compaction changed table contents")
    val snap = t.currentSnapshot.get
    assert(snap.files.size < filesBefore)
    assert(snap.files.groupBy(_.bucket).values.forall(_.size <= 2))
    // compacting an already-tidy table is a no-op commit
    val v = t.currentVersion.get
    t.compact(maxFilesPerBucket = 2)
    assert(t.currentVersion.contains(v))
  }

  test("expireSnapshots drops old metadata + unreferenced data files") {
    val t = newTable()
    (1 to 5).foreach { i =>
      val f = t.writeDataFiles(someRows(5).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
      t.commit(if (i > 1) t.currentSnapshot.get.files.map(_.bucket).toSet else Set.empty,
        f, Map.empty) // replace everything each time → old files orphan fast
    }
    val cur = t.currentVersion.get
    val rows = t.read().count()
    t.expireSnapshots(keepLast = 2)
    assert(t.read().count() == rows, "current snapshot must survive expiry")
    assert(t.read(Some(cur - 1)).count() >= 0)  // kept window still time-travels
    assertThrows[Exception](t.read(Some(0L)))   // expired version gone
  }

  test("schema evolution: rename is metadata-only, add fills null") {
    val t = newTable()
    val files = t.writeDataFiles(someRows(6).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
    t.commit(Set.empty, files, Map.empty)
    // rename content→body (field id kept), add stars:int
    t.evolveSchema(renames = Map("content" -> "body"), adds = Seq("stars" -> "INT"))
    val df = t.read()
    assert(df.columns.toSeq == Seq("repo", "path", "commit", "lang", "body", "stars"))
    assert(df.filter($"body".startsWith("content-")).count() == 6) // old files readable
    assert(df.filter($"stars".isNull).count() == 6)
    // new writes under the evolved schema coexist with old files
    val snap = t.currentSnapshot.get
    val newRows = Seq(("r-new", "p-new", "c" * 40, "go", "body-new", 5))
      .toDF("repo", "path", "commit", "lang", "body", "stars")
      .withColumn("_bucket", LakeTable.bucketExpr(4))
    val nf = t.writeDataFiles(newRows, snap.schemaVersion)
    t.commit(Set.empty, nf, Map.empty)
    val all = t.read()
    assert(all.count() == 7)
    assert(all.filter($"stars" === 5).count() == 1)
    // rename source validation
    assertThrows[IllegalArgumentException](t.evolveSchema(Map("nope" -> "x"), Nil))
  }
}
