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

  test("single-writer guard: a second committer that built on a stale " +
    "snapshot fails LOUDLY instead of silently interleaving") {
    val root = tmpDir("laketable") + "/t"
    val a = new LakeTable(root, spark)
    a.create(ChangeEvent.rowSchema, numBuckets = 4)
    // writer B reads the table at v0 — the state a misconfigured duplicate
    // stream would hold while writer A commits underneath it
    val b = new LakeTable(root, spark)
    val staleBase = b.currentSnapshot.get

    // writer A commits v1 normally
    val df = someRows(5).withColumn("_bucket", LakeTable.bucketExpr(4))
    a.commit(Set.empty, a.writeDataFiles(df, 0), Map("writer" -> "a"))
    assert(a.currentVersion.contains(1L))

    // writer B then tries to commit ITS v1, built on the stale v0 → the
    // pre-write guard must trip (expected current <none>+1 = 0, found 1)
    val staleCommit = staleBase.copy(version = 1L, summary = Map("writer" -> "b"))
    val e = intercept[graft.core.GraftValidationException](b.writeSnapshot(staleCommit))
    assert(e.getMessage.contains("concurrent writer detected"))
    // writer A's commit is untouched
    assert(a.currentVersion.contains(1L) && a.summaryValue("writer").contains("a"))

    // and the NORMAL single-writer path is unaffected: B re-reads and
    // commits v2 cleanly on top of A's v1
    val df2 = someRows(3).withColumn("_bucket", LakeTable.bucketExpr(4))
    b.commit(Set.empty, b.writeDataFiles(df2, 0), Map("writer" -> "b2"))
    assert(b.currentVersion.contains(2L))
  }

  test("commit replaces only the named buckets") {
    val t = newTable()
    val df = someRows(20).withColumn("_bucket", LakeTable.bucketExpr(4))
    val files = t.writeDataFiles(df, 0)
    t.commit(Set.empty, files, Map.empty)
    val snap = t.currentSnapshot.get
    val bucketsPresent = t.allFiles(snap).map(_.bucket).toSet
    val victim = bucketsPresent.head
    // replace victim bucket with nothing → its rows disappear, others remain
    val expectRemaining = t.readFiles(snap, t.allFiles(snap).filterNot(_.bucket == victim)).count()
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

  test("crash-window recovery: missing version-hint recovers from the meta " +
    "listing; a replayed commit renames over an orphaned v<N>.json") {
    val t = newTable()
    val df = someRows(6).withColumn("_bucket", LakeTable.bucketExpr(4))
    t.commit(Set.empty, t.writeDataFiles(df, 0), Map("k" -> "1"))
    assert(t.currentVersion.contains(1L))

    // crash between hint delete and rename: no version-hint on disk —
    // recovery lists meta/v*.json (every committed json is complete, it
    // lands by temp+rename) and takes the max
    val hint = java.nio.file.Paths.get(t.root, "meta", "version-hint.txt")
    val hintBytes = java.nio.file.Files.readAllBytes(hint)
    java.nio.file.Files.delete(hint)
    assert(t.currentVersion.contains(1L), "must recover max committed version from listing")
    assert(t.read().count() == 6)
    java.nio.file.Files.write(hint, hintBytes)

    // crash after v2.json was fully written but before the hint swap: the
    // restart replays the same commit — the rename must overwrite the
    // orphan, not throw FileAlreadyExists in a loop (orphan content is
    // never parsed on this path)
    val orphan = java.nio.file.Paths.get(t.root, "meta", "v2.json")
    java.nio.file.Files.writeString(orphan, "{stale-orphan}")
    val df2 = someRows(3).withColumn("_bucket", LakeTable.bucketExpr(4))
    val snap = t.commit(Set.empty, t.writeDataFiles(df2, 0), Map("k" -> "2"))
    assert(snap.version == 2L && t.currentVersion.contains(2L))
    assert(t.read().count() == 9)
    assert(t.snapshot(2L).summary("k") == "2") // orphan content replaced
  }

  test("compact merges crowded buckets without changing table contents") {
    val t = newTable()
    (1 to 6).foreach { i =>
      val f = t.writeDataFiles(someRows(10).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
      t.commit(Set.empty, f, Map.empty)
    }
    val before = t.read().orderBy("repo", "path").collect().toSeq
    val filesBefore = t.currentSnapshot.get.fileCount
    t.compact(maxFilesPerBucket = 2)
    val after = t.read().orderBy("repo", "path").collect().toSeq
    assert(after == before, "compaction changed table contents")
    val snap = t.currentSnapshot.get
    assert(snap.fileCount < filesBefore)
    assert(t.allFiles(snap).groupBy(_.bucket).values.forall(_.size <= 2))
    // compacting an already-tidy table is a no-op commit
    val v = t.currentVersion.get
    t.compact(maxFilesPerBucket = 2)
    assert(t.currentVersion.contains(v))
  }

  test("expireSnapshots drops old metadata + unreferenced data files") {
    val t = newTable()
    (1 to 5).foreach { i =>
      val f = t.writeDataFiles(someRows(5).withColumn("_bucket", LakeTable.bucketExpr(4)), 0)
      t.commit(if (i > 1) t.allFiles(t.currentSnapshot.get).map(_.bucket).toSet else Set.empty,
        f, Map.empty) // replace everything each time → old files orphan fast
    }
    val cur = t.currentVersion.get
    val rows = t.read().count()
    t.expireSnapshots(keepLast = 2)
    assert(t.read().count() == rows, "current snapshot must survive expiry")
    assert(t.read(Some(cur - 1)).count() >= 0)  // kept window still time-travels
    assertThrows[Exception](t.read(Some(0L)))   // expired version gone
    // a LARGER keep window after a smaller one must not crash on the
    // already-deleted versions inside its range (the keep range is not
    // assumed contiguous — earlier expiries may have holes in it)
    t.expireSnapshots(keepLast = 5)
    assert(t.read().count() == rows)
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
