package graft

import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.ChangelogGen
import graft.laketable.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Optimization-round measurement harness (guide §1: measure first; §1.4:
  * isolate with the noop sink). NOT part of the driver contract — Bench.scala
  * is the frozen artifact; this main exists so individual queries and replay
  * components can be timed without the full suite.
  *
  * Usage: runMain graft.BenchExtra <what> [reps]
  *   <what> = comma-separated query names, or
  *            gen         — changelog generation alone (noop sink)
  *            gen-light   — generation with payload structs dropped
  *            gen-plan / gen-probe / gen-probe2 / gen-probe3 / gen-probe-plan
  *                        — generation bisection probes (flat vs struct vs
  *                          conditional-struct, encoder vs expression)
  *            dedup       — generation + LWW dedup (noop sink)
  *            replay      — full replay (Bench methodology, fresh table/rep)
  *            replay-ab / replay-matrix — old-vs-new arms interleaved in ONE
  *                          JVM (the only trustworthy A/B on this host; the
  *                          parallel-throttle axis drifts 3-4x between
  *                          minutes and the single-thread canary misses it)
  *            small-batch — two-pass vs single-pass dedup on a 4k batch
  *            minhash-parity / minhash-nopersist — dedup_minhash old-vs-new
  *                          full-output comparison / persist A/B at this SF
  *            micro       — single-thread closed-form generation cost
  *            all         — every query, bench methodology
  *
  * Env: SPARK_GRAFT_APPLY_TIMING=1 prints per-phase apply timings;
  *      SPARK_GRAFT_OHA=<n> probes the ObjectHashAggregate sort-fallback
  *      threshold; SPARK_GRAFT_LOGLEVEL overrides the default ERROR.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("all")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "128m")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    // probe knob: ObjectHashAggregate sort-fallback threshold (default 128
    // in-memory keys — measured against the LWW aggregate's ~200k keys)
    sys.env.get("SPARK_GRAFT_OHA").foreach(v =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))

    def time(label: String)(f: => Unit): Unit = {
      val secs = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(label)
        val t0 = System.nanoTime()
        f
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"EXTRA $label%-28s min=${secs.min}%.3f reps=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val canary0 = HostCanary.best()
    what match {
      case "gen" =>
        val c = Bench.benchGen(sfDir)
        time("gen")(noop(ChangelogGen.fullStream(spark, c)))
      case "gen-light" =>
        val c = Bench.benchGen(sfDir)
        time("gen-light")(noop(ChangelogGen.fullStream(spark, c)
          .drop("after", "before")))
      case "dedup" =>
        val c = Bench.benchGen(sfDir)
        time("dedup")(noop(CdcApply.dedupLww(ChangelogGen.fullStream(spark, c))))
      case "gen-probe" =>
        val c = Bench.benchGen(sfDir)
        val full = ChangelogGen.changelog(spark, c)
        time("probe-all")(noop(full))
        time("probe-no-after")(noop(full.drop("after")))
        time("probe-content")(noop(full.select(col("after.content"))))
        time("probe-commit")(noop(full.select(col("after.commit"))))
        time("probe-repo-path")(noop(full.select(col("after.repo"), col("after.path"))))
        time("probe-vgtid")(noop(full.select(col("vgtid"), col("event_seq"))))
      case "gen-probe2" =>
        val c = Bench.benchGen(sfDir)
        import org.apache.spark.sql.functions._
        val n = c.numEvents
        val flat = graft.genlog.GenExprs.changelogFlatProbe(spark, c)
        time("probe-flat-all")(noop(flat))
        time("probe-flat-light")(noop(flat.drop("content", "commit")))
        val enc = ChangelogGen.changelogViaEncoder(spark, c)
        time("probe-encoder-all")(noop(enc))
        time("probe-encoder-light")(noop(enc.select(col("after.repo"), col("after.path"),
          col("vgtid"), col("event_seq"))))
      case "minhash-nopersist" =>
        // current shipped query (persisted hashed shingles) vs the same
        // plan WITHOUT the persist (recompute shingle hashes 3x)
        import org.apache.spark.sql.functions._
        import graft.functions.{TextFunctions => T}
        def planted() = {
          val d = spark.read.parquet(s"$sfDir/documents.parquet")
            .select(col("doc_id"), col("text"))
          val m = d.select((col("doc_id") + 1000000L).as("doc_id"),
            concat_ws(" ", slice(split(trim(col("text")), "\\s+"), lit(1),
              greatest(size(split(trim(col("text")), "\\s+")) - 2, lit(1)))).as("text"))
          d.unionByName(m)
        }
        def variant(persist: Boolean): org.apache.spark.sql.DataFrame = {
          var docs = planted().select(col("doc_id"),
            T.shingleHashes(col("text"), 20).as("shh"))
          if (persist) docs = docs.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val sig = docs.withColumn("band", explode(T.lshBandKeys(
            T.minhashFromHashes(col("shh"), 32), 16, 2)))
            .select(col("doc_id"), col("band"))
          val cand = sig.select(col("band"), col("doc_id").as("a_id"))
            .join(sig.select(col("band"), col("doc_id").as("b_id")).hint("shuffle_hash"),
              Seq("band"))
            .filter(col("a_id") < col("b_id"))
            .dropDuplicates("a_id", "b_id")
          cand
            .join(docs.select(col("doc_id").as("a_id"), col("shh").as("a_sh"))
              .hint("shuffle_hash"), Seq("a_id"))
            .join(docs.select(col("doc_id").as("b_id"), col("shh").as("b_sh"))
              .hint("shuffle_hash"), Seq("b_id"))
            .select(col("a_id"), col("b_id"),
              T.jaccardHashesPermille(col("a_sh"), col("b_sh")).as("jacc_pm"))
            .filter(col("jacc_pm") >= 700)
        }
        time("mh-persist")(variant(true).count())
        time("mh-nopersist")(variant(false).count())
      case "minhash-parity" =>
        // old string-shingle dedup_minhash formulation vs the shipped
        // hashed-shingle one, full output comparison at this SF (the DuckDB
        // oracle only runs at the small SFs; this checks the 64-bit
        // hash-collision risk at the large corpus directly)
        import org.apache.spark.sql.functions._
        import graft.functions.{TextFunctions => T}
        val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val mutated = docs0.select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(split(trim(col("text")), "\\s+"), lit(1),
            greatest(size(split(trim(col("text")), "\\s+")) - 2, lit(1)))).as("text"))
        val planted = docs0.unionByName(mutated)
        val docs = planted.withColumn("sh", T.shingles(col("text"), 20))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sig = docs
          .withColumn("band", explode(T.lshBandKeys(
            T.minhashSignature(col("sh"), 32), 16, 2)))
          .select(col("doc_id"), col("band"))
        val cand = sig.select(col("band"), col("doc_id").as("a_id"))
          .join(sig.select(col("band"), col("doc_id").as("b_id")).hint("shuffle_hash"),
            Seq("band"))
          .filter(col("a_id") < col("b_id"))
          .dropDuplicates("a_id", "b_id")
        val bySide = docs.select(col("doc_id"), col("sh"))
        val old = cand
          .join(bySide.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
            .hint("shuffle_hash"), Seq("a_id"))
          .join(bySide.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
            .hint("shuffle_hash"), Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            T.jaccardPermille(col("a_sh"), col("b_sh")).as("jacc_pm"))
          .filter(col("jacc_pm") >= 700)
        val neu = SparkEntry.queries("dedup_minhash")(spark, sfDir)
        val onlyOld = old.exceptAll(neu).count()
        val onlyNew = neu.exceptAll(old).count()
        println(s"EXTRA minhash-parity rows_old=${old.count()} rows_new=${neu.count()} " +
          s"only_old=$onlyOld only_new=$onlyNew " +
          (if (onlyOld == 0 && onlyNew == 0) "IDENTICAL" else "MISMATCH"))
        docs.unpersist()
      case "replay-ab" =>
        // old replay path (encoder gen + single-pass dedup) vs new (expr gen
        // + two-pass dedup), ALTERNATING in one JVM so host-speed drift hits
        // both arms equally — the only trustworthy comparison on this box
        // (the parallel-throttle axis swings 3-4x between minutes and the
        // single-thread canary cannot see it)
        val c = Bench.benchGen(sfDir)
        def stream(old: Boolean) =
          if (old) ChangelogGen.copyPhaseViaEncoder(spark, c)
            .unionByName(ChangelogGen.changelogViaEncoder(spark, c))
          else ChangelogGen.fullStream(spark, c)
        def run(old: Boolean): Double = {
          val root = java.nio.file.Files.createTempDirectory("graft-ab").toString + "/t"
          val table = new LakeTable(root, spark)
          table.create(ChangeEvent.rowSchema, numBuckets = 64)
          val t0 = System.nanoTime()
          CdcApply.replayAll(table, stream(old),
            CdcApply.ApplyConfig(twoPassDedup = !old))
          val s = (System.nanoTime() - t0) / 1e9
          table.drop()
          s
        }
        // warm both arms
        val cw = c.copy(numEvents = 1000000L, copyRows = 100000L)
        Seq(true, false).foreach { o =>
          val root = java.nio.file.Files.createTempDirectory("graft-abw").toString + "/t"
          val table = new LakeTable(root, spark)
          table.create(ChangeEvent.rowSchema, numBuckets = 64)
          CdcApply.replayAll(table,
            if (o) ChangelogGen.copyPhaseViaEncoder(spark, cw)
              .unionByName(ChangelogGen.changelogViaEncoder(spark, cw))
            else ChangelogGen.fullStream(spark, cw),
            CdcApply.ApplyConfig(twoPassDedup = !o))
          table.drop()
        }
        val pairs = (1 to reps).map { i =>
          val o = run(true); val n = run(false)
          println(f"EXTRA replay-ab pair$i old=$o%.2f new=$n%.2f ratio=${o / n}%.2f " +
            f"canary=${HostCanary.best()}%.3f")
          (o, n)
        }
        println(f"EXTRA replay-ab min old=${pairs.map(_._1).min}%.2f " +
          f"new=${pairs.map(_._2).min}%.2f")
      case "replay-matrix" =>
        // {encoder, expr} × {single, two-pass}: isolate which change moves
        // the replay, interleaved for host-drift fairness
        val c = Bench.benchGen(sfDir)
        def stream(enc: Boolean) =
          if (enc) ChangelogGen.copyPhaseViaEncoder(spark, c)
            .unionByName(ChangelogGen.changelogViaEncoder(spark, c))
          else ChangelogGen.fullStream(spark, c)
        def run(enc: Boolean, twoPass: Boolean): Double = {
          val root = java.nio.file.Files.createTempDirectory("graft-mx").toString + "/t"
          val table = new LakeTable(root, spark)
          table.create(ChangeEvent.rowSchema, numBuckets = 64)
          val t0 = System.nanoTime()
          CdcApply.replayAll(table, stream(enc), CdcApply.ApplyConfig(twoPassDedup = twoPass))
          val s = (System.nanoTime() - t0) / 1e9
          table.drop()
          s
        }
        val arms = Seq(("enc-1p", true, false), ("enc-2p", true, true),
          ("expr-1p", false, false), ("expr-2p", false, true))
        // one warm lap first
        arms.foreach { case (_, e, t) =>
          val cw = c.copy(numEvents = 1000000L, copyRows = 100000L)
          val root = java.nio.file.Files.createTempDirectory("graft-mxw").toString + "/t"
          val table = new LakeTable(root, spark)
          table.create(ChangeEvent.rowSchema, numBuckets = 64)
          CdcApply.replayAll(table,
            if (e) ChangelogGen.copyPhaseViaEncoder(spark, cw)
              .unionByName(ChangelogGen.changelogViaEncoder(spark, cw))
            else ChangelogGen.fullStream(spark, cw),
            CdcApply.ApplyConfig(twoPassDedup = t))
          table.drop()
        }
        val results = (1 to reps).map { i =>
          val r = arms.map { case (label, e, t) => label -> run(e, t) }
          println("EXTRA matrix " + r.map { case (l, s) => f"$l=$s%.2f" }.mkString(" ") +
            f" canary=${HostCanary.best()}%.3f")
          r
        }
        val mins = arms.map(_._1).map { l =>
          l -> results.map(_.toMap.apply(l)).min }
        println("EXTRA matrix-min " + mins.map { case (l, s) => f"$l=$s%.2f" }.mkString(" "))
      case "small-batch" =>
        // two-pass vs single-pass dedup on an oracle-sized (4000-event) batch
        import graft.genlog.GenConfig
        val c = GenConfig(numEvents = 4000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
        def replayOnce(twoPass: Boolean): Unit = {
          val scratch = java.nio.file.Files.createTempDirectory("graft-sb").toString
          val table = new LakeTable(s"$scratch/t", spark)
          table.create(ChangeEvent.rowSchema, numBuckets = 4)
          CdcApply.replayAll(table, ChangelogGen.fullStream(spark, c),
            CdcApply.ApplyConfig(twoPassDedup = twoPass))
          table.read().count()
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
        }
        time("small-twopass")(replayOnce(true))
        time("small-singlepass")(replayOnce(false))
      case "gen-probe3" =>
        val c = Bench.benchGen(sfDir)
        import org.apache.spark.sql.functions._
        val flat = graft.genlog.GenExprs.changelogFlatProbe(spark, c)
        time("p3-flat")(noop(flat))
        val st = struct(col("repo"), col("path"), col("commit"), col("lang"),
          col("content")).as("after")
        time("p3-struct-of-flat")(noop(flat.select(st)))
        val cond = col("event_seq") % 20 =!= 0
        time("p3-when-struct-of-flat")(noop(flat.select(when(cond, struct(col("repo"),
          col("path"), col("commit"), col("lang"), col("content"))).as("after"))))
        val stIf = graft.genlog.GenExprs.structIf(cond, struct(col("repo"),
          col("path"), col("commit"), col("lang"), col("content"))).as("after")
        time("p3-if-struct-of-flat")(noop(flat.select(stIf)))
        val stMask = graft.genlog.GenExprs.maskedStructProbe(cond, struct(col("repo"),
          col("path"), col("commit"), col("lang"), col("content"))).as("after")
        time("p3-masked-struct-of-flat")(noop(flat.select(stMask)))
        val full = ChangelogGen.changelog(spark, c)
        time("p3-full")(noop(full))
        time("p3-full-minus-before")(noop(full.drop("before")))
        time("p3-full-minus-after")(noop(full.drop("after")))
      case "gen-probe-plan" =>
        val c = Bench.benchGen(sfDir)
        val full = ChangelogGen.changelog(spark, c)
        import org.apache.spark.sql.execution.ExtendedMode
        println("=== repo-path ===")
        println(full.select(col("after.repo"), col("after.path"))
          .queryExecution.explainString(ExtendedMode))
        println("=== content ===")
        println(full.select(col("after.content"))
          .queryExecution.explainString(ExtendedMode))
      case "gen-plan" =>
        val c = Bench.benchGen(sfDir)
        val df = ChangelogGen.fullStream(spark, c)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case "micro" =>
        // single-thread closed-form cost, no Spark: ground truth for what a
        // perfectly-scaled 32-core generation pass could cost
        val c = Bench.benchGen(sfDir)
        val n = 1000000
        (1 to reps).foreach { _ =>
          var t0 = System.nanoTime()
          var i = 0
          var acc = 0L
          while (i < n) {
            acc ^= graft.genlog.EventGen.catchupEvent(i % c.numShards, i / c.numShards, c)
              .event_seq
            i += 1
          }
          val full = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          i = 0
          while (i < n) {
            acc ^= graft.genlog.EventGen.content("repo-0042", "src/dir3/file17.py",
              i.toLong, c.seed, c.contentBlocks).length
            i += 1
          }
          val cont = (System.nanoTime() - t0) / 1e9
          println(f"EXTRA micro n=$n catchupEvent=${full}%.2fs content=${cont}%.2fs acc=$acc")
        }
      case "replay" =>
        val c = Bench.benchGen(sfDir)
        // JIT warm-up like Bench
        Bench.runCdcReplay(spark, c.copy(numEvents = math.max(50000L, c.numEvents / 10),
          copyRows = math.max(5000L, c.copyRows / 10)))
        val runs = (1 to reps).map(_ => Bench.runCdcReplay(spark, c))
        val ev = runs.head._1
        println(f"EXTRA replay events=$ev secs=${runs.map(_._2).min}%.2f " +
          f"(${runs.map(r => f"${r._2}%.2f").mkString(",")}) " +
          f"ev/s=${ev / runs.map(_._2).min}%.0f")
      case names =>
        val wanted = if (names == "all") SparkEntry.queries.keys.toSeq.sorted
                     else names.split(",").toSeq
        wanted.foreach { name =>
          val fn = SparkEntry.queries(name)
          time(name)(fn(spark, sfDir).count())
        }
    }
    val canary1 = HostCanary.best()
    println(f"EXTRA canary before=$canary0%.3f after=$canary1%.3f")
    spark.stop()
  }
}
