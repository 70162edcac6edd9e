package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import graft.ts.SeriesStore
import graft.ts.model.Period

/** Golden merge-store semantics, mirroring the reference's
  * weather/test/test_dtss_host.py:102-134: store [1,2,3], then extension
  * [4,5,6] starting at t=3 with overwrite_on_write=False → reading back
  * yields [1,2,3,4,5,6]; a sibling container is untouched. Plus the
  * crash-safety contract of the two-rename container swap.
  */
class SeriesStoreSpec extends SparkSpec {
  import spark.implicits._

  private val S = Period.Second
  private val id = "shyft://test/eftas-sen/stua/temperature"

  private def series(vals: Seq[Double], t0: Long): org.apache.spark.sql.DataFrame =
    vals.zipWithIndex.map { case (v, i) => (id, (t0 + i) * S, v) }
      .toDF("series_id", "ts", "value")

  test("golden merge: extension chunk unions onto the stored axis") {
    val store = new SeriesStore(spark, tmpDir("graft-golden"), numBuckets = 2)
    store.merge("c1", series(Seq(1, 2, 3), t0 = 0))
    store.merge("c2", series(Seq(1, 2, 3), t0 = 0)) // sibling container
    store.merge("c1", series(Seq(4, 5, 6), t0 = 3))

    val got = store.read("c1").orderBy("ts").collect().map(r => (r.getLong(1) / S, r.getDouble(2)))
    assert(got.toSeq == Seq(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0, 4L -> 5.0, 5L -> 6.0))

    // the second container keeps its original [1,2,3] (test_dtss_host.py:131-134)
    val other = store.read("c2").orderBy("ts").collect().map(_.getDouble(2))
    assert(other.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("merge is last-wins on colliding timestamps and idempotent") {
    val store = new SeriesStore(spark, tmpDir("graft-lastwins"), numBuckets = 2)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))
    val overlap = series(Seq(20, 30, 40), t0 = 1) // t=1,2 collide; t=3 extends
    store.merge("c", overlap)
    store.merge("c", overlap) // re-merge must be a no-op (T4)

    val got = store.read("c").orderBy("ts").collect().map(r => (r.getLong(1) / S, r.getDouble(2)))
    assert(got.toSeq == Seq(0L -> 1.0, 1L -> 20.0, 2L -> 30.0, 3L -> 40.0))
  }

  test("period read covers [start, end) and filters ids") {
    val store = new SeriesStore(spark, tmpDir("graft-period"), numBuckets = 2)
    store.merge("c", series(Seq(1, 2, 3, 4), t0 = 0))
    val got = store.read("c", Seq(id), Period.ofSeconds(1, 3)).orderBy("ts")
      .collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(2.0, 3.0))
    assert(store.read("c", Seq("shyft://test/other"), Period.ofSeconds(0, 10)).count() == 0)
  }

  test("reads of a missing or empty container return an empty point frame") {
    val store = new SeriesStore(spark, tmpDir("graft-empty"), numBuckets = 2)
    assert(store.read("nope").count() == 0)
    store.ensureContainer("made")
    assert(store.read("made").count() == 0)
    assert(store.read("made", Seq(id), Period.ofSeconds(0, 10)).count() == 0)
  }

  test("merging an empty batch is a no-op") {
    val store = new SeriesStore(spark, tmpDir("graft-noop"), numBuckets = 2)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))
    store.merge("c", series(Seq(1), t0 = 0).where("value > 999"))
    assert(store.read("c").count() == 3)
  }

  test("merge rewrites only the buckets the batch touches") {
    val warehouse = tmpDir("graft-bounded")
    val store = new SeriesStore(spark, warehouse, numBuckets = 4)
    // seed series across several buckets
    val seed = (0 until 40).map(i => (s"shyft://c/series-$i", i.toLong * S, i.toDouble))
      .toDF("series_id", "ts", "value")
    store.merge("c", seed)

    def bucketFiles: Map[String, Set[String]] = {
      val root = new java.io.File(s"$warehouse/c")
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    }
    val before = bucketFiles
    assert(before.size > 1, "seed should span multiple buckets")

    // upsert one series → exactly its bucket rewritten
    val one = Seq(("shyft://c/series-0", 1000L * S, 9.9)).toDF("series_id", "ts", "value")
    store.merge("c", one)
    val after = bucketFiles
    val touched = s"bucket=${store.bucketOf("shyft://c/series-0")}"
    assert(after(touched) != before(touched), "affected bucket must be rewritten")
    (before.keySet - touched).foreach { b =>
      assert(after(b) == before(b), s"unaffected $b must be untouched")
    }
    assert(store.read("c").count() == 41)
  }

  test("concurrent merges on one container serialize and lose nothing") {
    val warehouse = tmpDir("graft-conc")
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        // distinct store instances must still share the container lock
        val store = new SeriesStore(spark, warehouse, numBuckets = 2)
        store.merge("c", series(Seq(t * 10.0), t0 = t))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    val check = new SeriesStore(spark, warehouse, numBuckets = 2)
    val got = check.read("c").orderBy("ts").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(0.0, 10.0, 20.0, 30.0))
  }

  test("process death mid-swap: orphaned backup is restored on next read/merge") {
    val warehouse = tmpDir("graft-death")
    val store = new SeriesStore(spark, warehouse, numBuckets = 2)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))

    // Simulate a crash between rename(dst, bak) and rename(src, dst): the
    // live bucket is gone and its only copy sits in the sibling .__bak dir.
    val root = new java.io.File(s"$warehouse/c")
    val bucket = root.listFiles().filter(_.getName.startsWith("bucket=")).head
    val bakRoot = new java.io.File(s"$warehouse/c.__bak")
    assert(bakRoot.mkdirs())
    val bak = new java.io.File(bakRoot, bucket.getName)
    assert(bucket.renameTo(bak), "test setup: move live bucket to backup")

    // A plain read must restore the backup and see all original rows.
    val got = store.read("c").orderBy("ts").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))
    assert(!bakRoot.exists(), "backup dir must be swept after recovery")
  }

  test("process death post-swap: stale backup is dropped, not double-counted") {
    val warehouse = tmpDir("graft-stale")
    val store = new SeriesStore(spark, warehouse, numBuckets = 2)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))

    // Simulate a crash between rename(src, dst) and delete(bak): both the
    // live bucket and a stale backup copy exist.
    val root = new java.io.File(s"$warehouse/c")
    val bucket = root.listFiles().filter(_.getName.startsWith("bucket=")).head
    val bakRoot = new java.io.File(s"$warehouse/c.__bak")
    val bakBucket = new java.io.File(bakRoot, bucket.getName)
    assert(bakBucket.mkdirs())
    bucket.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(bakBucket, f.getName).toPath)
    }

    // Reads must not double-count, and the stale backup must be swept.
    val got = store.read("c").orderBy("ts").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))
    assert(!bakRoot.exists(), "stale backup dir must be swept")

    // A subsequent merge works on the repaired container.
    store.merge("c", series(Seq(4.0), t0 = 3))
    assert(store.read("c").count() == 4)
  }

  test("failed swap rename restores the backup — no data loss") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.faulty.impl", classOf[FaultyFs].getName)
    val store = new SeriesStore(spark, "faulty://" + tmpDir("graft-crash"), numBuckets = 2)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))

    FaultyFs.failNextTmpRename.set(true)
    val e = intercept[java.io.IOException] {
      store.merge("c", series(Seq(4, 5, 6), t0 = 3))
    }
    assert(e.getMessage.contains("previous data restored"))

    // original container contents survive the failed swap
    val got = store.read("c").orderBy("ts").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))

    // and a subsequent healthy merge still works
    FaultyFs.failNextTmpRename.set(false)
    store.merge("c", series(Seq(4, 5, 6), t0 = 3))
    assert(store.read("c").count() == 6)
  }

  // ---- cross-process merge guard (the lock FILE, not the JVM monitor) ----

  test("second driver holding the lock: merge fails loudly, container intact") {
    val warehouse = tmpDir("graft-xproc")
    val store = new SeriesStore(spark, warehouse, numBuckets = 2,
      lockAcquireTimeoutMs = 500L)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))

    // simulate another driver's live lock (fresh mtime, foreign token)
    val lock = new java.io.File(s"$warehouse/c.__lock")
    java.nio.file.Files.writeString(lock.toPath, "99999@other-host:0")

    val e = intercept[IllegalStateException] {
      store.merge("c", series(Seq(9.0), t0 = 9))
    }
    assert(e.getMessage.contains(".__lock"), s"error must name the lock: ${e.getMessage}")
    assert(e.getMessage.contains("99999@other-host"), "error must name the holder")
    // no corruption: the container still reads exactly its pre-merge rows
    val got = store.read("c").orderBy("ts").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))
    // the foreign lock was NOT broken (it is live, not stale)
    assert(lock.exists())
    lock.delete()
  }

  test("stale lock of a dead driver is broken and the merge proceeds") {
    val warehouse = tmpDir("graft-xproc-stale")
    val store = new SeriesStore(spark, warehouse, numBuckets = 2,
      lockAcquireTimeoutMs = 5000L, staleLockMs = 1000L)
    store.merge("c", series(Seq(1, 2, 3), t0 = 0))

    val lock = new java.io.File(s"$warehouse/c.__lock")
    java.nio.file.Files.writeString(lock.toPath, "99999@dead-host:0")
    assert(lock.setLastModified(System.currentTimeMillis() - 10000L))

    store.merge("c", series(Seq(4.0), t0 = 3)) // must not time out
    val got = store.read("c").orderBy("ts").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(!lock.exists(), "lock must be released after the merge")
  }

  test("the lock is held during a merge and released after it") {
    val warehouse = tmpDir("graft-xproc-release")
    val store = new SeriesStore(spark, warehouse, numBuckets = 2)
    store.merge("c", series(Seq(1.0), t0 = 0))
    assert(!new java.io.File(s"$warehouse/c.__lock").exists(),
      "successful merge must release the lock file")
    // and a second merge (re-acquiring a fresh lock) still works
    store.merge("c", series(Seq(2.0), t0 = 1))
    assert(store.read("c").count() == 2)
  }
}

/** Local filesystem that fails the next rename whose source is a `.__tmp`
  * staging dir — injects the exact failure mode SeriesStore.merge must
  * survive (the second rename of the container swap).
  */
class FaultyFs extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")
  override def rename(src: Path, dst: Path): Boolean =
    // match only the container swap (tmp-staged bucket dir → live container),
    // not the parquet committer's own renames inside the staging dir
    if (FaultyFs.failNextTmpRename.get() && src.toString.matches(".*\\.__tmp/bucket=\\d+$")) {
      FaultyFs.failNextTmpRename.set(false)
      false
    } else super.rename(src, dst)
}

object FaultyFs {
  val failNextTmpRename = new java.util.concurrent.atomic.AtomicBoolean(false)
}
