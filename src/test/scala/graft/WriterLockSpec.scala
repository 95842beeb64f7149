package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.Path

import graft.core.{Flags, Meas}
import graft.engine.{GraftEngine, QueryInterval}
import graft.extensions.{AnnIndex, TextIndex}
import graft.sources.WriterLock

/** The enforced single-writer contract: a second maintainer on a held
  * store/artifact dir fails fast, readers are unaffected, a crashed
  * writer leaves a takeable stale lease, and nested ops of one owner
  * re-enter.
  */
class WriterLockSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(dir: String): GraftEngine = {
    val eng = new GraftEngine(spark, dir, buckets = 2)
    eng.append((0 until 100).map(i => // unique (id, time) per i — nothing for merge-on-read to collapse
      Meas(i % 5L, ts(f"2024-03-${1 + i % 2}%02d 10:${i / 60}%02d:${i % 60}%02d"), i.toDouble, Flags.CLICK, i.toLong)))
    eng
  }

  test("second engine instance on one path: writers rejected, readers unaffected") {
    val dir = tmpDir("graft-lock-second")
    val eng1 = seed(dir)
    val eng2 = new GraftEngine(spark, dir, buckets = 2)
    val q = QueryInterval(Seq.empty, 0L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00"))
    val before = eng2.readInterval(q).count()
    assert(before === 100L)
    // maintainer A mid-operation (any writer of engine 1 holds the same
    // lease its own ops take — simulate with a held lease on the path)
    WriterLock.withLock(spark, dir, "maintainer-A") {
      intercept[WriterLock.ConcurrentWriterException](eng2.compact())
      intercept[WriterLock.ConcurrentWriterException](eng2.eraseOld(ts("2024-03-02 00:00:00")))
      intercept[WriterLock.ConcurrentWriterException](eng2.reindex())
      intercept[WriterLock.ConcurrentWriterException](eng2.maintain())
      // reader paths never touch the lock
      assert(eng2.readInterval(q).count() === before)
      assert(eng2.currentValue(Seq(1L), 0L).count() === 1L)
    }
    // lease released → the second instance's writers proceed
    eng2.compact()
    assert(eng2.readInterval(q).count() === before)
    assert(!fsFor(dir).exists(new Path(dir, WriterLock.FileName)),
      "a completed writer removes its lease")
    eng1.reindex() // and the first instance can maintain again too
  }

  test("a crashed writer leaves a takeable stale lease; a live one is honored") {
    val dir = tmpDir("graft-lock-stale")
    val eng = seed(dir)
    val fs = fsFor(dir)
    val lock = new Path(dir, WriterLock.FileName)
    // live foreign lease (fresh mtime): rejected
    val out = fs.create(lock, false)
    out.write("otherhost:999:dead-beef".getBytes("UTF-8")); out.close()
    val ex = intercept[WriterLock.ConcurrentWriterException](eng.compact())
    assert(ex.getMessage.contains("otherhost:999:dead-beef"),
      "rejection names the holding owner for diagnosis")
    // crash: the heartbeat stops refreshing mtime → stale after staleMs
    fs.setTimes(lock, System.currentTimeMillis() - WriterLock.DefaultStaleMs - 60000, -1)
    eng.compact() // takeover succeeds
    assert(!fs.exists(lock), "takeover ran the op and released the new lease")
    val q = QueryInterval(Seq.empty, 0L, ts("2024-03-01 00:00:00"), ts("2024-03-03 00:00:00"))
    assert(eng.readInterval(q).count() === 100L, "the compacted store is intact")
  }

  test("takeover aborts when the 'crashed' owner's heartbeat resumes mid-takeover") {
    val dir = tmpDir("graft-lock-resume")
    val eng = seed(dir)
    val fs = fsFor(dir)
    val lock = new Path(dir, WriterLock.FileName)
    val out = fs.create(lock, false)
    out.write("otherhost:999:was-paused".getBytes("UTF-8")); out.close()
    // lease looks crashed (mtime past staleMs)...
    fs.setTimes(lock, System.currentTimeMillis() - WriterLock.DefaultStaleMs - 60000, -1)
    // ...but the owner was only GC-paused: its heartbeat fires in the
    // window between the taker's staleness stat and its delete
    WriterLock.beforeStaleDelete = () => fs.setTimes(lock, System.currentTimeMillis(), -1)
    try {
      val ex = intercept[WriterLock.ConcurrentWriterException](eng.compact())
      assert(ex.getMessage.contains("heartbeat"), "abort names the cause")
      assert(fs.exists(lock), "the resumed owner's lease is untouched")
      assert(readLockOwner(fs, lock) === "otherhost:999:was-paused",
        "the lease still records the original owner — no re-create happened")
    } finally WriterLock.beforeStaleDelete = () => ()
    // heartbeat stops again → genuinely stale → takeover proceeds
    fs.setTimes(lock, System.currentTimeMillis() - WriterLock.DefaultStaleMs - 60000, -1)
    eng.compact()
    assert(!fs.exists(lock))
  }

  private def readLockOwner(fs: org.apache.hadoop.fs.FileSystem, lock: Path): String = {
    val in = fs.open(lock)
    try {
      val buf = new Array[Byte](256)
      val n = math.max(0, in.read(buf))
      new String(buf, 0, n, "UTF-8")
    } finally in.close()
  }

  test("same owner on another thread is rejected (reentrancy is per (owner, thread))") {
    val dir = tmpDir("graft-lock-thread")
    seed(dir)
    WriterLock.withLock(spark, dir, "maintainer-A") {
      // same thread, same owner: re-enters
      WriterLock.withLock(spark, dir, "maintainer-A") { () }
      // same owner from a second thread — the one-engine-two-threads
      // maintenance interleave the lease exists to prevent
      @volatile var thrown: Throwable = null
      val t = new Thread(() =>
        try WriterLock.withLock(spark, dir, "maintainer-A") { () }
        catch { case e: Throwable => thrown = e })
      t.start(); t.join()
      assert(thrown.isInstanceOf[WriterLock.ConcurrentWriterException],
        s"expected rejection, got $thrown")
      assert(thrown.getMessage.contains("another thread"))
    }
    assert(!fsFor(dir).exists(new Path(dir, WriterLock.FileName)))
  }

  test("one owner's nested ops re-enter (maintain chains fsck/compact/reindex)") {
    val dir = tmpDir("graft-lock-reenter")
    val eng = seed(dir)
    val report = eng.maintain() // would self-deadlock without reentrancy
    assert(report.corrupt.isEmpty)
    assert(!fsFor(dir).exists(new Path(dir, WriterLock.FileName)))
  }

  test("opt-in append lease: multi-engine ingest can be made fail-fast too") {
    val dir = tmpDir("graft-lock-append")
    val eng = seed(dir)
    def row(i: Int) = Seq(Meas(9L, ts(f"2024-03-03 10:00:$i%02d"), i.toDouble, Flags.CLICK, 200L + i))
    // DEFAULT: appends take no lease — ingest proceeds under a held
    // lease (the hot path does not pay FS round-trips per batch)
    WriterLock.withLock(spark, dir, "maintainer-A")(eng.append(row(1)))
    assert(eng.merged.count() === 101L)
    // opted in: an append contends the lease like any other writer
    spark.conf.set("spark.graft.lock.appends", "true")
    try {
      WriterLock.withLock(spark, dir, "maintainer-A") {
        intercept[WriterLock.ConcurrentWriterException](eng.append(row(2)))
      }
      eng.append(row(2)) // lease released → the append takes its own
      assert(eng.merged.count() === 102L)
    } finally spark.conf.unset("spark.graft.lock.appends")
    assert(!fsFor(dir).exists(new Path(dir, WriterLock.FileName)))
  }

  test("artifact writers hold the same contract (AnnIndex, TextIndex)") {
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val annDir = tmpDir("graft-lock-ann")
    val textDir = tmpDir("graft-lock-text")
    WriterLock.withLock(spark, annDir, "maintainer-A") {
      intercept[WriterLock.ConcurrentWriterException](AnnIndex.build(spark, raw, annDir))
    }
    AnnIndex.build(spark, raw, annDir)
    WriterLock.withLock(spark, annDir, "maintainer-A") {
      intercept[WriterLock.ConcurrentWriterException](AnnIndex.compact(spark, annDir))
      intercept[WriterLock.ConcurrentWriterException](AnnIndex.fsck(spark, annDir))
      // readers (resolve/readCodes) never touch the lock
      assert(AnnIndex.usable(spark, annDir))
      assert(AnnIndex.readCodes(spark, annDir).count() === raw.count())
    }
    AnnIndex.compact(spark, annDir)
    WriterLock.withLock(spark, textDir, "maintainer-B") {
      intercept[WriterLock.ConcurrentWriterException](TextIndex.build(spark, docs, textDir))
    }
    TextIndex.build(spark, docs, textDir)
    assert(TextIndex.usable(spark, textDir))
    assert(!fsFor(annDir).exists(new Path(annDir, WriterLock.FileName)))
    assert(!fsFor(textDir).exists(new Path(textDir, WriterLock.FileName)))
  }
}
