package graft

import org.apache.spark.sql.functions._

import graft.sources.{EventsSource, TsdbStorage}

class StorageSpec extends SparkSpec {

  test("clustered append round-trips the full Meas set") {
    val dir = tmpDir("graft-store")
    val meas = EventsSource.meas(spark, sfDir)
    TsdbStorage.append(meas, dir, buckets = 8)
    val back = TsdbStorage.read(spark, dir)
    assert(back.count() === meas.count())
    // exact content equality (schema-ordered, set semantics)
    assert(back.exceptAll(meas).isEmpty && meas.exceptAll(back).isEmpty)
  }

  test("eraseOld drops whole day partitions, keeps the rest intact") {
    val dir = tmpDir("graft-erase")
    val meas = EventsSource.meas(spark, sfDir)
    TsdbStorage.append(meas, dir, buckets = 4)
    val cutoff = java.time.LocalDate.parse("2024-01-15")
    val dropped = TsdbStorage.eraseOld(spark, dir, cutoff)
    assert(dropped.nonEmpty && dropped.forall(_.startsWith("day=")))
    val back = TsdbStorage.read(spark, dir)
    assert(back.filter(col("time") < lit("2024-01-15 00:00:00").cast("timestamp")).count() === 0L)
    val expectKept = meas.filter(to_date(col("time")) >= lit(java.sql.Date.valueOf(cutoff))).count()
    assert(back.count() === expectKept)
  }

  test("compact keeps exactly the freshest row per (id, time) and is idempotent") {
    val dir = tmpDir("graft-compact")
    val meas = EventsSource.meas(spark, sfDir)
    // two appends: second is a rewrite of a slice with higher seq (fresher)
    TsdbStorage.append(meas, dir, buckets = 4)
    TsdbStorage.append(
      meas.filter(col("seq") % 7 === 0)
        .withColumn("value", col("value") * 2)
        .withColumn("seq", col("seq") + 1000000L),
      dir, buckets = 4)
    val compacted = TsdbStorage.compacted(spark, dir).cache()
    assert(compacted.groupBy("id", "time").count().filter(col("count") > 1).count() === 0L)
    // rewritten rows won: every seq%7==0 slice must carry the boosted seq
    val boosted = compacted.filter(col("seq") >= 1000000L).count()
    assert(boosted === meas.filter(col("seq") % 7 === 0).count())
    // idempotent: compacting the compacted set changes nothing
    val again = compacted.groupBy("id", "time")
      .agg(max_by(struct(col("value"), col("flag"), col("seq")), col("seq")).as("m"))
    assert(again.count() === compacted.count())
    compacted.unpersist()
  }
}
