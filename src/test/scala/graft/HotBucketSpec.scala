package graft

import org.apache.spark.sql.functions._

import graft.extensions.DedupQueries

/** The hot-bucket guard on the banding self-joins
  * (DedupQueries.capHotBuckets): a band bucket of size B contributes
  * B²/2 candidate pairs before verification, so a template-heavy
  * corpus (many near-copies surviving the exact/norm tiers) turns the
  * candidate stage quadratic. The guard drops buckets past
  * `spark.graft.dedup.maxBandBucket` from candidate generation and
  * accounts the dropped mass (DedupQueries.hotBuckets /
  * minhashHotBuckets). These tests pin the two sides of the contract:
  * below the cap results are bit-identical to the unguarded join, and
  * past it the hot family is dropped WITH accounting while unrelated
  * small dup families are still caught.
  */
class HotBucketSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(d: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$d/documents.parquet")

  private def uniqueText(seed: Long) =
    (0 until 40).map(j => s"h${seed * 131 + j * 7919}").mkString(" ")

  // template family: 30 docs sharing a 40-token template, each with a
  // distinct trailing token (differ post-normalization — the exact and
  // norm tiers would NOT collapse them), pairwise Jaccard 38/42 ≈ 0.9.
  // All 30 share the same minimum-shingle md5s with overwhelming
  // probability ⇒ one band bucket of ~30 per band.
  private val template = (0 until 40).map(j => s"tpl$j").mkString(" ")
  private def hotRows(n: Int): Seq[(Long, String)] =
    (0 until n).map(i => (100L + i, s"$template stamp$i"))

  private def withCap[T](cap: Int)(body: => T): T = {
    spark.conf.set(DedupQueries.MaxBucketKey, cap.toString)
    try body finally spark.conf.unset(DedupQueries.MaxBucketKey)
  }

  private def minhashPairs(d: String): Seq[(Long, Long)] =
    SparkEntry.queries("dedup_minhash")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("below the cap: guarded results are bit-identical to the unguarded join") {
    val d = tmpDir("graft-hotbucket-id")
    // 10 unrelated docs + one small true dup family (a verbatim copy)
    writeDocs(d, (0L until 10L).map(i => (i, uniqueText(i))) :+ ((10L, uniqueText(0))))
    val unguarded = withCap(0)(minhashPairs(d))      // cap 0 disables
    val guarded = withCap(DedupQueries.DefaultMaxBucket)(minhashPairs(d))
    assert(unguarded === guarded, "every bucket is below the cap — the filter passes everything")
    assert(guarded.contains((0L, 10L)), "the planted dup family is caught either way")
  }

  test("past the cap: the hot template family is dropped from candidates, small families still caught, mass accounted") {
    val d = tmpDir("graft-hotbucket-hot")
    // 60-copy hot template family + 10 unrelated docs + one 2-doc
    // family. Each template doc's distinct stamp token can steal a
    // min-hash slot with P ≈ 1/39 per hash, peeling that doc out of
    // the crowd bucket for the affected band — so crowd buckets hold
    // ~57 of the 60 copies per band, far past the cap of 20 either way,
    // while peeled-off personal buckets have size 1 (distinct md5s)
    // and generate no pairs.
    writeDocs(d, hotRows(60) ++ (0L until 10L).map(i => (i, uniqueText(i)))
      :+ ((10L, uniqueText(0))))
    withCap(20) {
      val pairs = minhashPairs(d)
      assert(pairs.contains((0L, 10L)), "the 2-doc family's bucket (size 2 <= 20) is untouched")
      assert(!pairs.exists { case (a, b) => a >= 100L && b >= 100L },
        "every template pair lives only in the capped buckets — dropped from candidate generation")
      // dropped-mass accounting: the template family floods all 4 bands
      val hot = DedupQueries.minhashHotBuckets(spark,
          spark.read.parquet(s"$d/documents.parquet")).collect()
        .map(r => (r.getInt(r.fieldIndex("band")), r.getLong(r.fieldIndex("bucket_size"))))
      assert(hot.length === 4, s"one hot (crowd) bucket per band: ${hot.toSeq}")
      assert(hot.forall(h => h._2 >= 40L && h._2 <= 60L),
        s"each band's crowd bucket accounts the template family: ${hot.toSeq}")
    }
  }

  test("the cap also bounds dedup_edit's Levenshtein candidates") {
    val d = tmpDir("graft-hotbucket-edit")
    writeDocs(d, hotRows(30) ++ (0L until 4L).map(i => (i, uniqueText(i)))
      :+ ((4L, uniqueText(0) + " zz")))
    withCap(20) {
      val pairs = SparkEntry.queries("dedup_edit")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs.contains((0L, 4L)), "the small near-identical pair verifies through Levenshtein")
      assert(!pairs.exists { case (a, b) => a >= 100L && b >= 100L },
        "no O(len²) DP runs on the capped template family")
    }
  }

  test("unset cap on an exact-tier corpus: guard skipped, results identical to unguarded") {
    val d = tmpDir("graft-hotbucket-skip")
    writeDocs(d, (0L until 10L).map(i => (i, uniqueText(i))) :+ ((10L, uniqueText(0))))
    // no MaxBucketKey conf set — corpus is far below EXACT_TIER_MAX_ROWS,
    // so capHotBuckets short-circuits without the groupBy-count pass;
    // semantics must match the disabled-guard run bit for bit
    val skipped = minhashPairs(d)
    val unguarded = withCap(0)(minhashPairs(d))
    assert(skipped === unguarded)
  }

  test("a capping run self-reports: drop counter grows, healthy runs leave it untouched") {
    val d = tmpDir("graft-hotbucket-signal")
    writeDocs(d, hotRows(60) ++ (0L until 4L).map(i => (i, uniqueText(i))))
    val before = DedupQueries.hotBucketDropCount.get()
    withCap(20)(minhashPairs(d))
    val dropped = DedupQueries.hotBucketDropCount.get() - before
    assert(dropped >= 4L, s"each band's crowd bucket registers a drop (got $dropped)")
    // healthy corpus under an explicit cap: guard RUNS but drops nothing
    val d2 = tmpDir("graft-hotbucket-quiet")
    writeDocs(d2, (0L until 10L).map(i => (i, uniqueText(i))))
    val b2 = DedupQueries.hotBucketDropCount.get()
    withCap(20)(minhashPairs(d2))
    assert(DedupQueries.hotBucketDropCount.get() === b2, "no drop, no signal")
  }

  test("opt-in salvage: a capped template family surfaces as ONE cluster with its members") {
    val d = tmpDir("graft-hotbucket-salvage")
    writeDocs(d, hotRows(30) ++ (0L until 5L).map(i => (i, uniqueText(i))))
    withCap(20) {
      // default pair path drops the family entirely...
      assert(!minhashPairs(d).exists { case (a, b) => a >= 100L && b >= 100L })
      // ...salvage recovers it as one component, |bucket| star edges per
      // band instead of the |bucket|^2 pair join
      val clusters = DedupQueries.hotBucketClusters(spark,
          spark.read.parquet(s"$d/documents.parquet")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val byCluster = clusters.groupBy(_._2)
      assert(byCluster.size === 1, s"one template family -> one cluster: ${byCluster.keySet}")
      val members = byCluster.head._2.map(_._1).toSet
      assert(members.size >= 25 && members.forall(_ >= 100L),
        s"the capped crowd-bucket members are all template docs: ${members.size}")
      // unrelated docs never enter a hot bucket -> absent from salvage
      assert(members.forall(_ >= 100L))
    }
  }

  test("default cap clears every oracle-SF bucket by orders of magnitude — including the LARGEST SF") {
    // dedup_minhash's oracle replays the UNCAPPED SQL, so hash-green
    // requires the guard to be a no-op at every oracle SF: measure the
    // largest band bucket on sf0.001 AND sf0.1 (the largest SF the
    // driver revalidates — BASELINE claims hash-green there too)
    for (sf <- Seq(sfDir, "/root/testdata/sf0.1")) {
      val corpus = spark.read.parquet(s"$sf/documents.parquet")
      val biggest = DedupQueries.minhashHotBuckets(spark, corpus) // cap not exceeded → empty
      assert(biggest.isEmpty, s"no $sf bucket is anywhere near the default cap")
    }
  }
}
