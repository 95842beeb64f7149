package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Substring-dedup scale smoke: synthesize N documents (default 100k —
  * 200× the sf0.1 documents table, ~12M rolling windows) with planted
  * boilerplate, and drive the round-6 span family end to end through
  * the PRODUCTION query paths (SparkEntry registry on a parquet dir —
  * same code a cluster runs). Not a driver gate; measured evidence
  * that the three-shuffle span design (map-side window explosion →
  * grouped dup-set → sort-merge mark → per-doc islands) holds when the
  * corpus is no longer toy-sized, and that the work scales with corpus
  * TOKENS (the explosion) + DUPLICATED tokens (everything after), not
  * with doc pairs.
  *
  * The corpus is deterministic (integer-hash tokens, no RNG): every
  * 5th doc carries a shared 20-token boilerplate run at a
  * doc-dependent offset, so the expected outcome is checkable — one
  * maximal span per carrier, ~13 duplicated window hashes total
  * (interior windows of the run; boundary windows mix in unique
  * context and stay unduplicated), and scrub removes exactly the run
  * from every carrier except the first.
  *
  * Usage: runMain graft.extensions.SpanScaleSmoke [docs]
  */
object SpanScaleSmoke {
  private val TOKENS_PER_DOC = 120
  private val RUN = 20 // boilerplate length; > SPAN_K so interior windows duplicate

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sscale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // unique filler token per (doc, position) via integer hashing;
    // carriers (doc_id % 5 == 0) splice the shared run at an offset
    // that varies by doc (so spans prove position-independence)
    val carrier = col("doc_id") % 5 === 0
    val off = (col("doc_id") % 37 + lit(10)).cast("int") // 10..46 ∈ [0, 120-RUN]
    val toks = expr(
      s"""transform(sequence(0, ${TOKENS_PER_DOC - 1}), i ->
         |  CASE WHEN carrier AND i >= off AND i < off + $RUN
         |       THEN concat('b', i - off)
         |       ELSE concat('t', pmod(doc_id * 2654435761 + i * 40503, 1000000000000)) END)
         |""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft-span-smoke").toString
    time(f"materialize $nDocs%,d docs × $TOKENS_PER_DOC tokens (parquet)") {
      spark.range(nDocs)
        .select(col("id").as("doc_id"), carrier.as("carrier"), off.as("off"))
        .select(col("doc_id"), concat_ws(" ", toks).as("text"),
          lit("en").as("lang"), lit("src0").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(s"$dir/documents.parquet")
    }

    val expectedCarriers = (nDocs + 4) / 5 // ids 0, 5, 10, …
    val spans = time(s"dedup_spans over ~${nDocs * (TOKENS_PER_DOC - 7)} windows") {
      graft.SparkEntry.queries("dedup_spans")(spark, dir).cache().count()
    }
    // every carrier yields exactly one maximal span covering the run
    assert(spans == expectedCarriers,
      s"expected $expectedCarriers spans (one per carrier), got $spans")
    val spanRows = graft.SparkEntry.queries("dedup_spans")(spark, dir)
      .agg(min("span_tokens"), max("span_tokens")).head()
    assert(spanRows.getLong(0) == RUN && spanRows.getLong(1) == RUN,
      s"every span must cover exactly the $RUN-token run, got $spanRows")

    val frac = time("dedup_span_frac (per-doc ppm over the full corpus)") {
      graft.SparkEntry.queries("dedup_span_frac")(spark, dir)
        .filter(col("dup_ppm") > 0).count()
    }
    assert(frac == expectedCarriers, s"ppm>0 for carriers only: $frac")

    // window-level decontamination rides the same machinery: the eval
    // slice (doc_id % 25 == 0) is a SUBSET of the carriers (% 5 == 0),
    // so every train carrier shares the run's interior windows with
    // eval docs → contaminated with exactly the RUN-token span; the
    // planted tranche (eval copies at train ids) is fully contaminated
    val evalCarriers = (nDocs + 24) / 25
    val decon = time("decontaminate_spans (train vs eval slice, token accounting)") {
      graft.SparkEntry.queries("decontaminate_spans")(spark, dir).cache()
    }
    val dcount = decon.count()
    assert(dcount == (expectedCarriers - evalCarriers) + 2,
      s"contaminated train docs = train carriers + 2 planted: got $dcount")
    assert(decon.filter(col("doc_id") < 3000000L)
      .filter(col("cont_tokens") =!= RUN).count() == 0,
      "every natural train carrier is contaminated with exactly the run span")
    assert(decon.filter(col("doc_id") >= 3000000L)
      .filter(col("cont_ppm") =!= 1000000L).count() == 0,
      "planted eval copies are fully contaminated")
    decon.unpersist()

    val removed = time("dedup_scrub (keep-first excision + text rebuild)") {
      graft.SparkEntry.queries("dedup_scrub")(spark, dir)
        .agg(sum("n_removed"), count(when(col("n_removed") > 0, 1))).head()
    }
    // doc 0 keeps its copy; every other carrier loses exactly the run
    assert(removed.getLong(0) == (expectedCarriers - 1) * RUN,
      s"scrub must remove RUN tokens per non-first carrier, got ${removed.getLong(0)}")
    assert(removed.getLong(1) == expectedCarriers - 1)

    // build-once serving: the TextIndex stores the rolling-window hash
    // arrays (swh) + token counts — the span family then never touches
    // the text column (no scan, no tokenize, no per-window md5; the
    // part of each query that grows with corpus tokens moves to ingest)
    val idx = s"$dir/_textidx"
    time("TextIndex.build (all signatures incl. swh rolling-window hashes)") {
      TextIndex.build(spark, spark.read.parquet(s"$dir/documents.parquet"), idx)
    }
    spark.conf.set(TextIndex.ConfKey, idx)
    try {
      val spansIdx = time("dedup_spans INDEX-SERVED") {
        graft.SparkEntry.queries("dedup_spans")(spark, dir).count()
      }
      assert(spansIdx == spans, s"served spans must equal recompute: $spansIdx vs $spans")
      val fracIdx = time("dedup_span_frac INDEX-SERVED") {
        graft.SparkEntry.queries("dedup_span_frac")(spark, dir)
          .filter(col("dup_ppm") > 0).count()
      }
      assert(fracIdx == frac, s"served frac must equal recompute: $fracIdx vs $frac")
      val removedIdx = time("dedup_scrub INDEX-SERVED (marking from swh; text read only for rebuild)") {
        graft.SparkEntry.queries("dedup_scrub")(spark, dir)
          .agg(sum("n_removed"), count(when(col("n_removed") > 0, 1))).head()
      }
      assert(removedIdx.getLong(0) == removed.getLong(0)
        && removedIdx.getLong(1) == removed.getLong(1), "served scrub must equal recompute")
      val dcountIdx = time("decontaminate_spans INDEX-SERVED") {
        graft.SparkEntry.queries("decontaminate_spans")(spark, dir).count()
      }
      assert(dcountIdx == dcount, s"served decontamination must equal recompute: $dcountIdx vs $dcount")
    } finally spark.conf.unset(TextIndex.ConfKey)

    println(s"[sscale] PASS: $spans spans, ${removed.getLong(0)} tokens scrubbed " +
      s"across ${removed.getLong(1)} docs; windows ≈ ${nDocs * (TOKENS_PER_DOC - 7)}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
