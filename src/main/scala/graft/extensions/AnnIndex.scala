package graft.extensions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TsdbStorage

/** Persisted ANN index — the artifact a production 100 TB embedding
  * corpus builds ONCE and serves every query from, instead of
  * recomputing SRP codes and IVF centroids per query.
  *
  * Layout under an index dir:
  *   codes/      parquet (vec_id, code, cell) — one slim row per vector:
  *               its 16-bit SRP code and its nearest-centroid IVF cell
  *   centroids/  parquet (clabel, cv, cnorm) — the coarse quantizer,
  *               FROZEN at build time (like a trained IVF quantizer:
  *               appended vectors are assigned to existing cells, the
  *               quantizer is not re-derived per batch)
  *   _SYNCED     commit marker — the same certify/fallback protocol as
  *               the engine's chunk-stat index (TsdbStorage): every
  *               mutation drops the marker first and restores it only
  *               after the index content committed, so a crash in
  *               between leaves the index uncertified and queries fall
  *               back to the always-correct recompute path.
  *
  * Query integration: set `spark.graft.ann.indexDir` to the index dir;
  * `sim_ann` / `sim_ivf` read codes/centroids from it when CERTIFIED
  * and recompute otherwise. Codes and cells are derived with the exact
  * expressions the live path uses (SimilarityQueries.srpCoded /
  * assignCells), so index-served results are identical to recomputed
  * ones — AnnIndexSpec pins that equality.
  *
  * Scale shape: codes rows are 3 longs per vector (slim by design —
  * the 3× wide-row regression measured in VectorScaleSmoke motivated
  * this layout); the centroid table is cells×dims, always
  * broadcastable. An append touches only the appended vectors; no
  * existing file is rewritten (compact() coalesces the accumulation).
  */
object AnnIndex {

  /** Session conf key pointing sim_ann/sim_ivf at a persisted index. */
  val ConfKey = "spark.graft.ann.indexDir"

  private def codesPath(dir: String) = s"$dir/codes"
  private def centroidsPath(dir: String) = s"$dir/centroids"
  private def metaPath(dir: String) = s"$dir/_meta"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The certified index dir the session points at, if any. None ⇒
    * callers recompute (conf unset, dir missing, or marker absent). */
  def resolve(spark: SparkSession): Option[String] =
    Option(spark.conf.get(ConfKey, null)).filter(usable(spark, _))

  /** True iff the index exists AND its last mutation committed. */
  def usable(spark: SparkSession, dir: String): Boolean =
    TsdbStorage.statsUsable(spark, dir)

  def readCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(codesPath(dir))

  def readCentroids(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(centroidsPath(dir))

  /** The SRP scheme this index was built with: (planes, bandBits).
    * Persisted at build so queries band stored codes with the SAME
    * scheme at any later time; indexes predating the meta file read as
    * the default (the gated 16/4 configuration). */
  def readMeta(spark: SparkSession, dir: String): (Int, Int) = {
    val p = new Path(metaPath(dir))
    if (!fs(spark, dir).exists(p)) (SimilarityQueries.N_PLANES, SimilarityQueries.BAND_BITS)
    else {
      val r = spark.read.parquet(metaPath(dir)).head()
      (r.getInt(0), r.getInt(1))
    }
  }

  /** Band the index's stored codes with ITS OWN persisted scheme. */
  def bandsFromIndex(spark: SparkSession, dir: String): DataFrame = {
    val (planes, bandBits) = readMeta(spark, dir)
    SimilarityQueries.srpBands(
      readCodes(spark, dir).select("vec_id", "code"), planes, bandBits)
  }

  /** Assign vectors to THIS index's frozen centroids — the production
    * classify-new-vectors path, and what append() persists. `raw` is an
    * embeddings-shaped frame (vec_id, embedding, ...). */
  def assign(spark: SparkSession, raw: DataFrame, dir: String): DataFrame =
    SimilarityQueries.assignCells(SimilarityQueries.prep(spark, raw), readCentroids(spark, dir))

  /** Build (or rebuild) the index from a full corpus: derive the
    * centroid table, code + assign every vector, certify. A rebuild
    * over a changed corpus is the IVF "retrain" — the only operation
    * that moves the centroids (or the SRP scheme).
    *
    * planes/bandBits parameterize the SRP scheme and are PERSISTED with
    * the index: expected band-bucket occupancy is N / 2^bandBits, and
    * the band self-join is quadratic in it, so bandBits grows with the
    * corpus (the default 16/4 is the gated test-scale configuration;
    * ~10⁹ vectors wants 16+ bits per band — the 4-vs-8-bit trade is
    * measured in VectorScaleSmoke). */
  def build(spark: SparkSession, raw: DataFrame, dir: String,
            planes: Int = SimilarityQueries.N_PLANES,
            bandBits: Int = SimilarityQueries.BAND_BITS): Unit = {
    require(planes % bandBits == 0, s"planes ($planes) must be a multiple of bandBits ($bandBits)")
    TsdbStorage.markStatsOutOfSync(spark, dir)
    import spark.implicits._
    Seq((planes, bandBits)).toDF("planes", "band_bits")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(dir))
    val cent = SimilarityQueries.centroidTable(spark, raw).coalesce(1)
    cent.write.mode("overwrite").parquet(centroidsPath(dir))
    val e = SimilarityQueries.prep(spark, raw)
    SimilarityQueries.srpCoded(e, planes).select("vec_id", "code")
      .join(SimilarityQueries.assignCells(e, readCentroids(spark, dir)), "vec_id")
      .write.mode("overwrite").parquet(codesPath(dir))
    TsdbStorage.markStatsInSync(spark, dir)
  }

  /** Incrementally index appended vectors: SRP codes are per-vector
    * deterministic (fixed hyperplanes), cells are assigned against the
    * FROZEN centroids — both bit-identical to what a build would derive
    * with the same quantizer, so the index stays exact under appends.
    * Only the new vectors are written; nothing is rewritten. */
  def append(spark: SparkSession, rawNew: DataFrame, dir: String): Unit = {
    require(usable(spark, dir), s"ANN index at $dir is absent or uncertified — build() first")
    val (planes, _) = readMeta(spark, dir) // code with the index's own scheme
    TsdbStorage.markStatsOutOfSync(spark, dir)
    val e = SimilarityQueries.prep(spark, rawNew)
    SimilarityQueries.srpCoded(e, planes).select("vec_id", "code")
      .join(SimilarityQueries.assignCells(e, readCentroids(spark, dir)), "vec_id")
      .write.mode("append").parquet(codesPath(dir))
    TsdbStorage.markStatsInSync(spark, dir)
  }

  /** Integrity probe (the fsck of this artifact): every codes/centroids
    * file fully decompressed, distributed. A corrupt file UNCERTIFIES
    * the index immediately — even without repair — so queries fall back
    * to recompute instead of throwing mid-query; with repair the bad
    * files are dropped. Repair either way is `build()` (the index is
    * derived data — unlike the scheme log, dropping it loses nothing). */
  def fsck(spark: SparkSession, dir: String, repair: Boolean = false): Seq[String] = {
    val bad = TsdbStorage.probeFiles(spark, codesPath(dir)) ++
      TsdbStorage.probeFiles(spark, centroidsPath(dir)) ++
      TsdbStorage.probeFiles(spark, metaPath(dir))
    if (bad.nonEmpty) {
      TsdbStorage.markStatsOutOfSync(spark, dir)
      if (repair) { val f = fs(spark, dir); bad.foreach(p => f.delete(new Path(p), false)) }
    }
    bad
  }

  /** Coalesce the append-accumulated codes files (contents unchanged) —
    * the same tmp-swap discipline as the engine's compact paths, with
    * the marker protocol covering the swap. */
  def compact(spark: SparkSession, dir: String): Unit = {
    require(usable(spark, dir), s"ANN index at $dir is absent or uncertified")
    val f = fs(spark, dir)
    val live = new Path(codesPath(dir))
    val tmp = new Path(s"${codesPath(dir)}.compacting")
    val old = new Path(s"${codesPath(dir)}.old")
    TsdbStorage.markStatsOutOfSync(spark, dir)
    f.delete(tmp, true)
    f.delete(old, true)
    readCodes(spark, dir).coalesce(1).write.parquet(tmp.toString)
    f.rename(live, old)
    f.rename(tmp, live)
    f.delete(old, true)
    TsdbStorage.markStatsInSync(spark, dir)
  }
}
