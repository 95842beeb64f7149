package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Specs for the native codegen expressions: they must agree exactly
  * with the stock-Spark formulations they replace, in both the codegen
  * and interpreted evaluation paths.
  */
class FunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    VectorFunctions.register(spark)
  }

  test("graft_dot agrees bit-for-bit with the zip_with/aggregate formulation") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val both = df.withColumn("fast", expr("graft_dot(v, v)"))
      .withColumn("ref", expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (a, x) -> a + x)"))
    assert(both.filter(col("fast") =!= col("ref")).count() === 0L)
  }

  test("graft_dot yields NULL on length mismatch (corrupt vectors surface, not partial sums)") {
    val rows = spark.sql(
      "SELECT graft_dot(array(1D, 2D), array(1D, 2D, 3D)) AS bad, graft_dot(array(1D, 2D), array(3D, 4D)) AS good")
    val r = rows.head()
    assert(r.isNullAt(0), "mismatched lengths must be NULL")
    assert(r.getDouble(1) === 11.0)
  }

  test("graft_md5_prefix equals conv(substring(md5(x),1,n),16,10)") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("fast8", expr("graft_md5_prefix(text, 8)"))
      .withColumn("ref8", expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("fast15", expr("graft_md5_prefix(text, 15)"))
      .withColumn("ref15", expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"))
    assert(df.filter(col("fast8") =!= col("ref8") || col("fast15") =!= col("ref15")).count() === 0L)
  }

  test("graft_minhash equals the per-hash array_min(transform(md5)) chain") {
    val sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), expr("filter(split(text, ' '), t -> t != '')").as("sh"))
    val both = sh.withColumn("fast", expr("graft_minhash(sh, 8)"))
      .withColumn("ref", array((0 until 8).map(i =>
        expr(s"array_min(transform(sh, x -> md5(concat('$i|', x))))")): _*))
    assert(both.filter(col("fast") =!= col("ref")).count() === 0L)
    // empty input → all-null minima, matching array_min(empty) = NULL
    val empty = spark.sql(
      "SELECT graft_minhash(CAST(array() AS ARRAY<STRING>), 4) AS mhs").head()
    assert(empty.getSeq[String](0) === Seq(null, null, null, null))
  }

  test("graft_simhash equals the explode/majority-vote SQL formulation") {
    val hashes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(text, ' '), t -> t != ''), x -> graft_md5_prefix(x, 8))").as("hs"))
    val fast = hashes.select(col("doc_id"), expr("graft_simhash(hs)").as("sig"))
    val ref = hashes.select(col("doc_id"), explode(col("hs")).as("h"))
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 31)")).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(expr("shiftright(h, b) & 1")).as("c"), count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN c * 2 > n THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END")).as("sig"))
    assert(fast.join(ref.withColumnRenamed("sig", "ref_sig"), "doc_id")
      .filter(col("sig") =!= col("ref_sig")).count() === 0L)
  }

  test("graft_simhash64 equals the explode/majority-vote SQL formulation over all 64 bits") {
    val hashes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(text, ' '), t -> t != ''), x -> xxhash64(x))").as("hs"))
    val fast = hashes.select(col("doc_id"), expr("graft_simhash64(hs)").as("sig"))
    // reference: per-bit vote with UNSIGNED bit extraction (bit 63 of a
    // negative hash must read as 1, hence the shiftrightunsigned)
    val ref = hashes.select(col("doc_id"), explode(col("hs")).as("h"))
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 63)")).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(expr("shiftrightunsigned(h, b) & 1")).as("c"), count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN c * 2 > n THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END")).as("sig"))
    assert(fast.join(ref.withColumnRenamed("sig", "ref_sig"), "doc_id")
      .filter(col("sig") =!= col("ref_sig")).count() === 0L)
  }

  test("GraftExtensions injects the full SQL surface (spark.sql.extensions path)") {
    // a session built via withExtensions on the shared context — the
    // cluster deployment path, no VectorFunctions.register call. The
    // shared spec session must step aside for getOrCreate to actually
    // BUILD one (an existing default session ignores new extensions);
    // restored in the finally
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
        .master("local[4]").appName("graft-ext-test")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      finally { SparkSession.setDefaultSession(spark); SparkSession.setActiveSession(spark) }
    for (fn <- Seq("graft_dot", "graft_md5_prefix", "graft_simhash", "graft_minhash"))
      assert(s2.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fn)), s"$fn missing")
    val r = s2.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_md5_prefix('abc', 8) AS h,
        |       graft_simhash(array(1L, 2L, 3L)) AS sh,
        |       graft_minhash(array('a', 'b'), 2) AS mh""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("abc").substring(0, 8), 16))
    assert(r.getSeq[String](3).size === 2)
  }
}
