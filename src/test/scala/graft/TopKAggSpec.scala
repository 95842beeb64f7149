package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKHeap, VectorFunctions}

/** graft_topk — the bounded-heap top-k aggregate. The contract under
  * test: the aggregate form is ROW-IDENTICAL to the row_number-window
  * form it replaces (ties included — both rank score DESC, id ASC),
  * partial merge across many partitions changes nothing, and the
  * buffer survives its shuffle serialization. The window form shuffles
  * and sorts every row; the heap ships k entries per (task, group) —
  * the shape the 10⁸-row brute-force truth leg runs.
  */
class TopKAggSpec extends SparkSpec {

  private def topkOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    VectorFunctions.register(spark)
    df.groupBy("g")
      .agg(expr(s"graft_topk(s, id, $k)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), col("col.score").as("s"))
  }

  private def windowOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("g", "rank", "id", "s")
  }

  test("aggregate ≡ window on hash-scored groups, 16-partition partial merge") {
    // deterministic scores with planted TIES: s quantized to 1/8ths so
    // groups of ~200 rows collide constantly — the id-ASC tiebreak is
    // exercised on every group, and 16 input partitions force map-side
    // partial heaps + merge + the serialize/deserialize shuffle path
    val df = spark.range(0, 3000, 1, 16)
      .select(col("id"), pmod(col("id"), lit(15L)).as("g"),
        (pmod(xxhash64(col("id")), lit(8L)) / 2.0).as("s"))
    val k = 5
    val agg = topkOf(df, k).orderBy("g", "rank").collect().toSeq
    val win = windowOf(df, k).orderBy("g", "rank").collect().toSeq
    assert(agg === win, "heap order (score DESC, id ASC) must equal the window's ORDER BY")
    assert(agg.size === 15 * k)
  }

  test("k past the group size returns the whole group, still sorted") {
    val df = spark.range(0, 7, 1, 3)
      .select(col("id"), lit(0L).as("g"), (col("id") % 3).cast("double").as("s"))
    val agg = topkOf(df, 100).collect().toSeq
    val win = windowOf(df, 100).orderBy("rank").collect().toSeq
    assert(agg === win)
    assert(agg.size === 7)
  }

  test("null scores are skipped, matching the window form under a NOT NULL gate") {
    val df = spark.range(0, 20, 1, 4)
      .select(col("id"), lit(0L).as("g"),
        when(col("id") % 4 === 0, lit(null)).otherwise(col("id").cast("double")).as("s"))
    val agg = topkOf(df, 3).collect().toSeq
    val win = windowOf(df.filter(col("s").isNotNull), 3).orderBy("rank").collect().toSeq
    assert(agg === win)
  }

  test("NaN ranks greatest — identical to Spark's window ORDER BY DESC") {
    // java.lang.Double.compare and Spark's sort agree: NaN > all reals,
    // so both forms put a NaN score at rank 1. The heap must not invent
    // its own NaN policy — equivalence is the contract.
    val h = new TopKHeap(2)
    h.insert(Double.NaN, 1L)
    h.insert(0.5, 2L)
    h.insert(0.7, 3L)
    assert(h.sortedBest.map(_._2) === Seq(1L, 3L),
      "NaN is greatest under Double.compare, as under Spark's DESC sort")
  }
}
