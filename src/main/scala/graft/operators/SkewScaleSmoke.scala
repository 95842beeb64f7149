package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key percentile scale smoke: ONE series holding every row — the
  * pathological key the calculator's skew route exists for. Measures
  * the built-in buffering `percentile` (whole value multiset merged on
  * one task) against SkewTools.distributedPercentiles (counts +
  * cumulative rank over slim rows) at a row count where the buffer is
  * real memory, and asserts the answers are identical.
  *
  * Usage: runMain graft.operators.SkewScaleSmoke [rows]
  */
object SkewScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // one hot key; ~100k distinct values via integer hashing (no RNG)
    val df = spark.range(rows).select(lit(7L).as("id"),
      (pmod(col("id") * lit(2654435761L), lit(100000L)) / lit(1000.0)).as("value"))
      .persist()
    time(f"materialize $rows%,d rows on ONE key")(df.count())

    val ps = Seq("median" -> 0.5, "percentile90" -> 0.9, "percentile99" -> 0.99)
    val builtin = time("built-in percentile (value buffer, single merge task)") {
      df.groupBy("id").agg(
        expr("percentile(value, 0.5D)").as("median"),
        expr("percentile(value, 0.9D)").as("percentile90"),
        expr("percentile(value, 0.99D)").as("percentile99")).collect()
    }
    val routed = time("distributedPercentiles (counts + cumulative rank)") {
      SkewTools.distributedPercentiles(df, col("id"), col("value"), ps).collect()
    }
    val same = builtin.map(_.toSeq.drop(1)).toSeq == routed.map(_.toSeq.drop(1)).toSeq
    println(s"[skew] answers identical: $same (${routed.map(_.toSeq).mkString})")
    require(same, "distributed percentile diverged from the built-in")
    spark.stop()
  }
}
