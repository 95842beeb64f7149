package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for grouped aggregation — the explicit-salting
  * complement to AQE's runtime skew-join splitting.
  *
  * When one series (key) holds a disproportionate share of rows, a
  * plain groupBy sends that whole key to one reducer. Algebraic
  * aggregates (count/sum/min/max) decompose: aggregate (key, salt)
  * first — spreading the hot key over `salts` reducers — then merge
  * the partials per key. Spark's partial aggregation already does this
  * within map tasks; salting extends it across the REDUCE side, which
  * matters when a single key exceeds one reducer's capacity at 100 TB.
  */
object SkewTools {

  /** Two-phase salted equivalent of
    * `df.groupBy(key).agg(count, sum(valueCol), min, max)`.
    * Deterministic salt (hash of a row-unique column, not rand()) keeps
    * runs reproducible. */
  def saltedStat(df: DataFrame, key: Column, valueCol: Column, saltBy: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("c"), sum(valueCol).as("s"),
        min(valueCol).as("mn"), max(valueCol).as("mx"))
      .groupBy(col("k"))
      .agg(sum("c").as("cnt"), sum("s").as("sum_value"),
        min("mn").as("min_value"), max("mx").as("max_value"))
}
