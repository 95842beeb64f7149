package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode, StreamingQuery}

import graft.core.Meas

/** Custom streaming state via `mapGroupsWithState` — the live analog of
  * the reference's in-memory current-values map
  * [U: engines/engine.cpp — currentValue; memstorage], maintained
  * incrementally as measurements stream in.
  *
  * State is per-series (keyed by id) and constant-size — latest
  * measurement + monotonic count — so the state store stays
  * O(#series) regardless of throughput; freshness ordering is
  * (time, seq), identical to the batch merge-on-read contract.
  */
object StatefulStreams {

  case class SeriesState(time: java.sql.Timestamp, value: Double, flag: Long, seq: Long, count: Long)
  case class CurrentUpdate(id: Long, time: java.sql.Timestamp, value: Double, flag: Long, count: Long)

  private def newer(aTime: java.sql.Timestamp, aSeq: Long, bTime: java.sql.Timestamp, bSeq: Long): Boolean =
    aTime.after(bTime) || (aTime.equals(bTime) && aSeq > bSeq)

  /** Streaming current-value view over a Meas stream: emits one update
    * row per (series, microbatch) carrying the freshest measurement and
    * the running count. */
  def currentValues(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.schema(Meas.schema).parquet(dir).as[Meas]
      .groupByKey(_.id)
      .mapGroupsWithState[SeriesState, CurrentUpdate](GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[Meas], state: GroupState[SeriesState]) =>
          var st = state.getOption.getOrElse(SeriesState(new java.sql.Timestamp(Long.MinValue >> 12), 0.0, 0L, Long.MinValue, 0L))
          batch.foreach { m =>
            val fresher = st.count == 0L || newer(m.time, m.seq, st.time, st.seq)
            st = SeriesState(
              if (fresher) m.time else st.time,
              if (fresher) m.value else st.value,
              if (fresher) m.flag else st.flag,
              if (fresher) m.seq else st.seq,
              st.count + 1)
          }
          state.update(st)
          CurrentUpdate(id, st.time, st.value, st.flag, st.count)
      }
      .toDF()
  }

  /** Run the stateful stream into a queryable in-memory sink. */
  def start(spark: SparkSession, dir: String, queryName: String, checkpoint: String): StreamingQuery =
    currentValues(spark, dir).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .start()
}
