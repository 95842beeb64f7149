package graft.core

/** The single definition of interval-bound arithmetic for the raw-ns
  * events source.
  *
  * `events.ts` is physically TIMESTAMP(NANOS); the engine's time axis is
  * µs (DuckDB-compatible ns→µs truncation). An inclusive [from, to]
  * interval on the µs axis is therefore the half-open raw-ns window
  *
  *   ts_ns ∈ [ micros(from)·1000, (micros(to)+1)·1000 )
  *
  * because every ns value that truncates into [from_µs, to_µs] lies in
  * exactly that window. This arithmetic must stay in lockstep with the
  * DuckDB oracle's implicit truncation — keep it HERE and nowhere else;
  * a second copy that drifts by one ulp at an interval edge is the
  * hardest correctness bug in the repo to spot
  * (EventsSourceSpec/MeasPropertiesSpec pin the equivalence).
  */
object TimeBounds {

  /** Wall-clock string (UTC, "yyyy-MM-dd HH:mm:ss[.ffffff]") → epoch µs. */
  def micros(s: String): Long = {
    val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
      ldt.getNano / 1000L
  }

  /** Wall-clock string → LocalDateTime, for NTZ-literal bounds against
    * a µs-encoded `ts` column (inclusive at both ends: the stored
    * precision IS µs, so no sub-µs remainder exists to truncate). */
  def localDateTime(s: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))

  /** Inclusive lower bound on the raw-ns column. */
  def nsLower(from: String): Long = micros(from) * 1000L

  /** EXCLUSIVE upper bound on the raw-ns column for an INCLUSIVE µs
    * upper bound. */
  def nsUpperExclusive(to: String): Long = (micros(to) + 1L) * 1000L
}
