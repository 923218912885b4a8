package graft.streaming

/** Test-side twin of Streams.tsMicros: full-microsecond event time for
  * replay ordering and expected-value folds. `Timestamp.getTime`
  * truncates to milliseconds; the fixtures carry microsecond
  * timestamps, so any spec that sorts a replay or folds an expected
  * sequence must use this, mirroring the main-source convention
  * StreamingConventionSpec enforces. (`getTime` on whole-second
  * literal constants — base-epoch arithmetic — is fine.)
  */
object TestTime {
  def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
}
