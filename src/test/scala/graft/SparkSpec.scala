package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM per `sbt test`
  * fork; getOrCreate dedupes across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  // Built THROUGH GraftSession (small core/partition counts for test
  // speed) — a hand-copied conf here drifted once already (adaptive
  // was pinned in GraftSession but absent in the copy), and every
  // future semantic conf added there must apply to specs too, or the
  // suite green-lights behavior production sessions don't have.
  lazy val session: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
}
