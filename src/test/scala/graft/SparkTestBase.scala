package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestBase {
  /** Per-JVM-run warehouse dir: `saveAsTable` locations die with the run, so
    * a re-run never hits LOCATION_ALREADY_EXISTS from a stale
    * `spark-warehouse/` left by a previous test JVM (round-1 flake). */
  lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString
}

/** Shared local SparkSession for suites (one per suite, lazy). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", SparkTestBase.warehouseDir)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(name: String) = s"/root/testdata/$name"
}
