package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession =
    Sessions.builder(getClass.getSimpleName, 4).getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
