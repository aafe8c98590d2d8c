package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Drop managed tables AND clear their warehouse directories — a
    * crashed prior run can leave the location behind with no catalog
    * entry, making the next saveAsTable refuse the CREATE. */
  def resetManagedTables(names: String*): Unit = {
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    names.foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(d)
      }
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = Sessions.build("4")
}
