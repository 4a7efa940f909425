package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main (removed once environment facts are settled). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e.getMessage.take(400)) }
    import org.apache.spark.sql.functions._
    val r = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    r.show(10, false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.select(countDistinct("l_returnflag"), countDistinct("l_linestatus")).show()
    li.select("l_returnflag", "l_linestatus").distinct().show()
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.printSchema()
    o.select(min("o_orderdate"), max("o_orderdate")).show(false)
    println("locale=" + java.util.Locale.getDefault)
    println(spark.version)
    spark.stop()
  }
}
