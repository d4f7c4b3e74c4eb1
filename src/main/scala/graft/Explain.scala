package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    println("=== q05 ===")
    SparkEntry.queries("q05_join5")(spark, d).explain("formatted")
    println("=== q09 ===")
    SparkEntry.queries("q09_agg_q1")(spark, d).explain("formatted")
    spark.stop()
  }
}
