package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dump `explain("formatted")` for the queries named on
  * the command line (or a default set) at sf0.001, to check pushdown
  * (PushedFilters/ReadSchema), join strategies, and codegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("agg_pricing_summary", "join_star_schema", "join_broadcast_dim")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
