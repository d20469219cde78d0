package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: prints the formatted physical plan of selected inventory
  * queries so scan pruning / pushdown / join strategies can be
  * eyeballed after changes (`sbt "runMain graft.PlanAudit [names...]"`). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q_fastest_leaderboard", "q_pivot", "q_asof_backward",
      "q_f1_enrich", "q_dedup_minhash_lsh", "q_cosine_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
