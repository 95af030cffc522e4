package graft

import org.apache.spark.sql.execution.FormattedMode

/** Scratch: dump formatted plans for the round-2 additions (plan-shape
  * audit — see PLANS.md). Run: sbt "runMain graft.ProfilePlans <sfDir>".
  */
object ProfilePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "text_chunk", "t_stratified_sample", "q_ntile", "e_funnel",
      "e_retention", "q_outer_join", "q_mode", "dq_rules", "q_native_sql")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
