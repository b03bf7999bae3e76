package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (the WarcProf discipline): times each temporal-suite entry
  * at an arbitrary sf dir and prints the funnel's final physical plan —
  * the instrument behind the events_funnel scaling investigation
  * (SURVEY §6.1c). Usage: runMain graft.tools.TemporalProf <sfDir> [q,...]
  */
object TemporalProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.requiredConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, fn) <- graft.queries.TemporalSuite.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      val df = fn(spark, dir)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"[tprof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
      }
      if (sys.env.contains("TPROF_PLAN")) {
        df.count()
        println(s"[tprof] $name final plan:\n" +
          df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
