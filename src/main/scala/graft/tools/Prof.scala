package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev profiler: run one named SparkEntry query repeatedly under the
  * bench environment (local[N], N shuffle partitions) and print per-run
  * wall time plus the formatted executed plan. Usage:
  *
  *   runMain graft.tools.Prof <name> [sfDir] [runs]
  *
  * Reads SPARK_GRAFT_CPUS like Bench (default 4) so numbers are
  * comparable to the committed record; SPARK_GRAFT_SHUFFLE_PARTS
  * (default = cpus) decouples the shuffle-partition count for
  * partition-count tuning sweeps.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.requiredConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[prof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println("[prof] plan:")
    println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
