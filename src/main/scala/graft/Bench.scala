package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.requiredConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (not reported): JIT + codegen + parquet footer caches, so the
    // first measured query isn't charged for JVM start-of-life costs
    try SparkEntry.queries("values_in")(spark, sfDir).count()
    catch { case _: Throwable => }
    try SparkEntry.queries("agg_minmax")(spark, sfDir).count()
    catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // free checkpointed/cached RDDs so one query's scratch state doesn't
      // tax the next (localCheckpoint otherwise accumulates for the JVM's
      // lifetime)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
