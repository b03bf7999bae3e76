package graft.tools
import org.apache.spark.sql.SparkSession
object PrTune {
  def main(args: Array[String]): Unit = {
    val parts = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled","false")
      .config(graft.Tables.requiredConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = { val t0=System.nanoTime()
      graft.SparkEntry.queries("graph_pagerank")(spark, "/tmp/graft-sf10").count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (System.nanoTime()-t0)/1e9 }
    val times = Seq(once(), once())
    println(f"[tune] partitions=$parts pagerank sf10 min=${times.min}%.1fs runs=${times.map(t => f"$t%.1f").mkString(",")}")
    spark.stop()
  }
}
