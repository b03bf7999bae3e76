package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private session API.
  *
  * Fixpoint loops need frames that are (a) materialized with truncated
  * lineage and (b) carry FRESH attribute ids (self-union/self-join across
  * rounds otherwise trips Catalyst's union constraint rewrite on shared
  * ids). The public route — `createDataFrame(df.rdd, schema)` — pays a full
  * InternalRow→Row→InternalRow round trip per row; this helper reuses the
  * checkpointed InternalRow RDD directly (zero conversion) and lets
  * `internalCreateDataFrame` mint fresh output attributes.
  */
object Internal {

  /** Conf switch: `spark.graft.reliableCheckpoints=true` routes fixpoint
    * materialization through RELIABLE checkpoints (replicated to the
    * configured checkpoint dir) instead of executor-local ones. Local
    * checkpoints are faster but non-replicated: on a real cluster, one
    * lost executor kills a 30-round closure. Set
    * `sparkContext.setCheckpointDir` (HDFS/S3 path) for cluster runs.
    */
  val ReliableCheckpointsConf = "spark.graft.reliableCheckpoints"

  def freshIdCheckpoint(df: DataFrame): DataFrame = {
    val spark0 = df.sparkSession
    val reliable =
      spark0.conf.getOption(ReliableCheckpointsConf).exists(_.toBoolean)
    val cp =
      if (reliable) {
        require(spark0.sparkContext.getCheckpointDir.isDefined,
          s"$ReliableCheckpointsConf=true needs sparkContext.setCheckpointDir")
        df.checkpoint(eager = true)
      } else df.localCheckpoint(eager = true)
    val classicDf =
      cp.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classicDf.sparkSession
    spark.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, classicDf.schema, isStreaming = false)
  }

  /** Column ↔ Expression bridges for custom Catalyst expressions
    * (ExpressionUtils is private[sql]).
    */
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
