package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Tiny bridge into the package-private Column<->Expression converters of the
  * classic backend (the standard pattern for third-party Catalyst
  * extensions on Spark 4.x). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-root `df` as a fresh leaf over its own InternalRow RDD, DROPPING the
    * stats snapshot `Dataset.localCheckpoint` bakes into its `LogicalRDD`.
    *
    * Why: Catalyst's size-only estimator models a join as the PRODUCT of its
    * children's `sizeInBytes`, and checkpointing snapshots that estimate into
    * the new leaf. In an iterative self-join (connected components, any
    * fixpoint loop) the leaf estimate therefore compounds ~quartically per
    * round; within ~8 rounds the BigInt grows to millions of digits and every
    * subsequent stats walk burns minutes of driver CPU in BigInteger
    * multiplies (observed live: ToomCook3 frames dominating a jstack of the
    * hung loop). The public workaround is `createDataFrame(df.rdd, schema)`
    * (GraphFrames' SPARK-13346 shim), which pays a Row re-encode per round;
    * going through the session's internal creator reuses the already
    * materialized unsafe rows at zero cost. Call on an eagerly-checkpointed
    * Dataset so `queryExecution.toRdd` is the materialized RDD, not a
    * recompute.
    */
  def statsFreshCopy(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    cds.sparkSession.internalCreateDataFrame(cds.queryExecution.toRdd, cds.schema)
  }

  /** A DataFrame over an RDD of (possibly reused) InternalRows — the data-
    * source builder's entry point (round 6): lets the fused pipeline emit
    * UnsafeRows from a per-partition reused writer instead of paying a
    * product-encoder object per row. Callers must follow the scan contract:
    * rows may be overwritten after the consumer moves on (every SQL operator
    * that buffers copies first, exactly as it must for any scan). */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** The persisted RDD backing an (eagerly) checkpointed Dataset, if its plan
    * is a checkpoint leaf. Lets an iterative caller `unpersist` round k-1's
    * block-store copy once round k is materialized — without this a fixpoint
    * loop's memory grows linearly in rounds × data size. */
  def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
