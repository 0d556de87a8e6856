package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC / MERGE building blocks: apply a versioned change log to a base
  * snapshot with latest-wins semantics — the batch core of an upsert sink
  * (and the exact state a streaming `mapGroupsWithState` upsert keeps per
  * key). One shuffle on the key columns; bucket the stored base by the same
  * keys to make repeated merges exchange-free at scale.
  */
object CdcOps {

  /** Keep, per key, only the row with the highest `versionCol`, then drop
    * rows whose `opCol` is `deleteOp`. The caller supplies base ∪ changes
    * as one relation; ties on version are broken by preferring the delete
    * (a delete and an upsert at the same version = delete wins, the
    * conservative reading of a malformed log). */
  def latestWins(log: DataFrame, keyCols: Seq[String], versionCol: String,
      opCol: String, deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc,
        when(col(opCol) === deleteOp, 0).otherwise(1))
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }
}
