package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.graftbridge.Bridge

/** DataFrame facade for the custom operators. */
object GraftOps {

  /** Top-k rows per key via the [[TopKPerKey]] operator (bounded heap,
    * no sort). `order` columns use the usual `.desc`/`.asc` forms; plain
    * columns default to ascending. Requires [[TopKPerKeyStrategy]] on the
    * session (installed by [[graft.GraftExtensions]] or
    * `spark.experimental.extraStrategies`). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    val spark = df.sparkSession
    val keyExprs = keys.map(Bridge.expressionNow(spark, _))
    val orderExprs = order.map { c =>
      Bridge.expressionNow(spark, c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Bridge.ofRows(spark,
      TopKPerKey(keyExprs, orderExprs, k, Bridge.logicalPlan(df)))
  }
}
