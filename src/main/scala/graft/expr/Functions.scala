package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Column-API + SQL surface of the engine's custom Catalyst expressions —
  * the build_post_process/name-dispatch factory of the reference
  * (pytocr/postprocess/__init__.py:13-30) recast as FunctionRegistry
  * registration.
  */
object Functions {

  /** extract_turn(text): the full per-turn extractor. */
  def extract_turn(c: Column): Column =
    ColumnBridge.column(ExtractTurn(ColumnBridge.expression(c)))

  /** Register SQL names on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_turn", exprs => ExtractTurn(exprs.head), "scala_udf")
  }
}
