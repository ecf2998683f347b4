package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorFunctions

/** `SparkSessionExtensions` injection point for the engine's native
  * functions — enable with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * on a cluster, or call `VectorFunctions.register(spark)` in-process.
  * (SURVEY §4 concluded no custom Rule/Strategy is needed for reference
  * parity — Catalyst's stock pipeline dominates the reference's physical
  * design — so functions are the only injection.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VectorFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExprs", name),
        (es: Seq[Expression]) => builder(es)))
    }
}
