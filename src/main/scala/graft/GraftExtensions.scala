package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: lets any session enable the
  * engine's native expressions via configuration —
  *   spark.sql.extensions=graft.GraftExtensions
  * — in addition to the programmatic `Functions.registerAll` /
  * `NativeFunctions.register` paths. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, f: Expression => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => f(exprs.head)))
    inject("surt_native", graft.plans.SurtExpr.apply)
    inject("canonical_url_native", graft.plans.CanonUrlExpr.apply)
    inject("sha1_b32_native", graft.plans.Sha1Base32Expr.apply)
    inject("timestamp14_native", graft.plans.Timestamp14Expr.apply)
  }
}
