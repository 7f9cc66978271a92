package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  IntegerType, LongType}

/** Codegen that delegates to the expression's own eval through an
  * object reference instead of falling back to the interpreter.
  *
  * Why not CodegenFallback: a single CodegenFallback expression makes
  * Spark exclude the ENTIRE containing stage from whole-stage codegen,
  * so every other operator in that stage runs interpreted too. The
  * heavy per-row loops here (minhash over all shingles, simhash bit
  * votes, rolling hashes) are plain JVM code either way — what matters
  * is keeping the surrounding scan/filter/project pipeline compiled,
  * which this generated call preserves.
  */
trait EvalDelegatingCodegen { self: UnaryExpression =>

  /** Public bridge to the protected nullSafeEval for generated code. */
  final def compute(v: Any): Any = nullSafeEval(v)

  protected def delegatedGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      dataType match {
        case LongType if nullable =>
          // nullable long results (hdr_quantile of an empty sketch)
          // surface null through isNull, not a sentinel — only when
          // the expression declares nullability (a false-literal
          // isNull is not assignable in generated code)
          val r = ctx.freshName("graftRes")
          s"""Object $r = $ref.compute($c);
             |if ($r == null) { ${ev.isNull} = true; }
             |else { ${ev.value} = ((java.lang.Long) $r)
             |  .longValue(); }""".stripMargin
        case LongType =>
          s"${ev.value} = ((java.lang.Long) $ref.compute($c)).longValue();"
        case IntegerType =>
          s"${ev.value} = ((java.lang.Integer) $ref.compute($c))" +
            ".intValue();"
        case DoubleType =>
          // nullable double results (hist_quantile of an empty sketch)
          // surface null through isNull, not a sentinel
          val r = ctx.freshName("graftRes")
          s"""Object $r = $ref.compute($c);
             |if ($r == null) { ${ev.isNull} = true; }
             |else { ${ev.value} = ((java.lang.Double) $r)
             |  .doubleValue(); }""".stripMargin
        case _: ArrayType =>
          s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
            s"$ref.compute($c);"
        case other =>
          throw new IllegalStateException(
            s"EvalDelegatingCodegen: unhandled type $other")
      }
    })
}
