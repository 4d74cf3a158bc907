package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** 64-bit SimHash over an array of (token) hashes: bit i of the result is
  * set when the ±1 votes of all element hashes at bit i sum positive.
  *
  * As a native expression this is one tight 64×L integer loop per row
  * inside whole-stage codegen. The same computation with higher-order
  * `aggregate` lambdas (64 folds per row) runs interpreted and was the
  * benchmark's slowest operator — a 6× win at sf0.1.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<long>, got $other")
  }

  override def nullSafeEval(c: Any): Any = {
    val arr = c.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) { votes(i) += (((h >>> i) & 1L).toInt * 2) - 1; i += 1 }
      j += 1
    }
    var out = 0L; var i = 0
    while (i < 64) { if (votes(i) > 0) out |= 1L << i; i += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((int) (($h >>> $i) & 1L)) * 2 - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $out |= 1L << $i;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SimHashExpression {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "graft_simhash",
      es => SimHash64(es.head))

  def simhash(spark: SparkSession, hashes: Column): Column = {
    register(spark); call_function("graft_simhash", hashes)
  }
}
