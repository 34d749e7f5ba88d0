package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram table function as a native Catalyst `Generator` — the
  * UDTF tier of the extension surface (scalar tier: the codegen'd
  * [[VectorBinaryExpression]]s; whole-operator tier: the as-of join
  * plan).
  *
  * Why a Generator instead of `explode(transform(sequence(...)))`: the
  * composable form materializes a per-row array of all grams before the
  * explode — for an L-word document that is an O(L·n) allocation the
  * generator never makes (it yields rows straight off one split). Same
  * output contract as the composable form, so the DuckDB oracle replay
  * is identical; `Generate` consumes it exactly like `explode`
  * (whole-stage codegen fuses the surrounding projection; the generator
  * itself evaluates, like Spark's own collection generators).
  *
  * `n` must be a foldable positive int — enforced at analysis, not at
  * runtime per row. Null/short inputs yield zero rows (explode
  * semantics, not null rows).
  */
case class NGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"ngrams needs a string column, got ${child.dataType}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure("ngrams needs a literal int n")
    else {
      val k = n.eval(null)
      if (k == null || k.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("ngrams needs n >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val k = n.eval(input).asInstanceOf[Int]
      // split(-1): trailing empty words preserved, matching split(text, ' ')
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < k) Iterator.empty
      else (0 to words.length - k).iterator.map { i =>
        InternalRow(UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))

  override def prettyName: String = "ngrams"
}

/** Column API + SQL registration for the graft generators. */
object TextGenerators {
  def ngrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(NGrams(
      GraftColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams", exprs => NGrams(exprs(0), exprs(1)), "built-in")
}
