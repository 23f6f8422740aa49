package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a document fingerprint as a native Catalyst expression with
  * whole-stage codegen (`doGenCode`), demonstrating the custom-Expression
  * tier of the operator preference order (compose built-ins > custom
  * Expression > custom plan). A rolling byte-wise hash is the document-
  * fingerprinting primitive of LLM-pipeline dedup; unlike xxhash64 this one
  * is specified here (FNV-1a, offset 0xcbf29ce484222325, prime 0x100000001b3)
  * so external systems can reproduce it byte-for-byte.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"fingerprint64 needs STRING, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Fingerprint64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fingerprint64"
}

object Fingerprint64 {
  private final val Offset = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** FNV-1a over raw bytes; called from both interpreted and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Register `fingerprint64` for SQL + Column use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")

  /** Column API (session must have called [[register]]). */
  def fingerprint64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("fingerprint64", c)
}
