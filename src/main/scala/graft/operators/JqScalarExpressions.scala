package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.jq.{Jq, JqError, Json}

/** Scalar sugar over the jq engine (Spark-first additions; the reference
  * only ships the UDTF, but scalar extraction is the dominant usage in
  * SELECT contexts and avoids a Generate node entirely).
  *
  * jq_string(json, prog): first jq output rendered as string (text nodes
  * unwrapped, others compact JSON); NULL when jq yields no output.
  */
case class JqString(child: Expression, program: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val compiled = Jq.compileCached(program)

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    val jsonText = if (raw == null) null else raw.asInstanceOf[UTF8String].toString
    try {
      val it = compiled.applyToText(jsonText)
      if (!it.hasNext) null
      else {
        val n = it.next()
        if (n.isNull) null
        else if (n.isTextual) UTF8String.fromString(n.textValue())
        else UTF8String.fromString(Json.serialize(n))
      }
    } catch {
      case e: JqError =>
        throw new RuntimeException(
          s"""jq returned an error "${e.getMessage}" from input: $jsonText""", e)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JqString =
    copy(child = newChild)
  override def prettyName: String = "jq_string"
}

/** jq_extract_all(json, prog): every jq output as a compact-JSON string,
  * collected into array<string> (NULL never — empty array when no outputs). */
case class JqExtractAll(child: Expression, program: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val compiled = Jq.compileCached(program)

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    val jsonText = if (raw == null) null else raw.asInstanceOf[UTF8String].toString
    try {
      val out = compiled.applyToText(jsonText).map { n =>
        if (n.isTextual) UTF8String.fromString(n.textValue())
        else UTF8String.fromString(Json.serialize(n))
      }.toArray[Any]
      new GenericArrayData(out)
    } catch {
      case e: JqError =>
        throw new RuntimeException(
          s"""jq returned an error "${e.getMessage}" from input: $jsonText""", e)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JqExtractAll =
    copy(child = newChild)
  override def prettyName: String = "jq_extract_all"
}
