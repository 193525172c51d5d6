package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, for broadcast-side
  * pruning of semi-joins whose build side is too big for a hash-set
  * broadcast but fits as ~10 bits/key (e.g. a benchmark shingle set in
  * test-set decontamination at 100 TB corpus scale: the filter prunes
  * the corpus postings BEFORE any shuffle; the exact equi-join that
  * follows removes the false positives, so results stay exact).
  *
  * `right` must be a foldable BINARY literal holding the serialized
  * filter (`BloomFilter.writeTo`); it is deserialized once per task via
  * a lazy val, and codegen references the deserialized instance
  * directly (ctx.addReferenceObj) instead of materializing the byte
  * array in generated source. `left` is the probed key: STRING probes
  * use the UTF-8 bytes (matching `putString`'s encoding), BIGINT keys
  * probe `mightContainLong`.
  *
  * Why an Expression (tier (b) of the design notes): Spark's own
  * BloomFilterMightContain is internal to runtime-filter planning and
  * not constructible from the public API, and a Scala UDF would box the
  * key and leave whole-stage codegen on the hot corpus scan.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = left.dataType match {
      case StringType | LongType => true
      case _ => false
    }
    if (!keyOk)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a string or bigint key, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a foldable binary literal filter")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, ignored: Any): Any = left.dataType match {
    case StringType => bloom.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
    case LongType => bloom.mightContainLong(key.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, _) => {
      val ref = ctx.addReferenceObj("graftBloom", bloom,
        classOf[BloomFilter].getName)
      val probe = left.dataType match {
        case StringType => s"$ref.mightContainBinary($key.getBytes())"
        case LongType => s"$ref.mightContainLong($key)"
      }
      s"${ev.value} = $probe;"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val FunctionName = "graft_bloom_contains"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName,
      exprs => BloomMightContain(exprs(0), exprs(1)),
      "built-in")

  /** Serialize a built filter for embedding as a binary literal. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
