package graft.ext

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AVRO envelope codec for the aggregated/processed Kafka topic (SURVEY §2.1
  * S7; the reference's PROCESSED topic is AVRO —
  * `reference:README.md:39,81,216`).
  *
  * This environment bundles the core Avro library (`avro-1.12.1.jar`) but
  * not the `spark-avro` connector module, so `org.apache.spark.sql.avro
  * .functions.{to_avro, from_avro}` would fail at analysis time (their
  * implementing expressions are absent). The codec is therefore a pair of
  * native Catalyst expressions over the public Avro runtime: real Avro
  * binary wire format (zigzag-varint longs, length-prefixed UTF-8 strings,
  * IEEE-754 little-endian doubles), byte-deterministic, schema fixed to the
  * event envelope. With spark-avro on the classpath the same frames feed
  * `to_avro`/`from_avro` unchanged.
  *
  * CodegenFallback is deliberate: serialization cost is dominated by the
  * Avro encoder itself, not expression dispatch, and the envelope sits at
  * the sink boundary, outside any aggregating hot loop. Encoder/decoder
  * instances are reused per task via transient state (zero per-row
  * allocation beyond the output array).
  */
object AvroEnvelope {
  /** Envelope schema: the five wire fields of the processed-event record. */
  val SchemaJson: String =
    """{"type":"record","name":"EventEnvelope","namespace":"graft","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"ts_us","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"price","type":"double"}]}""".stripMargin

  def parsedSchema(): Schema = new Schema.Parser().parse(SchemaJson)

  /** Struct of decoded envelope fields, mirroring [[SchemaJson]]. */
  val decodedType: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  def encode(eventId: Column, tsUs: Column, userId: Column,
      eventType: Column, price: Column): Column =
    ColumnBridge.column(AvroEnvelopeEncode(Seq(eventId, tsUs, userId,
      eventType, price).map(ColumnBridge.expression)))

  def decode(bytes: Column): Column =
    ColumnBridge.column(AvroEnvelopeDecode(ColumnBridge.expression(bytes)))
}

/** (event_id, ts_us, user_id, event_type, price) → Avro binary record.
  * Input types are enforced at ANALYSIS time (`ExpectsInputTypes`), so a
  * mistyped column (int event_id, decimal price, …) fails with a proper
  * analysis error instead of a ClassCastException inside eval. */
case class AvroEnvelopeEncode(children: Seq[Expression])
    extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "envelope has exactly 5 fields")

  override def inputTypes: Seq[DataType] =
    Seq(LongType, LongType, LongType, StringType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_envelope_encode"

  @transient private lazy val schema = AvroEnvelope.parsedSchema()
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val out = new ByteArrayOutputStream(64)
  @transient private var encoder: BinaryEncoder = _

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val record = new GenericData.Record(schema)
    record.put(0, vals(0).asInstanceOf[Long])
    record.put(1, vals(1).asInstanceOf[Long])
    record.put(2, vals(2).asInstanceOf[Long])
    record.put(3, new Utf8(vals(3).asInstanceOf[UTF8String].getBytes))
    record.put(4, vals(4).asInstanceOf[Double])
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(record, encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Avro binary record → struct(event_id, ts_us, user_id, event_type,
  * price); the inverse of [[AvroEnvelopeEncode]]. Non-binary input is an
  * analysis-time error (`ExpectsInputTypes`). */
case class AvroEnvelopeDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = AvroEnvelope.decodedType
  override def prettyName: String = "avro_envelope_decode"

  @transient private lazy val schema = AvroEnvelope.parsedSchema()
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](schema)
  @transient private var decoder: BinaryDecoder = _
  @transient private var record: GenericRecord = _

  override def nullSafeEval(bytes: Any): Any = {
    val b = bytes.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(b, decoder)
    record = reader.read(record, decoder)
    InternalRow(
      record.get(0).asInstanceOf[Long],
      record.get(1).asInstanceOf[Long],
      record.get(2).asInstanceOf[Long],
      UTF8String.fromString(record.get(3).toString),
      record.get(4).asInstanceOf[Double])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
