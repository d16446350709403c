package graft.codec

import graft.core.EngineConfig

/** The envelope WIRE FORMAT seam — how a payload's writer-schema id is
  * framed around the Avro body. Two deployed shapes exist:
  *
  *  - [[EnvelopeFormat.Magic1]] (default): `[magic:1][avro-binary:N]` —
  *    the reference's framing (`WeatherKafkaAvroDeserializerSchema.java:
  *    41-46`: first byte selects the writer schema). Ids must fit a byte.
  *  - [[EnvelopeFormat.Confluent]]: `[0x00][schemaId:4 BE][avro-binary:N]`
  *    — the confluent wire format the HTTP registry's protocol pairs with
  *    in production: magic 0x00, then the registry schema id as a 4-byte
  *    big-endian int (ids routinely exceed a byte there).
  *
  * The decode path is format-agnostic: it asks the format for the id and
  * the body offset, then resolves the id through
  * [[SchemaRegistry.schemasById]]. A malformed header (too short, or a
  * confluent record whose first byte isn't 0x00) reads as None and the
  * record drops through the same poison-pill path as a corrupt body —
  * never an exception, never a failed job.
  */
sealed trait EnvelopeFormat extends Serializable {
  /** Bytes of header before the Avro body. */
  def headerLen: Int
  /** Writer-schema id from the envelope, or None if the header is
    * malformed (caller drops the record). */
  def readId(bytes: Array[Byte]): Option[Int]
  /** Render the header for `id` (fixture/producer side). */
  def writeHeader(out: java.io.OutputStream, id: Int): Unit
}

object EnvelopeFormat {

  /** Reference parity: 1-byte magic IS the schema id. */
  case object Magic1 extends EnvelopeFormat {
    val headerLen = 1
    def readId(bytes: Array[Byte]): Option[Int] =
      // body must be non-empty: header + >=1 byte (the pre-round-12
      // `length < 2` guard, unchanged)
      if (bytes.length < 2) None else Some(bytes(0).toInt)
    def writeHeader(out: java.io.OutputStream, id: Int): Unit = {
      require(id >= Byte.MinValue && id <= Byte.MaxValue,
        s"schema id $id does not fit the 1-byte envelope magic")
      out.write(id)
    }
  }

  /** Confluent wire format: 0x00 + 4-byte big-endian schema id. */
  case object Confluent extends EnvelopeFormat {
    val headerLen = 5
    def readId(bytes: Array[Byte]): Option[Int] =
      if (bytes.length < 6 || bytes(0) != 0) None
      else Some(((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff))
    def writeHeader(out: java.io.OutputStream, id: Int): Unit = {
      out.write(0)
      out.write((id >>> 24) & 0xff); out.write((id >>> 16) & 0xff)
      out.write((id >>> 8) & 0xff); out.write(id & 0xff)
    }
  }

  /** `--envelope.format magic1 (default) | confluent`. */
  def fromConfig(conf: EngineConfig): EnvelopeFormat =
    conf.getOrElse("envelope.format", "magic1") match {
      case "magic1" => Magic1
      case "confluent" => Confluent
      case other => throw new IllegalArgumentException(
        s"unknown --envelope.format '$other' (magic1 | confluent)")
    }
}
