package graft.tools

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.functions._

import graft.codec.AvroEnvelope
import graft.core.{EngineSession, Tables}

/** A/B: does the SchemaRegistry-trait + EnvelopeFormat decode path cost
  * anything PER RECORD vs the pre-trait inlined form? (r11 verdict task
  * 2: Q-scan-04 read 1.75× its ledger row in the same round the decode
  * path gained the registry trait — rule the seam in or out before
  * re-basing.)
  *
  * Method: build Q-scan-04's exact envelope set once (persisted,
  * untimed), then time decode-only under
  *  (a) CURRENT — `AvroEnvelope.decode` through the trait + format
  *      indirection (Int-keyed readers, format.readId per record);
  *  (b) PRE-TRAIT — the round-10 hot loop inlined verbatim below
  *      (Byte-keyed map, `bytes(0)` magic, fixed offset 1).
  * Both paths do identical Avro work; alternating min-of-3 per side so
  * host drift hits both. Per-partition init (schema parse, reader
  * construction) is identical in both and amortized over ~2M records.
  * Prints one JSON line; |ratio − 1| within run noise = the seam is
  * free, and the Q-scan-04 drift row is environment, not code.
  */
object DecodeAb {

  def main(args: Array[String]): Unit = {
    val spark = EngineSession.getOrCreate("graft-decode-ab")
    import spark.implicits._
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    // Q-scan-04's envelope construction, verbatim
    val envelopes = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .as[(Long, Long, Long, Double)]
      .map { case (eid, uid, tsMs, v) =>
        val reading = AvroEnvelope.WeatherReading(
          s"dev-$uid", tsMs, Some(v), None, None,
          if (eid % 3 == 0) None else Some(v * 2))
        val magic: Byte =
          if (eid % 50 == 0) 77.toByte
          else if (eid % 97 == 0) 9.toByte
          else if (eid % 3 == 0) 1.toByte else 2.toByte
        AvroEnvelope.encode(reading,
          if (magic == 77.toByte) 2.toByte else magic,
          AvroEnvelope.defaultRegistry) match {
          case bytes if magic == 77.toByte => 77.toByte +: bytes.tail
          case bytes => bytes
        }
      }
    // replicate ×20 (~2M records): per-record cost differences must rise
    // above task-scheduling noise, which dominates at 100k rows / 32
    // partitions (~0.2 s total)
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val envBig = envelopes
      .mapPartitions(it => it.flatMap(b => Iterator.fill(rep)(b)))
      .persist()
    val n = envBig.count() // stage the fixture, untimed

    val current = () =>
      AvroEnvelope.decode(spark, envBig).rdd.count()

    // the round-10 decode hot loop, inlined (git 5a19d3b^ —
    // AvroEnvelope.decodeWithMetrics before the Int-keyed rework)
    val registryMap = AvroEnvelope.defaultRegistry
    val readerJson = AvroEnvelope.readerSchemaJson
    val preTrait = () => envBig.mapPartitions { it =>
      val reader = new Schema.Parser().parse(readerJson)
      val readers: Map[Byte, GenericDatumReader[GenericRecord]] =
        registryMap.map { case (magic, json) =>
          val writer = new Schema.Parser().parse(json)
          magic -> new GenericDatumReader[GenericRecord](writer, reader)
        }
      val writerNames: Map[Byte, String] =
        registryMap.map {
          case (m, json) => m -> new Schema.Parser().parse(json).getName }
      var decoder: BinaryDecoder = null
      var record: GenericRecord = null
      it.flatMap { bytes =>
        try {
          if (bytes == null || bytes.length < 2) None
          else {
            val magic = bytes(0)
            readers.get(magic) match {
              case None => None
              case Some(_) if writerNames(magic) != reader.getName => None
              case Some(r) =>
                decoder = DecoderFactory.get()
                  .binaryDecoder(bytes, 1, bytes.length - 1, decoder)
                record = r.read(null, decoder)
                def optD(f: String): Option[Double] =
                  Option(record.get(f)).map(_.asInstanceOf[Double])
                Some(AvroEnvelope.WeatherReading(
                  record.get("deviceId").toString,
                  record.get("timestamp").asInstanceOf[Long],
                  optD("temperature"), optD("humidity"),
                  optD("windSpeed"), optD("pressure")))
            }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }.rdd.count()

    def once(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // JIT warm-up for BOTH paths, then 3 alternating timed rounds
    once(current); once(preTrait)
    val runs = (1 to 3).map(_ => (once(current), once(preTrait)))
    val curMin = runs.map(_._1._1).min
    val preMin = runs.map(_._2._1).min
    val rowsCur = runs.head._1._2
    val rowsPre = runs.head._2._2
    require(rowsCur == rowsPre,
      s"decode parity broken: trait=$rowsCur pre-trait=$rowsPre")
    println(f"""{"name":"decode-ab","envelopes":$n,"decoded":$rowsCur,""" +
      f""""current_s":$curMin%.3f,"pre_trait_s":$preMin%.3f,""" +
      f""""ratio":${curMin / preMin}%.3f}""")
    spark.stop()
  }
}
