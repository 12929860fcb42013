package graft.sources

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.KafkaIngest.KafkaSourceConfig

/** The Kafka ingest option surface: the rendered option map must match
  * the reference's readStream options line-for-line
  * (03_Data_Ingestion.py:148-158), and the same reader plumbing must
  * drive the wire-identical replay source end-to-end (no broker or
  * connector jar exists in this sandbox — the format name is the only
  * deployment delta).
  */
class KafkaIngestSpec extends SparkSpec {

  private val cfg = KafkaSourceConfig(
    topic = "inventory.event",
    bootstrapServers = "broker-0.example:9092",
    saslJaasConfig = "kafkashaded.org.apache.kafka.common.security.scram." +
      "ScramLoginModule required username='u' password='p';")

  test("option map reproduces the reference's Kafka source options exactly") {
    assert(KafkaIngest.options(cfg) == Map(
      "subscribe" -> "inventory.event",
      "kafka.bootstrap.servers" -> "broker-0.example:9092",
      "kafka.sasl.mechanism" -> "SCRAM-SHA-512",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.jaas.config" -> cfg.saslJaasConfig,
      "kafka.request.timeout.ms" -> "60000",
      "kafka.session.timeout.ms" -> "60000",
      "failOnDataLoss" -> "false",
      "startingOffsets" -> "latest",
      "maxOffsetsPerTrigger" -> "100"))
  }

  test("reader resolves format 'kafka' + the exact reference options on the DataStreamReader") {
    // the deploy-path seam: reader(spark, cfg) with the DEFAULT format
    // must hand Spark precisely (format = "kafka", options = the
    // reference's map) — asserted on the reader's resolved state via
    // reflection (the fields are private), so the only untested delta
    // left is the broker itself (none exists in this sandbox)
    val r = KafkaIngest.reader(spark, cfg)
    def field(obj: AnyRef, name: String): AnyRef = {
      var c: Class[_] = obj.getClass
      while (c != null) {
        c.getDeclaredFields.find(_.getName.split("\\$").last == name) match {
          case Some(f) => f.setAccessible(true); return f.get(obj)
          case None => c = c.getSuperclass
        }
      }
      fail(s"no field '$name' on ${obj.getClass}")
    }
    assert(field(r, "source") == "kafka")
    val resolved = field(r, "extraOptions")
      .asInstanceOf[scala.collection.Map[String, String]]
    // CaseInsensitiveMap may fold key case; compare case-insensitively,
    // values verbatim
    val want = KafkaIngest.options(cfg)
      .map { case (k, v) => (k.toLowerCase, v) }
    val got = resolved.map { case (k, v) => (k.toLowerCase, v) }.toMap
    assert(got == want)
  }

  test("reader drives the wire-identical replay source through the bronze path") {
    val bronze = KafkaIngest.bronze(spark, cfg,
      format = "graft.sources.PosReplaySource")
    // the replay source's schema IS the Kafka source's wire schema
    assert(bronze.schema == StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType))))
    val name = s"kafka_ingest_${System.nanoTime()}"
    val q = bronze.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckptDir(name))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(name).count() > 0)
  }
}
