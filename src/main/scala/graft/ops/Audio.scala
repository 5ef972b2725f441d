package graft.ops

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.XxHash64

/** Audio-modality operators: WAV as an opaque `binary` column, decoded
  * with the JDK-native `javax.sound.sampled` stack — REAL decode, not a
  * stub (unlike video, where no codecs exist in this container).
  *
  * The synthetic corpus is deterministic PCM (seeded sines + noise),
  * RIFF/WAVE-encoded by [[encodeWav]]; [[audioFeatures]] decodes
  * through AudioSystem and extracts duration / peak / RMS /
  * zero-crossings per row inside `mapPartitions` (one decoder context
  * per partition — the batched-UDF shape).
  */
object Audio {

  val SampleRate = 8000

  /** Deterministic 16-bit mono PCM samples for an id. */
  def synthSamples(audioId: String): Array[Short] = {
    val h = XxHash64.hash(audioId)
    val n = 2000 + Math.floorMod(h, 4001L).toInt // 0.25s..0.75s at 8 kHz
    val f1 = 100.0 + Math.floorMod(h >>> 7, 700L)   // 100..800 Hz
    val f2 = 150.0 + Math.floorMod(h >>> 21, 1200L) // 150..1350 Hz
    val a1 = 0.35 + (Math.floorMod(h >>> 34, 100L) / 400.0)
    val a2 = 0.10 + (Math.floorMod(h >>> 43, 100L) / 1000.0)
    Array.tabulate(n) { i =>
      val t = i.toDouble / SampleRate
      val noise = (Math.floorMod(XxHash64.mix(h, i.toLong), 2001L) - 1000L) / 50000.0
      val v = a1 * math.sin(2 * math.Pi * f1 * t) +
        a2 * math.sin(2 * math.Pi * f2 * t) + noise
      (math.max(-1.0, math.min(1.0, v)) * 32767.0).toShort
    }
  }

  /** Minimal RIFF/WAVE container: 44-byte header + little-endian
    * 16-bit mono PCM (the canonical public layout). */
  def encodeWav(samples: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                      // PCM
      .putShort(1)                      // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)           // byte rate
      .putShort(2)                      // block align
      .putShort(16)                     // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode WAV bytes back to 16-bit samples via javax.sound. The
    * container format is VALIDATED, not assumed: an 8-bit or stereo
    * PCM WAV decodes without exception, but reinterpreting its frames
    * as little-endian 16-bit mono would yield silently-bogus samples —
    * such rows must take the undecodable-row drop path instead. */
  def decodeWav(bytes: Array[Byte]): Array[Short] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = in.getFormat
      require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"unsupported WAV format (need 16-bit mono LE PCM): $f")
      val raw = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Array.fill(raw.length / 2)(bb.getShort)
    } finally in.close()
  }

  final case class AudioFeatures(
      audio_id: String, n_samples: Int, duration_ms: Long,
      peak: Int, rms: Long, zero_crossings: Int)

  /** Exact integer features of a sample array (shared by the operator
    * and its test oracle). RMS is reported as a floor-rounded long so
    * engine and oracle compare without float drift. */
  def features(id: String, s: Array[Short]): AudioFeatures = {
    var peak = 0
    var sumSq = 0.0
    var zc = 0
    var i = 0
    while (i < s.length) {
      val v = s(i).toInt
      if (math.abs(v) > peak) peak = math.abs(v)
      sumSq += v.toDouble * v
      if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0))) zc += 1
      i += 1
    }
    AudioFeatures(id, s.length, s.length * 1000L / SampleRate, peak,
      math.sqrt(sumSq / math.max(1, s.length)).toLong, zc)
  }

  /** Deterministic in-plan audio corpus (binary column + id). */
  def syntheticAudio(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong)
      .repartition(math.min(n, 32))
      .as[Long]
      .mapPartitions(_.map { i =>
        val id = s"http://h${i % 5}.test/audio/a$i.wav"
        (id, encodeWav(synthSamples(id)))
      })
      .toDF("audio_id", "bytes")
  }

  /** Decode + feature-extract over a binary WAV column. Real decode,
    * partition-local batch loop; undecodable rows dropped (counted
    * upstream in real pipelines). */
  def audioFeatures(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select($"audio_id", $"bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        try Some(features(id, decodeWav(bytes)))
        catch { case _: Exception => None }
      })
      .toDF()
  }

  /** Aux dump for the {AUX} oracle: the DECODED PCM rows. The decode
    * itself is the non-SQL step; every feature after it (peak, RMS,
    * zero crossings via a lag window) is exact integer math DuckDB
    * replays — the sum of squares stays below 2^53 at these clip
    * lengths, so even the double RMS is bit-identical. */
  def pcmAux(spark: SparkSession, n: Int = 64): DataFrame = {
    import spark.implicits._
    syntheticAudio(spark, n).as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).iterator.zipWithIndex.map { case (v, i) => (id, i, v.toInt) }
      })
      .toDF("audio_id", "i", "v")
  }

  val oracle: Map[String, String] = Map(
    "q_audio_features" ->
      """WITH pcm AS (SELECT * FROM read_parquet('{AUX}/audio_pcm/*.parquet')),
        |x AS (
        |  SELECT audio_id, i, v,
        |    lag(v) OVER (PARTITION BY audio_id ORDER BY i) AS pv
        |  FROM pcm)
        |SELECT audio_id,
        |  CAST(count(*) AS INT) AS n_samples,
        |  count(*) * 1000 // 8000 AS duration_ms,
        |  CAST(max(abs(v)) AS INT) AS peak,
        |  CAST(floor(sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)))
        |    AS BIGINT) AS rms,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND
        |    ((pv < 0 AND v >= 0) OR (pv >= 0 AND v < 0)) THEN 1 ELSE 0 END)
        |    AS INT) AS zero_crossings
        |FROM x GROUP BY audio_id""".stripMargin
  )
}
