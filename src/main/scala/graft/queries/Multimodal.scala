package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing (north-star layer, SURVEY.md §2i / task
  * contract): image/audio/video as opaque BINARY columns with typed
  * metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED with a deterministic fake (no codec libs
  * in this container — the contract says stub the decode, make the
  * Spark-side plumbing real): `fakeDecode` pretends the blob is a frame
  * and derives (n_bytes, checksum, width, height) purely from the bytes.
  * The plumbing IS real: binary column → typed Dataset →
  * `mapPartitions` (the Scala analogue of a batched Pandas UDF: one
  * iterator per partition, amortized per-batch setup — a real decoder
  * would open its codec context once per partition here, exactly where
  * the stub comment sits).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class Frame(doc_id: Long, n_bytes: Int, checksum: Long,
    width: Int, height: Int)

  /** STUB decoder — deterministic fake in place of a real image/audio
    * codec. A production build swaps the body for e.g. a JPEG decode;
    * the signature (bytes → typed metadata) and the call site (inside
    * mapPartitions, after per-partition init) stay identical.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Long, Int, Int) = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < math.min(4, n)) { sum += bytes(i) & 0xFF; i += 1 }
    (n, sum, n % 640, n % 480)
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_meta" -> { (s, d) =>
      val sp = s
      import sp.implicits._
      // documents.text stands in for the binary payload (UTF-8 bytes of
      // ASCII text → n_bytes == n_chars, keeping the oracle exact).
      documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[Blob]
        .mapPartitions { blobs =>
          // per-partition init of the (stubbed) decoder would go here
          blobs.map { b =>
            val (n, sum, w, h) = fakeDecode(b.payload)
            Frame(b.doc_id, n, sum, w, h)
          }
        }
        .toDF()
        .orderBy("doc_id")
    },

    "mm_resize" -> { (s, d) =>
      // "Resize" stub: stride-sample the payload down to a fixed
      // 16-byte thumbnail (the real op would be a pixel resample; the
      // batch shape — fixed-size output per variable-size blob — is what
      // the pipeline plumbing cares about).
      val sp = s
      import sp.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[Blob]
        .mapPartitions { blobs =>
          blobs.map { b =>
            val n = b.payload.length
            // Empty payloads (none in this corpus, but any real blob
            // column has them) get an all-zero thumbnail instead of an
            // out-of-bounds stride read.
            if (n == 0) (b.doc_id, 0, 0L, 0)
            else {
              val thumb = (0 until 16).map(i => b.payload(i * n / 16) & 0xFF)
              (b.doc_id, n, thumb.sum.toLong, thumb.max)
            }
          }
        }
        .toDF("doc_id", "n_bytes", "thumb_sum", "thumb_max")
        .orderBy("doc_id")
    },

    "mm_feature_extract" -> { (s, d) =>
      // "Feature extraction" stub: 8-bin byte-value histogram per blob —
      // the fixed-length-vector-per-blob shape of a real embedding step.
      val sp = s
      import sp.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[Blob]
        .mapPartitions { blobs =>
          blobs.map { b =>
            val hist = new Array[Long](8)
            b.payload.foreach(x => hist((x & 0xFF) % 8) += 1)
            // ','-joined string, not a raw array: comparator-safe output.
            (b.doc_id, hist.mkString(","))
          }
        }
        .toDF("doc_id", "byte_hist")
        .orderBy("doc_id")
    },

    "mm_frame_sample" -> { (s, d) =>
      // Frame sampling: pretend each 16-byte window is a frame; sample
      // every 4th. Exercises the explode-to-frames shape (one blob row →
      // many frame rows) that video pipelines need.
      val sp = s
      import sp.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[Blob]
        .flatMap { b =>
          val frames = b.payload.grouped(16).toIndexedSeq
          frames.indices.collect {
            case i if i % 4 == 0 =>
              (b.doc_id, i, frames(i).length,
                frames(i).foldLeft(0L)((a, x) => a + (x & 0xFF)))
          }
        }
        .toDF("doc_id", "frame_idx", "frame_bytes", "frame_sum")
        .orderBy("doc_id", "frame_idx")
    },

    "mm_phash_dedup" -> { (s, d) =>
      // Perceptual-hash near-dup detection — the image-dedup pipeline:
      // decode → 32-bit pHash in the batched per-partition step (a real
      // build swaps the stride-thumbnail stub for DCT-of-downscale; the
      // bytes→hash signature and call site are identical), then a
      // banded LSH self-join finds pairs at Hamming ≤ 2 WITHOUT an
      // all-pairs compare. Banding is provably lossless here: 2 bit
      // errors can corrupt at most 2 of the 4 8-bit bands, so every
      // qualifying pair shares an intact band — which is why the
      // brute-force oracle hash-matches exactly. Scale shape: the
      // candidate join is an equi-join on (band, value) buckets; the
      // Hamming verify is two integer instructions (xor + popcount)
      // inside codegen.
      val sp = s
      import sp.implicits._
      val hashed = documents(s, d)
        .filter(length(col("text")) >= 32)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[Blob]
        .mapPartitions { blobs =>
          // per-partition decoder init would go here
          blobs.map { b =>
            val n = b.payload.length
            if (n < 32) (b.doc_id, 0L) // defensive; filtered upstream
            else {
              val thumb = Array.tabulate(32)(i => b.payload(i * n / 32) & 0xFF)
              val tsum = thumb.sum
              var h = 0L
              var i = 0
              while (i < 32) { if (thumb(i) * 32 > tsum) h |= 1L << i; i += 1 }
              (b.doc_id, h)
            }
          }
        }
        .toDF("doc_id", "phash")
      val bandArr = array((0 until 4).map(k =>
        shiftright(col("phash"), k * 8).bitwiseAND(lit(255L))): _*)
      val banded = hashed
        .select(col("doc_id"), col("phash"), posexplode(bandArr))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
      banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(first(col("a.phash")).as("ha"), first(col("b.phash")).as("hb"))
        .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
        .filter(col("hamming") <= 2)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy("id_a", "id_b")
    }
  )

  val oracleSql: Map[String, String] = Map(
    // ASCII text ⇒ byte values == codepoints, so the stub decode is
    // SQL-expressible and the plumbing gets a real hash-compare.
    "mm_decode_meta" ->
      """SELECT doc_id, n_bytes, checksum, n_bytes % 640 AS width, n_bytes % 480 AS height
        |FROM (
        |  SELECT doc_id, CAST(length(text) AS INTEGER) AS n_bytes,
        |    CAST(ord(substring(text, 1, 1)) + ord(substring(text, 2, 1))
        |       + ord(substring(text, 3, 1)) + ord(substring(text, 4, 1)) AS BIGINT) AS checksum
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(length(text) AS INTEGER) AS n_bytes,
        |    list_transform(range(16),
        |      i -> ord(substring(text, CAST(i * length(text) // 16 + 1 AS INTEGER), 1))) AS thumb
        |  FROM documents)
        |SELECT doc_id, n_bytes,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(thumb, x -> CAST(x AS BIGINT))), (a, x) -> a + x) AS BIGINT) AS thumb_sum,
        |  CAST(list_aggregate(thumb, 'max') AS INTEGER) AS thumb_max
        |FROM t ORDER BY doc_id""".stripMargin,

    "mm_feature_extract" ->
      """WITH cp AS (
        |  SELECT doc_id, list_transform(string_split_regex(text, ''),
        |    c -> ord(c) % 8) AS bins
        |  FROM documents)
        |SELECT doc_id, array_to_string(list_transform(range(8),
        |  k -> CAST(CAST(len(list_filter(bins, b -> b = k)) AS BIGINT) AS VARCHAR)), ',') AS byte_hist
        |FROM cp ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH idx AS (
        |  SELECT doc_id, text,
        |    unnest(range(CAST(ceil(length(text) / 16.0) AS BIGINT))) AS i
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |    substring(text, CAST(i * 16 + 1 AS INTEGER), 16) AS frame
        |  FROM idx)
        |SELECT doc_id, frame_idx,
        |  CAST(length(frame) AS INTEGER) AS frame_bytes,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split_regex(frame, ''), c -> CAST(ord(c) AS BIGINT))),
        |    (a, x) -> a + x) AS BIGINT) AS frame_sum
        |FROM frames WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Brute-force truth: banding is lossless at Hamming ≤ 2 (see the
    // query comment), so the unbanded all-pairs compare must match.
    "mm_phash_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, list_transform(range(32),
        |    i -> ord(substring(text, CAST(i * length(text) // 32 + 1 AS INTEGER), 1))) AS thumb
        |  FROM documents WHERE length(text) >= 32),
        |s AS (SELECT doc_id, thumb,
        |  CAST(list_reduce(list_prepend(0, thumb), (a, x) -> a + x) AS BIGINT) AS tsum
        |  FROM t),
        |h AS (SELECT doc_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(32), i ->
        |      CASE WHEN thumb[CAST(i + 1 AS INTEGER)] * 32 > tsum
        |        THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
        |        ELSE CAST(0 AS BIGINT) END)),
        |    (a, x) -> a + x) AS BIGINT) AS phash
        |  FROM s)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 2
        |ORDER BY id_a, id_b""".stripMargin
  )
}
