package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    "mm_exact_dedup" -> { (s, d) =>
      // Byte-exact media dedup — the first pass of every image/video
      // pipeline (identical files are the bulk of web-crawl dup mass;
      // phash only earns its cost on the remainder). Digest the BINARY
      // blob column (stub: text bytes, the contract's fake-decode rule),
      // hash-groupBy on the 16-byte digest — one fingerprint-sized
      // shuffle regardless of blob sizes, same scale shape as
      // dedup_exact. The corpus has no duplicate blobs, so plant copies
      // of every doc_id%20 blob under new ids (self-union precedent)
      // and emit the duplicate groups: digest, copy count, lowest-id
      // survivor — every planted group must surface with exactly 2
      // members.
      val base = documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
      // Planted ids at doc_id + 1e12 with the phash variant's fold-in
      // collision guard: a 1M+-doc corpus would have collided with the
      // original unguarded 1e6 offset, silently merging groups in BOTH
      // engines (the oracle replicates the construction, so the hash
      // gate could never see it).
      val planted = base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000000000L +
          coalesce(assert_true(col("doc_id") < 1000000000000L,
            lit("mm_exact_dedup: base doc_id >= 1e12 collides with the " +
              "planted-id offset — regenerate or raise the offset"))
            .cast(LongType), lit(0L))).as("doc_id"), col("blob"))
      base.unionByName(planted)
        .groupBy(md5(col("blob")).as("digest"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("survivor_id"),
          max(col("doc_id")).as("dup_id"))
        .filter(col("n_copies") > 1)
        .orderBy("digest")
    },

    "mm_phash_dedup" -> { (s, d) =>
      // Perceptual-hash near-dup detection — how image dedup actually
      // runs at scale: encoder embedding → binarize to a sign-bit
      // sketch (sign-random-projection hashing) → banded Hamming LSH.
      // The binarize step sits in the batched mapPartitions (a real
      // build decodes + embeds there; the vector→hash call site is
      // identical). Banding is provably lossless at the Hamming ≤ 3
      // gate: 3 bit errors corrupt at most 3 of the 4 15-bit bands, so
      // every qualifying pair shares an intact band — which is why the
      // brute-force all-pairs oracle hash-matches exactly. Band width
      // is the scale lever: an earlier 4×8-bit cut (256-value buckets)
      // went quadratic on clustered inputs at the 4× tier (99 s);
      // 32 768-value buckets keep the candidate join selective. (60
      // bits, not 64: DuckDB's BIGINT shift overflows at 1<<63.) The
      // corpus has no sign-near vectors (min pairwise sketch distance
      // 14, measured), so — dedup_exact's self-union precedent — the
      // query plants one near-dup per vec_id%10 vector by negating
      // dims 3 and 7, which flips EXACTLY those sign bits: planted
      // pairs sit at Hamming ≤ 2 by construction, and the operator
      // demonstrably recovers every one of them.
      val sp = s
      import sp.implicits._
      // Planted ids live at vec_id + 1e12 — far above ScaleGen's
      // copy-offset id space (stride 1e8/copy puts tier ids in the low
      // 1e9s; the original 1e9 offset ABORTED every tier k >= 11 via
      // this very guard). Collision guard: a colliding base id would
      // equal base'+1e12 with base'%10==0, i.e. be >=1e12 and %10==0
      // itself — exactly a row of THIS filtered branch, so asserting
      // the contract here catches every possible collision. The assert
      // is folded into the projected value (coalesce of the
      // always-null assert_true) so pruning can't drop it.
      val base = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000000000L +
          coalesce(assert_true(col("vec_id") < 1000000000000L,
            lit("mm_phash_dedup: base vec_id >= 1e12 collides with the " +
              "planted-id offset — regenerate or raise the offset"))
            .cast(LongType), lit(0L))).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 3 || i === 7, -x).otherwise(x)).as("embedding"))
      val hashed = base.unionByName(planted)
        .as[(Long, Array[Float])]
        .mapPartitions { vecs =>
          // per-partition decoder/encoder init would go here
          vecs.map { case (id, v) =>
            require(v.length >= 60,
              s"mm_phash_dedup needs >=60 embedding dims, got ${v.length} " +
                s"(vec_id=$id) — testdata generation changed shape?")
            var h = 0L
            var i = 0
            while (i < 60) { if (v(i) > 0f) h |= 1L << i; i += 1 }
            (id, h)
          }
        }
        .toDF("vec_id", "phash")
      val bandArr = array((0 until 4).map(k =>
        shiftright(col("phash"), k * 15).bitwiseAND(lit(32767L))): _*)
      val banded = hashed
        .select(col("vec_id"), col("phash"), posexplode(bandArr))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
      banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .agg(first(col("a.phash")).as("ha"), first(col("b.phash")).as("hb"))
        .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy("id_a", "id_b")
    },

    "mm_shard_pack" -> { (s, d) =>
      // WebDataset-style shard planning — the packaging step every
      // multimodal estate runs before training: millions of small
      // blobs become ~fixed-size tar shards for sequential reads, and
      // the PLAN is a deterministic blob → shard-index assignment
      // (the byte copy that executes it is fs_compact's shape). A blob
      // lands in shard ⌊bytes-before-it / budget⌋ of its source, in
      // (source, doc_id) order — offset-based sharding, gap-free and
      // rerun-stable. The naive form is a per-source running sum — ONE
      // window partition per source, a straggler when a source is
      // most of the corpus — so this uses the shuffle_global /
      // sample_token_budget two-level decomposition: per-(source,
      // 512-doc bucket) byte subtotals, an exclusive prefix over the
      // per-source BUCKET table (corpus-size/512 rows), and an
      // in-bucket running sum partitioned by (source, bucket); offset
      // + in-bucket prefix is the exact global byte position. All
      // integer arithmetic; n_chars stands for blob length (the
      // container-less mm convention — a real estate sums
      // length(payload)). The oracle is the FLAT per-source window —
      // the hash gate proves the decomposition exact.
      val docs = documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          expr("doc_id DIV 512").as("bkt"))
      val bt = docs.groupBy("source", "bkt")
        .agg(sum(col("n_chars")).as("b_bytes"))
      val wOff = Window.partitionBy("source").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = bt.select(col("source"), col("bkt"),
        coalesce(sum(col("b_bytes")).over(wOff), lit(0L)).as("off"))
      val wIn = Window.partitionBy("source", "bkt").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(off, Seq("source", "bkt"))
        .withColumn("cum_before",
          col("off") + coalesce(sum(col("n_chars")).over(wIn), lit(0L)))
        .groupBy(col("source"), expr("cum_before DIV 65536").as("shard_idx"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("shard_bytes"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "shard_idx")
    },

    "mm_aspect_bucket" -> { (s, d) =>
      // Aspect-ratio bucketing for image-batch formation — the SDXL-
      // style resolution-bucket trick: a training batch must share one
      // shape, so frames are binned to a fixed ratio ladder and the
      // loader schedules ceil(n/32) batches per bucket (images never
      // cross buckets ⇒ no catastrophic crop). Assignment is
      // nearest-ladder-ratio via MIDPOINT thresholds (0.625 / 0.875 /
      // 1.165 / 1.665 between ladder ratios ½, ¾, 1, 4/3, 2) — an
      // explicit CASE, so no argmin tie hazard; degenerate frames
      // (width or height 0 from the stub's modulo) land in an
      // `invalid` bucket instead of dividing by zero. Shape: decode is
      // map-only mapPartitions (per-partition codec init, the contract
      // stub), bucketing map-only, then ONE ≤6-row groupBy — the
      // 100 TB cost is exactly one corpus scan.
      val sp = s
      import sp.implicits._
      val frames = documents(s, d)
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
      val ar = col("width").cast(DoubleType) / col("height")
      val bucket = when(col("height") === 0 || col("width") === 0, "invalid")
        .when(ar < 0.625, "tall_1_2")
        .when(ar < 0.875, "portrait_3_4")
        .when(ar < 1.165, "square_1_1")
        .when(ar < 1.665, "landscape_4_3")
        .otherwise("wide_2_1")
      frames.select(bucket.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_images"))
        .withColumn("n_batches",
          ceil(col("n_images") / lit(32.0)).cast(LongType))
        .orderBy("bucket")
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

    // Same blob-stub rule as the other mm oracles: text bytes ARE the
    // binary content, so DuckDB's md5 over the string hashes the same
    // bytes Spark's md5 hashes over the cast-to-binary column.
    "mm_exact_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000000, text FROM documents WHERE doc_id % 20 = 0)
        |SELECT md5(text) AS digest, count(*) AS n_copies,
        |  min(doc_id) AS survivor_id, max(doc_id) AS dup_id
        |FROM u GROUP BY digest HAVING count(*) > 1
        |ORDER BY digest""".stripMargin,

    // Brute-force truth: banding is lossless at Hamming ≤ 3 (see the
    // query comment), so the unbanded all-pairs compare must match.
    // Sign compares and float negation are exact in both engines.
    "mm_phash_dedup" ->
      """WITH u AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000000000 AS vec_id,
        |    list_transform(range(len(embedding)),
        |      i -> CASE WHEN i = 3 OR i = 7 THEN -embedding[CAST(i + 1 AS INTEGER)]
        |           ELSE embedding[CAST(i + 1 AS INTEGER)] END) AS embedding
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |h AS (SELECT vec_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(60), i ->
        |      CASE WHEN embedding[CAST(i + 1 AS INTEGER)] > 0
        |        THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
        |        ELSE CAST(0 AS BIGINT) END)),
        |    (a, x) -> a + x) AS BIGINT) AS phash
        |  FROM u)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.vec_id < b.vec_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // The FLAT per-source running sum — the Spark side runs the
    // two-level (source, bucket) decomposition; hash match proves it.
    "mm_shard_pack" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM documents)
        |SELECT source, cum_before // 65536 AS shard_idx,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS shard_bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY source, shard_idx""".stripMargin,

    // The stub decode's width/height are n_bytes-derived (ASCII ⇒
    // n_bytes == n_chars), so the ladder CASE is SQL-expressible and
    // the bucket SET gets a real hash-compare.
    "mm_aspect_bucket" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars % 640 AS w, n_chars % 480 AS h
        |  FROM documents),
        |b AS (
        |  SELECT CASE
        |    WHEN h = 0 OR w = 0 THEN 'invalid'
        |    WHEN CAST(w AS DOUBLE) / h < 0.625 THEN 'tall_1_2'
        |    WHEN CAST(w AS DOUBLE) / h < 0.875 THEN 'portrait_3_4'
        |    WHEN CAST(w AS DOUBLE) / h < 1.165 THEN 'square_1_1'
        |    WHEN CAST(w AS DOUBLE) / h < 1.665 THEN 'landscape_4_3'
        |    ELSE 'wide_2_1' END AS bucket
        |  FROM f)
        |SELECT bucket, count(*) AS n_images,
        |  CAST(ceil(count(*) / 32.0) AS BIGINT) AS n_batches
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
