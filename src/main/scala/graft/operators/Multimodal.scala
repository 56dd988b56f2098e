package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.sql
import graft.cv.PlayerIdent.{Image, StubDecoder}

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns + typed metadata structs, with decode / feature-extract /
  * resize / frame-sample as batch-shaped partition transforms.
  *
  * The Spark-side plumbing — schema, partition batching, column shapes — is
  * real and tested; the codec inner step is STUBBED (deterministic fake
  * decode, clearly marked) because no image/audio library exists in this
  * zero-egress container. A production deployment swaps `StubDecoder` for a
  * JNI/javax.imageio decoder without touching any plan shape.
  *
  * Scale notes: every op is a narrow map (no shuffle); `mapPartitions`
  * amortizes per-batch setup (model/codec init) exactly like Python's
  * mapInPandas batches would — the idiomatic Scala equivalent.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nBytes: Long, format: String)
  final case class MediaRow(id: Long, content: Array[Byte])
  final case class MetaOut(id: Long, width: Int, height: Int, nBytes: Long, format: String)
  final case class FeatureOut(id: Long, dim: Int, features: Array[Float])
  final case class FrameOut(id: Long, frameIdx: Int, frame: Array[Byte])
  final case class MetaFeatOut(id: Long, width: Int, height: Int, nBytes: Long,
      format: String, dim: Int, features: Array[Float])

  /** Decoded-image metadata row (shared by the standalone and fused passes
    * — the format literal and null-content byte count live in ONE place, so
    * swapping the stub codec for a real one can't desynchronize them). */
  private def metaOf(id: Long, img: Image, content: Array[Byte]): MetaOut =
    MetaOut(id, img.w, img.h,
      if (content == null) 0L else content.length.toLong, "stub-rgb")

  /** Mean-pooled pixel statistics → fixed-dim embedding (the deterministic
    * stub feature map; shared by the standalone and fused passes). */
  private def featuresOf(img: Image, dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < img.pixels.length) {
      f(i % dim) += (img.pixels(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { f(j) /= (img.pixels.length / dim.toFloat); j += 1 }
    f
  }

  /** Decode + metadata extraction, batched per partition (codec init happens
    * once per partition, not per row — the mapInPandas batch-shape). */
  def imageMeta(media: Dataset[MediaRow]): Dataset[MetaOut] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = StubDecoder // per-partition codec init seam
      rows.flatMap { r =>
        decoder.decode(r.content).map(img => metaOf(r.id, img, r.content))
      }
    }
  }

  /** Feature extraction: binary → fixed-dim float embedding. The embedding
    * math is a deterministic stub (mean-pooled pixel statistics); the
    * output column shape (`array<float>` of fixed dim) is the real contract
    * feeding the Similarity operators. */
  def imageFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureOut] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = StubDecoder
      rows.flatMap { r =>
        decoder.decode(r.content).map(img => FeatureOut(r.id, dim, featuresOf(img, dim)))
      }
    }
  }

  /** Fused metadata + features in ONE decode pass: with a real codec the
    * decode dominates, so running `imageMeta` and `imageFeatures` as two
    * passes over the same payloads (then joining) doubles the dominant cost
    * AND adds a shuffle — the fused partition map does neither. */
  def imageMetaFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MetaFeatOut] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = StubDecoder // per-partition codec init seam
      rows.flatMap { r =>
        decoder.decode(r.content).map { img =>
          val m = metaOf(r.id, img, r.content)
          MetaFeatOut(m.id, m.width, m.height, m.nBytes, m.format,
            dim, featuresOf(img, dim))
        }
      }
    }
  }

  /** Resize: real box-filter downsample over the (stub-)decoded pixels —
    * the pixel math is genuine; only the byte→pixel codec is the stub. */
  def resize(img: Image, ow: Int, oh: Int): Image = {
    val out = new Array[Int](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        val x0 = ox * img.w / ow; val x1 = math.max(x0 + 1, (ox + 1) * img.w / ow)
        val y0 = oy * img.h / oh; val y1 = math.max(y0 + 1, (oy + 1) * img.h / oh)
        var r = 0L; var g = 0L; var b = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.pixels(y * img.w + x)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff; n += 1
            x += 1
          }
          y += 1
        }
        out(oy * ow + ox) = (((r / n).toInt & 0xff) << 16) | (((g / n).toInt & 0xff) << 8) | ((b / n).toInt & 0xff)
        ox += 1
      }
      oy += 1
    }
    Image(ow, oh, out)
  }

  /** Frame sampling: treat the binary as an n-frame container and emit k
    * evenly-spaced frames (video decode is the stub seam; the explode
    * shape — one row in, k rows out — is the real plumbing). */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 3): Dataset[FrameOut] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.content == null || r.content.isEmpty) Iterator.empty
      else {
        val n = math.max(1, r.content.length / 16) // stub: 16 bytes / "frame"
        (0 until k).iterator.map { i =>
          val idx = (i.toLong * n / k).toInt
          val from = idx * 16
          FrameOut(r.id, idx, r.content.slice(from, math.min(from + 16, r.content.length)))
        }
      }
    }
  }

  // ---- DuckDB replay of the stub decode ------------------------------
  // The "decode is not SQL-expressible" claim was only true of a REAL
  // codec; StubDecoder is splitmix64 over the payload bytes, and splitmix
  // replays exactly in DuckDB with wrapping-u64 arithmetic — so the whole
  // decode → pixel-math family is oracle-checked, not rows-only.

  /** Wrapping u64 multiply in DuckDB SQL. HUGEINT is int128, so a full
    * 64×64-bit product overflows — split both operands into 32-bit halves
    * (low64(a·b) = a_lo·b_lo + ((a_lo·b_hi + a_hi·b_lo) mod 2³²)·2³²);
    * every intermediate stays under 2⁹⁷. Inlined (no CREATE MACRO — the
    * driver runs each oracle as ONE statement). */
  private[operators] def mm64(a: String, b: String): String =
    s"((($a % 4294967296) * ($b % 4294967296) + " +
      s"((($a % 4294967296) * ($b // 4294967296) + " +
      s"($a // 4294967296) * ($b % 4294967296)) % 4294967296) * 4294967296) " +
      "% 18446744073709551616::HUGEINT)"

  private[operators] val U64 = "18446744073709551616::HUGEINT"
  private[operators] val SmG = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
  private[operators] val SmM1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
  private[operators] val SmM2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb

  /** CTE chain `s` → `p(id, i, px)` replaying [[StubDecoder]] in DuckDB:
    * the seed fold over payload bytes is a sequential `list_reduce` over
    * ASCII code points (the corpus is pure ASCII, so byte ≡ char — the
    * `mm_frame_sample` precondition); the per-pixel seed is CLOSED-FORM
    * (seed₀ + (i+1)·G mod 2⁶⁴ — the decoder's `seed += G` unrolled), so
    * pixels at any stride replay without sequential state. `step` picks
    * every step-th pixel (1 = all 4096; 16 = the f0 feature lane). */
  private[operators] def stubPixelsSqlCte(step: Int): String =
    s"""s AS (
       |  SELECT doc_id AS id,
       |         list_reduce(
       |           list_prepend($SmG,
       |             [CAST(ascii(substr(text, i, 1)) AS HUGEINT)
       |              for i in range(1, strlen(text) + 1)]),
       |           (acc, b) -> ${mm64("xor(acc, b)", SmM1)}) AS seed0
       |  FROM documents WHERE strlen(text) > 0),
       |p AS (
       |  SELECT id, i, xor(z2, z2 // 2147483648) % 16777216 AS px
       |  FROM (SELECT id, i, ${mm64("xor(z1, z1 // 134217728)", SmM2)} AS z2
       |        FROM (SELECT id, i, ${mm64("xor(s1, s1 // 1073741824)", SmM1)} AS z1
       |              FROM (SELECT id, unnest(range(0, 4096, $step)) AS i,
       |                           (seed0 + (unnest(range(0, 4096, $step)) + 1) * $SmG)
       |                             % $U64 AS s1
       |                    FROM s) a) b) c)""".stripMargin

  /** Declared query: metadata + the first feature dim for every document
    * payload, ORACLE-CHECKED — the stub decode replays in DuckDB (CTEs
    * above) and the float32 accumulator replays bit-exactly: every step
    * is CAST(... AS FLOAT), and double-compute-then-cast-to-float32 is
    * IEEE-identical to native float32 for +, ×, / (the 2p+2 theorem:
    * 53 ≥ 2·24+2), so `f0` ships RAW, no rounding tolerance needed.
    * One fused decode pass per payload; no join on the Spark side. */
  val mmImageFeatures = sql(
    "mm_image_features",
    s"""WITH ${stubPixelsSqlCte(16)},
       |acc AS (
       |  SELECT id,
       |         list_reduce(
       |           list_prepend(CAST(0 AS FLOAT),
       |             list(CAST(CAST(CAST(px % 256 AS BIGINT) AS FLOAT)
       |                       / CAST(255.0 AS FLOAT) AS FLOAT) ORDER BY i)),
       |           (a, v) -> CAST(a + v AS FLOAT)) AS fs
       |  FROM p GROUP BY id)
       |SELECT d.doc_id AS id, 64 AS width, 64 AS height,
       |       CAST(strlen(d.text) AS BIGINT) AS "nBytes",
       |       'stub-rgb' AS format, 16 AS dim,
       |       CAST(fs / CAST(256.0 AS FLOAT) AS FLOAT) AS f0
       |FROM documents d JOIN acc ON acc.id = d.doc_id
       |ORDER BY id""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
    imageMetaFeatures(media).toDF()
      .select(col("id"), col("width"), col("height"), col("nBytes"),
        col("format"), col("dim"),
        element_at(col("features"), 1).as("f0"))
      .orderBy("id")
  }

  /** Resize as a declared query, ORACLE-CHECKED: decode → 8×8 box-filter
    * downsample → exact integer channel sums. DuckDB replays the decode
    * via the splitmix CTEs and the box filter as pure integer block
    * sums/divisions (64/8 divides evenly, so each output pixel is an 8×8
    * block mean with n = 64). One fused decode + resize pass per payload;
    * narrow map, no shuffle. */
  val mmImageResize = sql(
    "mm_image_resize",
    s"""WITH ${stubPixelsSqlCte(1)},
       |blk AS (
       |  SELECT id, ((i // 64) // 8) * 8 + ((i % 64) // 8) AS b,
       |         sum(px // 65536) AS br, sum((px // 256) % 256) AS bg,
       |         sum(px % 256) AS bb
       |  FROM p GROUP BY id, b)
       |SELECT id, 8 AS w, 8 AS h,
       |       CAST(sum(br // 64) AS BIGINT) AS sum_r,
       |       CAST(sum(bg // 64) AS BIGINT) AS sum_g,
       |       CAST(sum(bb // 64) AS BIGINT) AS sum_b
       |FROM blk GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      val decoder = StubDecoder // per-partition codec init seam
      rows.flatMap { r =>
        decoder.decode(r.content).map { img =>
          val out = resize(img, 8, 8)
          var rs = 0L; var gs = 0L; var bs = 0L
          out.pixels.foreach { p =>
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
          }
          (r.id, out.w, out.h, rs, gs, bs)
        }
      }
    }.toDF("id", "w", "h", "sum_r", "sum_g", "sum_b").orderBy("id")
  }

  /** Frame sampling as an oracle-checked query: `sampleFrames`' offset
    * arithmetic (n = max(1, bytes/16) stub frames, k = 3 evenly spaced,
    * idx = i·n/k, 16-byte slice at idx·16) replayed in DuckDB via substr;
    * empty payloads emit no frames on either side.
    * The documents corpus is pure ASCII (verified: strlen = length at every
    * sf), so byte offsets and character offsets coincide and the sliced
    * frame compares as a string. Narrow flatMap — no shuffle. */
  val mmFrameSample = sql(
    "mm_frame_sample",
    """WITH f AS (SELECT doc_id AS id, text,
      |                  greatest(1, strlen(text) // 16) AS n
      |           FROM documents
      |           WHERE strlen(text) > 0),
      |idx AS (SELECT id, text, CAST(i * n // 3 AS INT) AS frame_idx
      |        FROM f CROSS JOIN (SELECT unnest([0, 1, 2]) AS i))
      |SELECT id, frame_idx,
      |       substr(text, frame_idx * 16 + 1, 16) AS frame
      |FROM idx ORDER BY id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
    sampleFrames(media, k = 3).toDF()
      .select(col("id"), col("frameIdx").as("frame_idx"),
        col("frame").cast("string").as("frame"))
      .orderBy("id", "frame_idx")
  }

  /** Codec-independent media metadata over the binary column — byte size,
    * content hash, magic-prefix sniff, and the stub-container frame count
    * (= sampleFrames' n). Unlike the decode path this IS SQL-expressible,
    * so the multimodal family gets an oracle-checked member: Spark md5
    * over the UTF-8 bytes ≡ DuckDB md5 over the VARCHAR's bytes. All
    * narrow column ops — no UDF, stays in whole-stage codegen. */
  val mmMediaMeta = sql(
    "mm_media_meta",
    """SELECT doc_id AS id,
      |       CAST(strlen(text) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_md5,
      |       substr(text, 1, 4) AS magic,
      |       CAST(greatest(1, strlen(text) // 16) AS BIGINT) AS n_frames
      |FROM documents ORDER BY id""".stripMargin) { (s, d) =>
    val nBytes = length(col("text").cast("binary")).cast("long")
    Tables.documents(s, d).select(
      col("doc_id").as("id"),
      nBytes.as("n_bytes"),
      md5(col("text").cast("binary")).as("content_md5"),
      substring(col("text"), 1, 4).as("magic"),
      greatest(lit(1L), floor(nBytes / 16).cast("long")).as("n_frames"))
      .orderBy("id")
  }

  /** Audio-shaped feature extraction, oracle-checked: treat the payload as
    * PCM-ish samples (one byte per sample — the codec stub), frame it with
    * the same evenly-spaced 16-byte windows as `sampleFrames`, and emit
    * each frame's exact integer ENERGY Σ(sample−96)² — the per-frame
    * energy/loudness contour every audio pipeline starts from (silence
    * trimming, VAD, segment ranking). All integer arithmetic over ASCII
    * code points, so DuckDB replays it exactly; narrow map, no shuffle. */
  val mmAudioEnergy = sql(
    "mm_audio_energy",
    """WITH f AS (SELECT doc_id AS id, text,
      |                  greatest(1, strlen(text) // 16) AS n
      |           FROM documents
      |           WHERE strlen(text) > 0),
      |idx AS (SELECT id, text, CAST(i * n // 3 AS INT) AS frame_idx
      |        FROM f CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)),
      |fr AS (SELECT id, frame_idx,
      |              substr(text, frame_idx * 16 + 1, 16) AS frame
      |       FROM idx)
      |SELECT id, frame_idx,
      |       CAST(list_sum([(ascii(substr(frame, i, 1)) - 96)
      |                      * (ascii(substr(frame, i, 1)) - 96)
      |                      for i in range(1, strlen(frame) + 1)]) AS BIGINT) AS energy
      |FROM fr ORDER BY id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
    sampleFrames(media, k = 3).toDF()
      .select(col("id"), col("frameIdx").as("frame_idx"),
        col("frame").cast("string").as("f"))
      .select(col("id"), col("frame_idx"),
        expr("""aggregate(
                 transform(sequence(1, length(f)),
                   i -> CAST((ascii(substr(f, i, 1)) - 96)
                             * (ascii(substr(f, i, 1)) - 96) AS BIGINT)),
                 0L, (a, v) -> a + v)""").as("energy"))
      .orderBy("id", "frame_idx")
  }

  /** FRAME-FINGERPRINT media near-dup — the video/audio counterpart of
    * text MinHash: two media items are near-dup candidates when ≥2 of
    * their 3 evenly-sampled frames hash identically (re-encoded or
    * trimmed copies keep most frames byte-identical under the stub codec;
    * a real deployment hashes perceptual frame features from the same
    * seam). Same inverted-index discipline as the shingle family: frame
    * hashes with document frequency >50 are boilerplate (silence/black
    * frames at scale — the quadratic-bucket hazard) and leave the
    * universe BEFORE the self-join, so pairs stay linear in the duplicate
    * volume; the md5 travels as an equality key only. */
  val mmFrameNeardup = sql(
    "mm_frame_neardup",
    """WITH f AS (SELECT doc_id AS id, text,
      |                  greatest(1, strlen(text) // 16) AS n
      |           FROM documents WHERE strlen(text) > 0),
      |idx AS (SELECT id, text, CAST(i * n // 3 AS INT) AS frame_idx
      |        FROM f CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)),
      |fr AS (SELECT DISTINCT id, md5(substr(text, frame_idx * 16 + 1, 16)) AS fh
      |       FROM idx),
      |df AS (SELECT fh, count(*) AS c FROM fr GROUP BY fh),
      |frc AS (SELECT fr.id, fr.fh FROM fr JOIN df USING (fh) WHERE df.c <= 50),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |             CAST(count(*) AS BIGINT) AS n_shared
      |      FROM frc a JOIN frc b ON a.fh = b.fh AND a.id < b.id
      |      GROUP BY 1, 2)
      |SELECT id_a, id_b, n_shared FROM p
      |WHERE n_shared >= 2 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val media = Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
      .as(org.apache.spark.sql.Encoders.product[MediaRow])
    val fr = sampleFrames(media, k = 3).toDF()
      .select(col("id"), md5(col("frame")).as("fh"))
      .distinct()
      .cache() // df-cap fit + both self-join sides read it
    val hot = fr.groupBy("fh").agg(count(lit(1)).as("c"))
      .filter(col("c") > 50).select("fh")
    val frc = fr.join(hot, Seq("fh"), "left_anti")
    frc.select(col("fh"), col("id").as("id_a"))
      .join(frc.select(col("fh"), col("id").as("id_b")), "fh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy("id_a", "id_b")
  }

  /** SCENE-CUT detection — the shot-boundary pass every video curation
    * pipeline runs before frame dedup/captioning: per media item, the
    * full frame-energy contour (every 16-byte stub frame, same exact
    * integer Σ(sample−96)² as `mm_audio_energy`), a CUT wherever the
    * energy jumps by more than 4500 between consecutive frames (≈ the
    * top-30% jump on this corpus), and the resulting segment profile
    * (n_cuts, longest segment) via gaps-and-islands on the running cut
    * count. All integer arithmetic — engine-exact, no tolerance.
    *
    * Scale shape: the contour is a narrow per-payload flatMap (no
    * shuffle); the lag/cut/segment windows are all partitioned by media
    * id — bounded by one item's frame count, never corpus-sized; the
    * roll-up is partial-aggregable. A 100 TB video corpus streams
    * through one pass per item. */
  val mmSceneCut = sql(
    "mm_scene_cut",
    """WITH f AS (SELECT doc_id AS id, text,
      |                  greatest(1, strlen(text) // 16) AS n
      |           FROM documents WHERE strlen(text) > 0),
      |fr AS (SELECT id, CAST(unnest(range(0, n)) AS INT) AS fi, text FROM f),
      |en AS (SELECT id, fi,
      |              CAST(list_sum([0] || [(ascii(substr(fx, i, 1)) - 96)
      |                             * (ascii(substr(fx, i, 1)) - 96)
      |                             for i in range(1, strlen(fx) + 1)]) AS BIGINT)
      |                AS energy
      |       FROM (SELECT id, fi, substr(text, fi * 16 + 1, 16) AS fx FROM fr)),
      |cu AS (SELECT id, fi, energy,
      |              CASE WHEN abs(energy - lag(energy)
      |                     OVER (PARTITION BY id ORDER BY fi)) > 4500
      |                   THEN 1 ELSE 0 END AS cut
      |       FROM en),
      |seg AS (SELECT id, sum(cut) OVER (PARTITION BY id ORDER BY fi
      |                                  ROWS UNBOUNDED PRECEDING) AS seg_id
      |        FROM cu),
      |sl AS (SELECT id, seg_id, count(*) AS seg_len FROM seg GROUP BY id, seg_id)
      |SELECT id, CAST(count(*) AS BIGINT) AS n_segments,
      |       CAST(count(*) - 1 AS BIGINT) AS n_cuts,
      |       CAST(max(seg_len) AS BIGINT) AS max_seg_len,
      |       CAST(sum(seg_len) AS BIGINT) AS n_frames
      |FROM sl GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val en = frameEnergies(s, d)
    val wId = Window.partitionBy("id").orderBy("fi")
    val cut = when(
      abs(col("energy") - lag("energy", 1).over(wId)) > 4500, 1L).otherwise(0L)
    val sl = en.withColumn("cut", cut)
      .withColumn("seg_id",
        sum("cut").over(wId.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("id", "seg_id").agg(count(lit(1)).as("seg_len"))
    sl.groupBy("id")
      .agg(count(lit(1)).as("n_segments"),
        (count(lit(1)) - 1).as("n_cuts"),
        max("seg_len").as("max_seg_len"),
        sum("seg_len").as("n_frames"))
      .orderBy("id")
  }

  /** FRAME NOVELTY — the video counterpart of `text_novelty`'s trigram
    * diminishing-returns curve: per media item, the share of its DISTINCT
    * frame fingerprints whose corpus-first occurrence (min media id) is
    * this item. A re-encode or trimmed copy of earlier footage scores ~0;
    * fresh footage ~1 — the keep/drop signal for incremental video
    * ingestion, and the storage-savings estimate for frame-level dedup.
    *
    * Scale shape: full frame explode (narrow), distinct per (id, hash),
    * min(id) per hash (partial-aggregable — the billion-copy black frame
    * collapses map-side), one hash-keyed equi-join back, per-item count
    * roll-up. No pair join, no window — linear in total frames. */
  val mmFrameNovelty = sql(
    "mm_frame_novelty",
    """WITH f AS (SELECT doc_id AS id, text,
      |                  greatest(1, strlen(text) // 16) AS n
      |           FROM documents WHERE strlen(text) > 0),
      |fr AS (SELECT DISTINCT id,
      |              md5(substr(text, CAST(unnest(range(0, n)) * 16 + 1 AS INT), 16)) AS fh
      |       FROM f),
      |fst AS (SELECT fh, min(id) AS first_id FROM fr GROUP BY fh)
      |SELECT fr.id,
      |       CAST(count(*) AS BIGINT) AS n_distinct_frames,
      |       CAST(sum(CASE WHEN fst.first_id = fr.id THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_novel,
      |       round(sum(CASE WHEN fst.first_id = fr.id THEN 1 ELSE 0 END) * 1.0
      |             / count(*), 4) AS novelty
      |FROM fr JOIN fst USING (fh)
      |GROUP BY fr.id ORDER BY fr.id""".stripMargin) { (s, d) =>
    val fr = Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id").as("id"),
        explode(expr(
          """transform(sequence(0, greatest(1, length(text) div 16) - 1),
            |  f -> md5(substr(text, f * 16 + 1, 16)))""".stripMargin)).as("fh"))
      .distinct()
      .cache() // first-occurrence fit + join probe both read it
    val fst = fr.groupBy("fh").agg(min("id").as("first_id"))
    val novel = when(col("first_id") === col("id"), 1L).otherwise(0L)
    fr.join(fst, "fh")
      .groupBy("id")
      .agg(count(lit(1)).as("n_distinct_frames"), sum(novel).as("n_novel"),
        round(sum(novel) * lit(1.0) / count(lit(1)), 4).as("novelty"))
      .orderBy("id")
  }

  /** Shared full-contour frame energies: (id, fi, energy) for EVERY
    * 16-byte stub frame — the frame string materializes ONCE per row
    * before the energy fold (the inlined form recomputed the substr per
    * character: measured 2× slower at sf0.1). One narrow explode+map,
    * no shuffle; consumed by `mm_scene_cut` and `mm_audio_vad`. */
  private def frameEnergies(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id").as("id"),
        posexplode(expr(
          """transform(sequence(0, greatest(1, length(text) div 16) - 1),
            |  f -> substr(text, f * 16 + 1, 16))""".stripMargin))
          .as(Seq("fi", "fx")))
      .select(col("id"), col("fi"),
        expr("""aggregate(
                 transform(sequence(1, length(fx)),
                   i -> CAST((ascii(substr(fx, i, 1)) - 96)
                             * (ascii(substr(fx, i, 1)) - 96) AS BIGINT)),
                 0L, (a, v) -> a + v)""").as("energy"))

  /** VOICE-ACTIVITY segmentation — the silence-trimming pass audio
    * curation runs before transcription: per item, frames with energy
    * below 12000 (≈ the corpus p15 — the silence floor under the stub
    * codec) are unvoiced; voiced frames coalesce into segments via
    * gaps-and-islands (fi − row-number-over-voiced is constant within a
    * run), and the report carries the voiced ratio and longest voiced
    * run — what decides whether an item is speech, noise, or dead air.
    * Exact integer energies — engine-exact.
    *
    * Scale shape: same narrow energy contour as `mm_scene_cut`, windows
    * partitioned by media id (bounded per item), one roll-up. No join. */
  val mmAudioVad = sql(
    "mm_audio_vad",
    """WITH f AS (SELECT doc_id AS id, text,
      |                  greatest(1, strlen(text) // 16) AS n
      |           FROM documents WHERE strlen(text) > 0),
      |fr AS (SELECT id, CAST(unnest(range(0, n)) AS INT) AS fi, text FROM f),
      |en AS (SELECT id, fi,
      |              CAST(list_sum([0] || [(ascii(substr(fx, i, 1)) - 96)
      |                             * (ascii(substr(fx, i, 1)) - 96)
      |                             for i in range(1, strlen(fx) + 1)]) AS BIGINT)
      |                AS energy
      |       FROM (SELECT id, fi, substr(text, fi * 16 + 1, 16) AS fx FROM fr)),
      |v AS (SELECT id, fi FROM en WHERE energy >= 12000),
      |seg AS (SELECT id, fi - row_number() OVER (PARTITION BY id ORDER BY fi)
      |               AS grp
      |        FROM v),
      |sl AS (SELECT id, grp, count(*) AS run_len FROM seg GROUP BY id, grp),
      |vs AS (SELECT id, CAST(count(*) AS BIGINT) AS n_segments,
      |              CAST(max(run_len) AS BIGINT) AS max_voiced_run,
      |              CAST(sum(run_len) AS BIGINT) AS n_voiced
      |       FROM sl GROUP BY id),
      |nf AS (SELECT id, CAST(count(*) AS BIGINT) AS n_frames FROM en GROUP BY id)
      |SELECT nf.id, nf.n_frames,
      |       coalesce(vs.n_voiced, 0) AS n_voiced,
      |       coalesce(vs.n_segments, 0) AS n_segments,
      |       coalesce(vs.max_voiced_run, 0) AS max_voiced_run,
      |       round(coalesce(vs.n_voiced, 0) * 1.0 / nf.n_frames, 4) AS voiced_ratio
      |FROM nf LEFT JOIN vs ON nf.id = vs.id
      |ORDER BY nf.id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // cached: the voiced-segment chain and the per-item frame count both
    // read the contour — un-cached, the per-character energy fold (the
    // chain's dominant CPU) ran twice (r13, §2.4)
    val en = frameEnergies(s, d).cache()
    val wId = Window.partitionBy("id").orderBy("fi")
    val sl = en.filter(col("energy") >= 12000L)
      .withColumn("grp", col("fi") - row_number().over(wId))
      .groupBy("id", "grp").agg(count(lit(1)).as("run_len"))
    val vs = sl.groupBy("id")
      .agg(count(lit(1)).as("n_segments"), max("run_len").as("max_voiced_run"),
        sum("run_len").as("n_voiced"))
    val nf = en.groupBy("id").agg(count(lit(1)).as("n_frames"))
    nf.join(vs, Seq("id"), "left")
      .select(col("id"), col("n_frames"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_voiced_run"), lit(0L)).as("max_voiced_run"),
        round(coalesce(col("n_voiced"), lit(0L)) * lit(1.0) / col("n_frames"), 4)
          .as("voiced_ratio"))
      .orderBy("id")
  }

  val defs: Seq[QueryDef] = Seq(
    mmImageFeatures, mmMediaMeta, mmFrameSample, mmImageResize, mmAudioEnergy,
    mmFrameNeardup, mmSceneCut, mmFrameNovelty, mmAudioVad)
}
