package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (brief §ext): media payloads travel as
  * opaque `binary` columns next to typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch
  * transforms over a typed Dataset (`mapPartitions` — the Scala
  * analogue of `mapInPandas` batch processing: one iterator per
  * partition, no per-row serialization round-trips, executor-local
  * libraries loadable once per partition).
  *
  * The actual codec is STUBBED — this container ships no image/audio
  * libraries — behind `decodeStub`, a deterministic fake that derives
  * "features" from the bytes. Everything around it (schema, typed
  * rows, partition batching, downstream relational ops) is real and
  * tested; swapping `decodeStub` for a JNI/ffmpeg call changes no
  * plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           first_byte: Int, checksum: Long,
                           frame_sample: Array[Byte])

  /** STUB decoder: real decoders would parse the container format
    * here. The fake is deterministic from the payload bytes so tests
    * and oracles can pin it. */
  def decodeStub(payload: Array[Byte]): (Int, Long) = {
    val first = if (payload.nonEmpty) payload(0) & 0xff else -1
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum += (payload(i) & 0xff).toLong * (i + 1); i += 1 }
    (first, checksum % 1000003L)
  }

  /** "Frame sampling": every k-th byte — stands in for keyframe /
    * audio-window extraction, preserving the batch shape. */
  def frameSample(payload: Array[Byte], k: Int): Array[Byte] =
    payload.indices.collect { case i if i % k == 0 => payload(i) }.toArray

  /** Container sniffing from magic bytes — real format detection (no
    * codec needed): PNG/JPEG/GIF/RIFF-WAV, else "unknown". The
    * column form runs inside codegen via a hex-prefix comparison. */
  def sniffKind(payload: Array[Byte]): String = {
    def startsWith(magic: Int*): Boolean =
      payload.length >= magic.length &&
        magic.zipWithIndex.forall { case (m, i) => (payload(i) & 0xff) == m }
    if (startsWith(0x89, 0x50, 0x4e, 0x47)) "image/png"
    else if (startsWith(0xff, 0xd8, 0xff)) "image/jpeg"
    else if (startsWith(0x47, 0x49, 0x46, 0x38)) "image/gif"
    else if (startsWith(0x52, 0x49, 0x46, 0x46)) "audio/wav"
    else "unknown"
  }

  /** Column-expression form of sniffKind. */
  def sniffKindCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hexPrefix = substring(hex(payload), 1, 8)
    when(hexPrefix.startsWith("89504E47"), "image/png")
      .when(hexPrefix.startsWith("FFD8FF"), "image/jpeg")
      .when(hexPrefix.startsWith("47494638"), "image/gif")
      .when(hexPrefix.startsWith("52494646"), "audio/wav")
      .otherwise("unknown")
  }

  /** Container-invariant content signature: md5 over the (lowercased)
    * hex of the payload with its container header stripped — the
    * perceptual-hash SLOT of media dedup, with a deterministic
    * byte-exact stand-in for the codec this container doesn't ship:
    * the same content re-wrapped in a different container (PNG vs
    * JPEG magic) signs identically, so media dedup groups across
    * trivial re-encodes while exact-byte hashing cannot. `headerLen`
    * is data-dependent (derived from the sniffed kind). Hex is
    * lowercased because Spark emits uppercase hex and DuckDB
    * lowercase — the signature domain must be engine-portable.
    * Zero-shuffle projection. */
  def contentSignature(payload: org.apache.spark.sql.Column,
                       headerLen: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(lower(hex(payload.substr(headerLen + 1, length(payload)))))

  /** Partition-batched decode + feature extraction over a typed
    * Dataset. One pass per partition; at 100 TB this is the shape that
    * lets a real codec initialize once per task, not once per row. */
  def extractFeatures(media: Dataset[MediaRow], sampleEvery: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (first, checksum) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, first, checksum,
          frameSample(r.payload, sampleEvery))
      }
    }
  }

  /** Relational twin of `frameSample`: every k-th byte of the payload
    * recovered positionally from its hex encoding (constant-offset
    * slices on an ASCII string — only n/k of them per row, unlike the
    * full byte-split in featureColumns), reduced to a frame count and
    * a deterministic checksum. This is the oracle-checkable face of
    * the mapPartitions frame-sampling path (q_multimodal_frames); the
    * typed `extractFeatures` carries the actual sampled bytes. */
  def frameColumns(df: DataFrame, idCol: String, payloadCol: String,
                   k: Int = 16): DataFrame = {
    val n = octet_length(col(payloadCol))
    val hx = hex(col(payloadCol))
    val sampled = transform(sequence(lit(1), n, lit(k)),
      i => conv(substr(hx, i * 2 - 1, lit(2)), 16, 10).cast("long"))
    df.select(col(idCol),
      when(n > 0, size(sampled)).otherwise(0).cast("long").as("n_frames"),
      when(n > 0, aggregate(sampled, lit(0L), (acc, x) => acc + x) % 1000003L)
        .otherwise(0L).as("frame_checksum"))
  }

  /** Column-only variant of the stub feature extraction — the same
    * semantics expressed relationally (codegen'd, oracle-checkable):
    * used by q_multimodal_meta so the contract is pinned by DuckDB.
    * Bytes are recovered positionally from the hex encoding of the
    * payload (two hex chars per byte). */
  def featureColumns(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val n = octet_length(p)
    val emptyLongs = array().cast("array<bigint>")
    // one regex pass splits the hex string into byte pairs — substr
    // per byte would re-scan the string each time (O(n²) per payload);
    // the trailing empty split piece is filtered out
    val hexPairs = filter(split(hex(p), "(?<=\\G.{2})"), s => length(s) === 2)
    val bytes = when(n > 0,
      transform(hexPairs, h => conv(h, 16, 10).cast("long")))
      .otherwise(emptyLongs)
    val positions = when(n > 0,
      transform(sequence(lit(1), n), i => i.cast("long"))).otherwise(emptyLongs)
    val checksum = aggregate(zip_with(bytes, positions, (b, i) => b * i),
      lit(0L), (acc, x) => acc + x) % lit(1000003L)
    df.select(col(idCol),
      n.as("n_bytes"),
      // element_at on an empty array throws under ANSI mode — guard
      when(n > 0, element_at(bytes, 1)).otherwise(lit(-1L)).as("first_byte"),
      checksum.as("checksum"))
  }

  /** Perceptual 64-bit hash per media row ([[graft.catalyst.Phash64]]):
    * container header stripped (length data-dependent, from the
    * sniffed kind), content folded to an 8×8 grid, integer DCT-II,
    * one bit per AC coefficient vs the median. Re-wraps hash
    * identically; small content perturbations land a few Hamming bits
    * away; unrelated content ~32. Zero-shuffle projection. */
  def phash(df: DataFrame, idCol: String, payloadCol: String,
            headerLen: org.apache.spark.sql.Column): DataFrame = {
    graft.catalyst.Phash64.register(df.sparkSession)
    df.select(col(idCol),
      call_function("phash64", col(payloadCol), headerLen.cast("int"))
        .as("phash"))
  }

  /** Perceptual near-dup PAIRS over [[phash]] codes: the 64-bit hash
    * bands into 8 bytes — two hashes within Hamming distance 7 agree
    * on at least one full byte (pigeonhole), so the banded candidate
    * join has FULL recall at the threshold, same scale shape as the
    * SimHash64 bands: pairing stays bucket-local, never all-pairs,
    * and only 8-byte codes move. Hot buckets (a degenerate hash value
    * shared corpus-wide) are dropped from pairing by the same
    * [[Dedup.boundBlocks]] cap as every other banded path — audit
    * with [[Dedup.oversizeBlocks]] on ("band", "nib"). Exact Hamming
    * on candidates via one XOR+popcount. */
  def phashPairs(hashes: DataFrame, idCol: String, hashCol: String,
                 maxHamming: Int = 7, maxBucket: Int = 256,
                 bandBits: Int = 8): DataFrame = {
    // `bandBits` is the CORPUS-SIZE knob: pigeonhole recall holds to
    // (64/bandBits − 1), and bucket count per band is 2^bandBits —
    // 8-bit bands (recall ≤ 7) saturate 256 buckets as the corpus
    // outgrows ~cap·256 rows; a deployment at larger N moves to
    // 16-bit bands (65 536 buckets, recall ≤ 3), trading Hamming
    // radius for bucket locality. Same trade the SimHash64 path
    // documents.
    require(64 % bandBits == 0 && bandBits >= 8,
      s"bandBits must divide 64 (got $bandBits)")
    val numBands = 64 / bandBits
    val mask = (1L << bandBits) - 1
    require(maxHamming < numBands,
      s"$numBands ${bandBits}-bit bands guarantee recall only to hamming ${numBands - 1}")
    val bands = hashes.select(col(idCol), col(hashCol).as("__h"),
      posexplode(array((0 until numBands).map { k =>
        shiftright(col(hashCol), bandBits * k).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "nib")))
    val bounded = Dedup.boundBlocks(bands, Seq("band", "nib"), maxBucket)
    val a = bounded.select(col(idCol).as("media_a"), col("__h").as("ha"),
      col("band"), col("nib"))
    val b = bounded.select(col(idCol).as("media_b"), col("__h").as("hb"),
      col("band"), col("nib"))
    a.join(b, Seq("band", "nib"))
      .where(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "ha", "hb").distinct()
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
