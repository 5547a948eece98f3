package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column operators — image/audio/video payloads as opaque
  * `binary` columns with typed metadata, the shape a training-data
  * pipeline uses for non-text modalities (extension beyond the
  * reference, which is text-only).
  *
  * Everything here is real, scale-correct Spark plumbing: binary
  * columns flow through scans/joins/shuffles like any other value,
  * the per-row ops are codegen'd built-ins (length / sha2 / substring
  * on BinaryType / hex), and nothing ever collects to the driver.
  * The one thing this container cannot do is run an actual codec —
  * [[stubDecode]] stands in for the image/audio decode step with a
  * DETERMINISTIC STUB (metadata derived from byte length), clearly
  * marked so a real deployment swaps in a decoder UDF/mapInPandas
  * stage with the same signature.
  */
object Multimodal {

  /** Content fingerprint: SHA-256 of the raw bytes, lowercase hex —
    * the standard exact-dedup / provenance key for binary payloads. */
  def sha256Hex(bin: Column): Column = lower(sha2(bin, 256))

  /** Payload size in bytes (NOT characters). */
  def byteLen(bin: Column): Column = length(bin).cast("long")

  /** First `n` bytes as lowercase hex — magic-number sniffing
    * (`ffd8ff` = JPEG, `89504e47` = PNG, …) without decoding. */
  def headerHex(bin: Column, n: Int = 16): Column =
    lower(hex(substring(bin, 1, n)))

  /** Evenly-spaced "frame sample": k slices of `frameBytes` bytes at
    * offsets 1 + ⌊len·i/k⌋ — the partition-friendly skeleton of a
    * video frame sampler (a real one decodes each slice; the slicing,
    * schema and batch shape are what matter to the engine). Lowercase
    * hex per frame. */
  def frameSampleHex(bin: Column, k: Int = 3, frameBytes: Int = 8): Column =
    array((0 until k).map { i =>
      val off = (lit(1) + floor(byteLen(bin) * i / k).cast("long")).cast("int")
      lower(hex(substring(bin, off, lit(frameBytes))))
    }: _*)

  /** ======= STUB ======= deterministic fake decoder: emits the typed
    * metadata struct a real PIXEL decode would (width, height,
    * channels), derived from the byte length so it is reproducible in
    * any engine. Kept ONLY for modalities that genuinely require a
    * codec (pixel data, audio samples, video frames) — image
    * DIMENSIONS need no codec and are parsed for real from the header
    * bytes by [[imageDims]]. Swap for a real codec stage in
    * deployment; the schema and null-safety are the contract. */
  def stubDecode(bin: Column): Column =
    struct(
      (byteLen(bin) % 640).as("width"),
      (byteLen(bin) % 480).as("height"),
      lit(3L).as("channels"))

  // ------------------------------------------------------- real header parse

  /** Exact integer division (SQL `div` / IntegralDivide — DuckDB `//`). */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Big-endian unsigned integer from `n` bytes at 1-based STATIC
    * offset `off` — `conv` of the hex slice, a codegen built-in. */
  private def beUInt(bin: Column, off: Int, n: Int): Column =
    conv(hex(substring(bin, off, n)), 16, 10).cast("long")

  /** Little-endian u16 at 1-based static offset (byte-swap the hex). */
  private def leU16(bin: Column, off: Int): Column =
    conv(concat(hex(substring(bin, off + 1, 1)), hex(substring(bin, off, 1))),
      16, 10).cast("long")

  /** Big-endian u16 at a DYNAMIC 1-based offset (for the JPEG walk). */
  private def beU16At(bin: Column, off: Column): Column =
    conv(hex(substr(bin, off.cast("int"), lit(2))), 16, 10).cast("long")

  /** Byte value at a dynamic 1-based offset (null past end → −1). */
  private def u8At(bin: Column, off: Column): Column =
    coalesce(
      conv(hex(substr(bin, off.cast("int"), lit(1))), 16, 10).cast("long"),
      lit(-1L))

  /** Segments the bounded JPEG marker walk will visit before giving
    * up. Real JFIF/EXIF files put SOF within a handful of segments
    * (APP0/APP1/ICC/DQT/DHT...); 16 is generous. Each segment costs a
    * constant number of byte reads, so the walk is O(1) per row
    * regardless of payload size. */
  val MaxJpegSegments = 16

  /** JPEG dimensions from the SOF segment, found by walking the
    * marker chain from byte 3 (after the FFD8 SOI): at each step read
    * the 2-byte marker and 2-byte big-endian length, stop at any SOF
    * marker (C0–CF except C4 DHT / C8 JPG / CC DAC) where
    * height = bytes off+5..6 and width = off+7..8, skip RST/TEM
    * standalone markers, and bail at SOS/EOI or a non-FF byte. The
    * walk is a Catalyst `aggregate` HOF over [[MaxJpegSegments]]
    * steps — pure codegen built-ins, no UDF. Returns
    * struct(w, h) of nullable longs (null = no SOF found). */
  def jpegDims(bin: Column): Column = {
    val sofMarkers = Seq(0xC0L, 0xC1L, 0xC2L, 0xC3L, 0xC5L, 0xC6L, 0xC7L,
      0xC9L, 0xCAL, 0xCBL, 0xCDL, 0xCEL, 0xCFL)
    val init = struct(lit(3L).as("off"), lit(-1L).as("w"), lit(-1L).as("h"))
    val walked = aggregate(
      sequence(lit(1), lit(MaxJpegSegments)),
      init,
      (acc, _) => {
        val off = acc.getField("off")
        val m1 = u8At(bin, off)
        val m2 = u8At(bin, off + 1)
        val segLen = beU16At(bin, off + 2)
        val sof = sofMarkers.map(m2 === _).reduce(_ || _)
        val standalone = (m2 >= 0xD0L && m2 <= 0xD7L) || m2 === 0x01L
        val bail = struct(lit(-1L).as("off"), lit(-1L).as("w"), lit(-1L).as("h"))
        when(acc.getField("w") >= 0 || off < 0, acc)
          .when(m1 =!= 0xFFL || m2 === 0xD9L || m2 === 0xDAL, bail)
          // the spec permits any number of 0xFF fill bytes before a
          // marker — resync one byte forward or the length read below
          // would consume the REAL marker and jump to a garbage offset
          .when(m2 === 0xFFL, struct((off + 1).as("off"),
            lit(-1L).as("w"), lit(-1L).as("h")))
          // SOF truncated mid-dimensions: bail rather than parse the
          // partial bytes as a bogus width/height
          .when(sof && length(bin) < off + 8, bail)
          .when(sof, struct(off.as("off"),
            beU16At(bin, off + 7).as("w"), beU16At(bin, off + 5).as("h")))
          .when(standalone, struct((off + 2).as("off"),
            lit(-1L).as("w"), lit(-1L).as("h")))
          .otherwise(struct((off + 2 + segLen).as("off"),
            lit(-1L).as("w"), lit(-1L).as("h")))
      })
    struct(
      when(walked.getField("w") >= 0, walked.getField("w")).as("w"),
      when(walked.getField("h") >= 0, walked.getField("h")).as("h"))
  }

  /** REAL image metadata from the header bytes — no codec involved,
    * just magic-number dispatch plus fixed-layout integer fields, all
    * codegen built-ins (`substring`/`hex`/`conv`):
    *   - PNG  (`89504e470d0a1a0a`): IHDR width/height, big-endian u32
    *     at byte offsets 17 and 21.
    *   - GIF  (`GIF87a`/`GIF89a`): logical-screen width/height,
    *     little-endian u16 at offsets 7 and 9.
    *   - JPEG (`ffd8ff`): SOF segment walk — see [[jpegDims]].
    * Anything else: format "unknown", null dimensions (including
    * truncated/corrupt headers of a known magic).
    * Output: struct(format string, width long, height long). */
  def imageDims(bin: Column): Column = {
    val hdr = lower(hex(substring(bin, 1, 8)))
    val nullDim = lit(null).cast("long")
    val jd = jpegDims(bin)
    // length gates honor the truncation contract: a payload cut inside
    // the dimension fields must yield nulls, not a number parsed from
    // however many bytes happen to remain (PNG IHDR dims end at byte
    // 24, the GIF screen descriptor at byte 10)
    when(hdr.startsWith("89504e470d0a1a0a"),
        struct(lit("png").as("format"),
          when(length(bin) >= 24, beUInt(bin, 17, 4)).as("width"),
          when(length(bin) >= 24, beUInt(bin, 21, 4)).as("height")))
      .when(hdr.startsWith("474946383761") || hdr.startsWith("474946383961"),
        struct(lit("gif").as("format"),
          when(length(bin) >= 10, leU16(bin, 7)).as("width"),
          when(length(bin) >= 10, leU16(bin, 9)).as("height")))
      .when(hdr.startsWith("ffd8ff"),
        struct(lit("jpeg").as("format"),
          jd.getField("w").as("width"), jd.getField("h").as("height")))
      .otherwise(struct(lit("unknown").as("format"),
        nullDim.as("width"), nullDim.as("height")))
  }

  /** Little-endian u16 at a DYNAMIC 1-based offset (RIFF walk). */
  private def leU16At(bin: Column, off: Column): Column =
    conv(concat(
      hex(substr(bin, off.cast("int") + 1, lit(1))),
      hex(substr(bin, off.cast("int"), lit(1)))), 16, 10).cast("long")

  /** Little-endian u32 at a DYNAMIC 1-based offset (RIFF walk). */
  private def leU32At(bin: Column, off: Column): Column =
    conv(concat(
      hex(substr(bin, off.cast("int") + 3, lit(1))),
      hex(substr(bin, off.cast("int") + 2, lit(1))),
      hex(substr(bin, off.cast("int") + 1, lit(1))),
      hex(substr(bin, off.cast("int"), lit(1)))), 16, 10).cast("long")

  /** Big-endian u32 at a DYNAMIC 1-based offset (ISO-BMFF walk) — the
    * hex of an in-order 4-byte slice IS the big-endian reading, so one
    * `conv` suffices (no byte reversal like the RIFF readers). */
  private def beU32At(bin: Column, off: Column): Column =
    conv(hex(substr(bin, off.cast("int"), lit(4))), 16, 10).cast("long")

  /** Big-endian u64 at a DYNAMIC 1-based offset (ISO-BMFF `largesize`
    * and version-1 `mvhd` duration). Values ≥ 2⁶³ wrap negative under
    * the signed cast; callers treat negative as corrupt and bail. */
  private def beU64At(bin: Column, off: Column): Column =
    conv(hex(substr(bin, off.cast("int"), lit(8))), 16, 10).cast("long")

  /** Chunks the bounded RIFF walk will visit before giving up. Real
    * WAV files put `fmt ` and `data` within the first few chunks
    * (LIST/INFO/fact/cue in between at most); each step is a constant
    * number of byte reads, so the walk is O(1) per row regardless of
    * payload size. */
  val MaxWavChunks = 8

  /** REAL audio metadata from a RIFF/WAVE header — the audio member of
    * the no-codec decode family ([[imageDims]] is the image one): walk
    * the chunk chain from byte 13 (`"RIFF" size "WAVE"` prelude), read
    * `fmt `'s channels / sample-rate / bits-per-sample / byte-rate
    * (all little-endian fixed offsets within the chunk) and `data`'s
    * payload size, skipping unknown chunks (LIST/fact/cue…) by their
    * declared size + the RIFF odd-size pad byte. Chunk order is not
    * assumed (`data` before `fmt ` parses the same). The walk is a
    * Catalyst `aggregate` HOF over [[MaxWavChunks]] steps — pure
    * codegen built-ins, no UDF, exactly [[jpegDims]]' machinery.
    *
    * Output: struct(channels, sample_rate, bits_per_sample,
    * data_bytes, duration_ms, data_off) of nullable longs — all null when the
    * RIFF/WAVE magic is absent or the needed chunks aren't found;
    * duration_ms = data_bytes·1000 div byte_rate (exact integer), null
    * unless both chunks parsed and byte_rate > 0. */
  def wavInfo(bin: Column): Column = {
    val isWave = lower(hex(substring(bin, 1, 4))) === "52494646" &&
      lower(hex(substring(bin, 9, 4))) === "57415645"
    val init = struct(
      lit(13L).as("off"), lit(-1L).as("ch"), lit(-1L).as("rate"),
      lit(-1L).as("bits"), lit(-1L).as("brate"), lit(-1L).as("dsize"),
      lit(-1L).as("doff"))
    val walked = aggregate(
      sequence(lit(1), lit(MaxWavChunks)),
      init,
      (acc, _) => {
        val off = acc.getField("off")
        val cc = lower(hex(substr(bin, off.cast("int"), lit(4))))
        val size = leU32At(bin, off + 4)
        // RIFF chunks are word-aligned: odd sizes carry a pad byte.
        // Cap the next offset at one-past-payload: a corrupt size field
        // (u32 up to ~4.3e9) would otherwise push `off` past
        // Int.MaxValue, and the substr cast on the next step would
        // throw under ANSI mode instead of yielding the null row.
        val nextRaw = off + 8 + size + (size % 2)
        val next = when(nextRaw > length(bin) + 1, lit(-1L)).otherwise(nextRaw)
        def keep(f: String) = acc.getField(f)
        val done = keep("ch") >= 0 && keep("dsize") >= 0
        val bail = struct(lit(-1L).as("off"), keep("ch").as("ch"),
          keep("rate").as("rate"), keep("bits").as("bits"),
          keep("brate").as("brate"), keep("dsize").as("dsize"),
          keep("doff").as("doff"))
        when(off < 0 || done, acc)
          .when(length(substr(bin, off.cast("int"), lit(8))) < 8, bail)
          .when(cc === "666d7420", struct(next.as("off"), // "fmt "
            leU16At(bin, off + 10).as("ch"),
            leU32At(bin, off + 12).as("rate"),
            leU16At(bin, off + 22).as("bits"),
            leU32At(bin, off + 16).as("brate"),
            keep("dsize").as("dsize"), keep("doff").as("doff")))
          .when(cc === "64617461", struct(next.as("off"), // "data"
            keep("ch").as("ch"), keep("rate").as("rate"),
            keep("bits").as("bits"), keep("brate").as("brate"),
            size.as("dsize"), (off + 8).as("doff")))
          .otherwise(struct(next.as("off"), keep("ch").as("ch"),
            keep("rate").as("rate"), keep("bits").as("bits"),
            keep("brate").as("brate"), keep("dsize").as("dsize"),
            keep("doff").as("doff")))
      })
    def field(f: String) = walked.getField(f)
    def pos(c: Column) = when(isWave && c >= 0, c)
    struct(
      pos(field("ch")).as("channels"),
      pos(field("rate")).as("sample_rate"),
      pos(field("bits")).as("bits_per_sample"),
      pos(field("dsize")).as("data_bytes"),
      when(isWave && field("dsize") >= 0 && field("brate") > 0,
        idiv(field("dsize") * 1000, field("brate"))).as("duration_ms"),
      pos(field("doff")).as("data_off"))
  }

  /** Samples [[pcmStats]] reads per payload — a fixed cap so the
    * feature pass stays O(1) byte probes per row (the same bounded-
    * probe argument as every walk here); real pipelines raise it or
    * window it, the plan shape is unchanged. */
  val PcmMaxSamples = 64

  /** REAL audio-sample decode for 8-bit mono PCM — the first member
    * of the decode family to cross from metadata into SAMPLES, shrinking
    * [[stubDecode]]'s scope to codec-requiring formats: locate the
    * `data` chunk via [[wavInfo]]'s walk (`data_off`), read up to
    * [[PcmMaxSamples]] unsigned bytes, and emit integer signal
    * features over the deviation stream `s − 128` (PCM8's zero line):
    * peak |dev|, mean |dev| ×100 (exact integer div), and the strict
    * zero-crossing count (sign product −1; touching the zero line is
    * not a crossing — deterministic in any engine). Null struct unless
    * the payload is a parseable 8-bit mono WAV with data.
    *
    * `info` is the [[wavInfo]] struct ALREADY PROJECTED into a column
    * by the caller — passing `wavInfo(bin)` inline would re-run the
    * chunk walk for every sample probe inside the transform lambdas
    * (HOFs evaluate interpreted; nothing eliminates the duplicated
    * subtree), turning an O(samples) pass into O(samples·walk). */
  def pcmStats(bin: Column, info: Column): Column = {
    val doff = info.getField("data_off")
    val dsize = info.getField("data_bytes")
    val n = least(dsize, lit(PcmMaxSamples.toLong))
    // honest gating (the bmpStats contract): every probed byte must be
    // PRESENT — a truncated payload whose data-chunk size field claims
    // more bytes than exist would otherwise feed u8At's -1 sentinel
    // into the stats as fabricated -129 deviations. The last probe is
    // doff + n - 1.
    val ok = doff.isNotNull && dsize > 0 &&
      info.getField("bits_per_sample") === 8 && info.getField("channels") === 1 &&
      length(bin) >= doff + n - 1
    val devs = transform(sequence(lit(1), n.cast("int")),
      i => u8At(bin, doff + i - 1) - 128)
    // ONE fold computes every feature (state: Σ|dev|, max|dev|,
    // previous sign, crossing count) and the `finish` lambda shapes
    // the output struct from the final state. Separate per-feature
    // aggregates — or a sign ARRAY referenced from inside a lambda —
    // would re-evaluate their whole input per use (interpreted HOFs,
    // no CSE): the array-reference form measured O(n²·probe), 13.7 s
    // for 5 k rows at sf0.1 vs ~2 s for this shape.
    val feat = aggregate(
      devs,
      struct(lit(0L).as("sum"), lit(0L).as("peak"),
        lit(0L).as("prev"), lit(0L).as("cnt")),
      (st, d) => {
        val ad = abs(d)
        val sg = when(d > 0, 1L).when(d < 0, -1L).otherwise(0L)
        struct(
          (st.getField("sum") + ad).as("sum"),
          greatest(st.getField("peak"), ad).as("peak"),
          sg.as("prev"),
          (st.getField("cnt") +
            when(st.getField("prev") * sg === -1, 1L).otherwise(0L))
            .as("cnt"))
      },
      st => struct(
        n.as("n_samples"),
        st.getField("peak").as("peak_dev"),
        idiv(st.getField("sum") * 100, n).as("mad_x100"),
        st.getField("cnt").as("crossings")))
    when(ok, feat)
  }

  /** Top-level / moov-child boxes the bounded ISO-BMFF walks will
    * visit before giving up. Real MP4s put `moov` within the first few
    * top-level boxes (`ftyp`, optional `free`/`wide`/`mdat` siblings)
    * and `mvhd` is by spec the first `moov` child; each step is a
    * constant number of byte reads, so the walk is O(1) per row
    * regardless of payload size — `moov`-at-end files cost one extra
    * step (skipping `mdat` by its declared size), not an `mdat` scan. */
  val MaxMp4Boxes = 8

  /** REAL video-container metadata from an ISO-BMFF (MP4/MOV) header —
    * the video member of the no-codec decode family ([[imageDims]] /
    * [[wavInfo]] are the image/audio ones): walk the top-level box
    * chain (`size:u32be type:4cc`; `size==1` → 64-bit `largesize` at
    * +8), find `moov`, walk its children to `mvhd`, and read the
    * movie timescale/duration at the version-dependent offsets
    * (version 0: u32 at +20/+24; version 1: u32 at +28, u64 at +32,
    * after the widened create/modify times). Box order is not assumed:
    * `moov` after `mdat` (the normal camera-write layout) parses the
    * same because `mdat` is SKIPPED by its declared size, never read.
    *
    * Both levels run in ONE `aggregate` HOF as a state machine (mode
    * 0 = top-level scan, mode 1 = inside moov; the `bound` field
    * shrinks to moov's end on descent) over 2·[[MaxMp4Boxes]] steps.
    * One pass matters: a second aggregate parameterized by the
    * first's result would re-embed the entire first walk in every
    * step of the second (HOFs evaluate interpreted — no codegen CSE),
    * a ~10× per-row blowup measured at sf0.1. Same bounded-probe
    * machinery as [[wavInfo]]; callers should project the struct into
    * a column ONCE before extracting fields.
    *
    * Output: struct(brand, timescale, duration, duration_ms) — brand =
    * the `ftyp` major brand 4cc as a string; all fields null when the
    * `ftyp` magic (bytes 5–8) is absent or `moov`/`mvhd` isn't found;
    * duration_ms = duration·1000 div timescale (exact integer). */
  def mp4Info(bin: Column): Column = {
    val isMp4 = lower(hex(substring(bin, 5, 4))) === "66747970" // "ftyp"
    val brand = substring(bin, 9, 4).cast("string")
    val init = struct(lit(1L).as("off"),
      (length(bin).cast("long") + 1).as("bound"), lit(0L).as("mode"),
      lit(-1L).as("ts"), lit(-1L).as("dur"))
    val walked = aggregate(
      sequence(lit(1), lit(MaxMp4Boxes * 2)),
      init,
      (acc, _) => {
        val off = acc.getField("off")
        val bound = acc.getField("bound")
        val mode = acc.getField("mode")
        def keep(f: String) = acc.getField(f)
        def st(o: Column, b: Column, m: Column, t: Column, d: Column) =
          struct(o.as("off"), b.as("bound"), m.as("mode"),
            t.as("ts"), d.as("dur"))
        // box-header decode: declared size (largesize-aware) and the
        // bail-guarded next offset — a size below the header's own
        // length, a negative (wrapped u64) size, or a next offset past
        // the current bound ends the walk with -1.
        val size32 = beU32At(bin, off)
        val typ = lower(hex(substr(bin, off.cast("int") + 4, lit(4))))
        val size = when(size32 === 1, beU64At(bin, off + 8)).otherwise(size32)
        val nextRaw = off + size
        val next = when(size32 === 1 && size < 16, lit(-1L))
          .when(size32 =!= 1 && size < 8, lit(-1L))
          .when(nextRaw > bound, lit(-1L))
          .otherwise(nextRaw)
        val ver = u8At(bin, off + 8)
        val bail = st(lit(-1L), bound, mode, keep("ts"), keep("dur"))
        // mvhd version 0 needs 28 box bytes through duration, v1 40 —
        // a payload cut inside the fields yields nulls, not a misparse.
        val v0 = st(next, bound, mode,
          beU32At(bin, off + 20), beU32At(bin, off + 24))
        val v1 = st(next, bound, mode,
          beU32At(bin, off + 28), beU64At(bin, off + 32))
        when(off < 0 || keep("ts") >= 0, acc)
          .when(off + 8 > bound ||
            length(substr(bin, off.cast("int"), lit(8))) < 8, bail)
          .when(mode === 0 && typ === "6d6f6f76", // "moov" → descend
            st(off + 8, least(nextRaw, length(bin).cast("long") + 1),
              lit(1L), keep("ts"), keep("dur")))
          .when(mode === 1 && typ === "6d766864" && ver === 1 && // "mvhd"
            length(substr(bin, off.cast("int"), lit(40))) >= 40, v1)
          .when(mode === 1 && typ === "6d766864" && ver === 0 &&
            length(substr(bin, off.cast("int"), lit(28))) >= 28, v0)
          .when(mode === 1 && typ === "6d766864", bail)
          .otherwise(st(next, bound, mode, keep("ts"), keep("dur")))
      })
    val ts = walked.getField("ts")
    val dur = walked.getField("dur")
    struct(
      when(isMp4, brand).as("brand"),
      when(isMp4 && ts >= 0, ts).as("timescale"),
      when(isMp4 && ts >= 0 && dur >= 0, dur).as("duration"),
      when(isMp4 && ts > 0 && dur >= 0, idiv(dur * 1000, ts)).as("duration_ms"))
  }

  /** BMP (BITMAPINFOHEADER) header fields in one probe pass, ungated
    * except the magic/size check: struct(is_bmp, dib_size, width,
    * height, bpp, compression, data_off) — width/height SIGNED i32
    * (negative height = top-down row order). Deliberately NOT merged
    * into [[imageDims]]' sniffing chain: `BM` is a weak 2-byte magic,
    * so BMP claims are additionally gated on DIB size / bpp /
    * compression here instead of polluting the 4-byte-magic path.
    * Callers project this ONCE and hand it to [[bmpStats]]. */
  def bmpHeader(bin: Column): Column = {
    def sgn32(u: Column): Column =
      when(u > 2147483647L, u - 4294967296L).otherwise(u)
    struct(
      (lower(hex(substring(bin, 1, 2))) === "424d" &&
        length(bin) >= 54).as("is_bmp"),
      leU32At(bin, lit(15)).as("dib_size"),
      sgn32(leU32At(bin, lit(19))).as("width"),
      sgn32(leU32At(bin, lit(23))).as("height"),
      leU16At(bin, lit(29)).as("bpp"),
      leU32At(bin, lit(31)).as("compression"),
      leU32At(bin, lit(11)).as("data_off"))
  }

  /** Pixels sampled per payload by [[bmpStats]] — the bounded-probe
    * cap (see [[PcmMaxSamples]]). */
  val BmpMaxPixels = 64

  /** REAL image-pixel decode for uncompressed 24-bit BMP — with
    * [[pcmStats]] this narrows [[stubDecode]]'s scope to formats that
    * genuinely need a codec (DCT/inflate): BI_RGB pixel arrays are
    * plain BGR byte triples in 4-byte-aligned rows, so per-channel
    * statistics are pure byte probes. Samples up to [[BmpMaxPixels]]
    * evenly-spaced pixels (`p_j = ⌊j·npix/k⌋` in storage order —
    * row order doesn't affect means, so bottom-up vs top-down is
    * irrelevant here) and folds Σ per channel in ONE aggregate pass.
    *
    * Output: struct(width, height, bpp — header-level, null unless a
    * plausible BMP; px: struct(n_sampled, mean_r_x100, mean_g_x100,
    * mean_b_x100) — null unless 24-bpp BI_RGB with the WHOLE declared
    * pixel array present). The pixel block is a nested struct so one
    * projection of the outer struct evaluates the fold exactly once;
    * `hdr` is the [[bmpHeader]] struct already projected by the
    * caller (same interpreted-HOF argument as [[pcmStats]]). */
  def bmpStats(bin: Column, hdr: Column): Column = {
    val w = hdr.getField("width")
    val hAbs = abs(hdr.getField("height"))
    // plausibility-gated header accept, not just the DIB-size probe:
    // any text payload starting with "BM" has printable ASCII where
    // the header fields live and decodes to junk dims (dib_size alone
    // is >= 40 for most ASCII), so require a LEGAL bpp, a BI_* range
    // compression code, and sane dims before claiming the header
    // parsed — the differential oracle emits NULLs for non-BMP arms
    // and must never disagree on data-dependent "BM" text.
    val okHdr = hdr.getField("is_bmp") && hdr.getField("dib_size") >= 40 &&
      hdr.getField("bpp").isin(1L, 4L, 8L, 16L, 24L, 32L) &&
      hdr.getField("compression").between(0L, 13L) &&
      w.between(1L, 1L << 20) && hAbs.between(1L, 1L << 20)
    val dataOff = hdr.getField("data_off")
    val stride = idiv(w * 3 + 3, lit(4)) * 4
    val npix = w * hAbs
    val okPx = okHdr && hdr.getField("bpp") === 24 &&
      hdr.getField("compression") === 0 && w >= 1 && hAbs >= 1 &&
      dataOff >= 54 && length(bin) >= dataOff + stride * hAbs
    val kk = least(npix, lit(BmpMaxPixels.toLong))
    val feat = aggregate(
      sequence(lit(0), (kk - 1).cast("int")),
      struct(lit(0L).as("b"), lit(0L).as("g"), lit(0L).as("r")),
      (st, j) => {
        val p = idiv(j.cast("long") * npix, kk)
        val off0 = dataOff + idiv(p, w) * stride + (p % w) * 3
        struct(
          (st.getField("b") + u8At(bin, off0 + 1)).as("b"),
          (st.getField("g") + u8At(bin, off0 + 2)).as("g"),
          (st.getField("r") + u8At(bin, off0 + 3)).as("r"))
      },
      st => struct(
        kk.as("n_sampled"),
        idiv(st.getField("r") * 100, kk).as("mean_r_x100"),
        idiv(st.getField("g") * 100, kk).as("mean_g_x100"),
        idiv(st.getField("b") * 100, kk).as("mean_b_x100")))
    struct(
      when(okHdr, w).as("width"),
      when(okHdr, hdr.getField("height")).as("height"),
      when(okHdr, hdr.getField("bpp")).as("bpp"),
      when(okPx, feat).as("px"))
  }

  // ------------------------------------------------- perceptual hash (64-bit)

  /** Blockhash-style signature geometry: 64 equal byte-range blocks,
    * [[PHashSampleBytes]] sampled bytes summed per block, bit i = 1
    * iff block i's sum strictly exceeds the median of the 64 sums
    * (ties → 0, so the bit rule is deterministic in any engine).
    * Sampling makes each block O(1) regardless of payload size — the
    * signature pass is a narrow zero-shuffle projection even on
    * multi-MB payloads. */
  val PHashBlocks = 64
  val PHashSampleBytes = 4

  /** Default banding for phash pairing: 8 bands × 8 bits over the
    * 64-bit signature. The candidate stage joins on band PAIRS
    * ([[graft.operators.NearDup.bandedHammingPairs]] with
    * minSharedBands = 2), so the pigeonhole-exact envelope is
    * Hamming ≤ 6: ≤ 6 differing bits touch ≤ 6 of the 8 bands,
    * leaving ≥ 2 equal bands to form a shared pair key.
    * [[PHashMaxHamming]] = 6 keeps the emitted pairs exactly inside
    * that envelope; 256-value bands keep unrelated payloads from
    * colliding. */
  val PHashBands = 8
  val PHashMaxHamming = 6

  /** Corpus-scale blockhash dials — the wider sibling of the 64-bit
    * mode, in exactly the relation `neardup_simhash_scaled` has to
    * `neardup_simhash`: the 64-bit signature's band-PAIR keys span
    * 2·8 = 16 bits, so however good the hash, unrelated-pair
    * collisions grow as n²·C(8,2)/2¹⁶ — invisible at the fixture,
    * measured at 576× the linear envelope by the 100× soak (52 395
    * candidate rows for 50k payloads). 256 blocks give a 256-bit
    * signature in 16 bands × 16 bits; band-pair keys then span 32
    * bits (C(16,2) = 120 keys over 4.3·10⁹ values), pushing the
    * random-collision floor to ~n²·120/2³² — ~35 rows at 50k
    * payloads, ~10⁶ at 10M. Pigeonhole exactness holds for Hamming
    * ≤ 14 (≤ 14 differing bits touch ≤ 14 of 16 bands, leaving an
    * intact pair); 14/256 is a TIGHTER relative cutoff than the
    * 64-bit mode's 6/64 — the scaled mode trades cutoff headroom for
    * key entropy, which is the right trade when the corpus is the
    * thing growing. */
  val PHashScaledBlocks = 256
  val PHashScaledBands = 16
  val PHashScaledMaxHamming = 14

  /** Widened MIDPOINT-grid cutoff for the recall-dial battery row
    * (`multimodal_phash_recall_wide`): the measured twin distances
    * (dev probe `phash_twin_ham`) put the one default-missed planted
    * twin at primary 12 / midpoint 17 — banding and the primary
    * pigeonhole envelope already catch it; only the unbanded
    * second-grid confirm rejects it. 20 clears the measured miss with
    * headroom while keeping the dual-grid collision squaring (see
    * [[pHashPairsScaled]]'s `midMaxHamming` note). */
  val PHashScaledMidHammingWide = 20

  /** The 64 block features of [[pHash64]] as an array column —
    * exposed separately so callers materialize it ONCE before both
    * the sort and the per-bit comparisons consume it.
    *
    * Each feature is the unsigned byte sum of the block's sampled
    * window, computed by [[graft.expressions.PHashFeatureSums]] — one
    * native codegen'd loop straight off the payload bytes (no hex
    * round trip, O(row) generated code). [[pHashFeaturesComposed]]
    * keeps the original conv-over-hex formulation as the
    * equivalence-spec reference. */
  def pHashFeatures(
      bin: Column,
      midpoint: Boolean = false,
      blocks: Int = PHashBlocks): Column =
    org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.PHashFeatureSums(
        org.apache.spark.sql.graft.ColumnAdapter.expression(bin),
        midpoint, blocks, PHashSampleBytes))

  /** The composed (hex + conv + shift-and-mask) form of
    * [[pHashFeatures]] — the cross-engine reference formula the DuckDB
    * oracle mirrors, kept as the equivalence oracle for the native
    * expression (ExpressionEquivalenceSpec pins native == composed).
    *
    * Each feature is the byte sum of the block's sampled window, read
    * with a SINGLE `conv` of the window's hex slice and decomposed by
    * shift-and-mask — the byte sum of a big-endian-read value is
    * shift-invariant, and a window truncated by end-of-payload
    * contributes 0 for the missing bytes, so this is exactly the
    * per-byte sum at a quarter of the expression count (64 convs, not
    * 256). */
  private[graft] def pHashFeaturesComposed(bin: Column, midpoint: Boolean = false): Column = {
    val hx = lower(hex(bin))
    val len = length(bin).cast("long")
    array((0 until PHashBlocks).map { i =>
      // midpoint = the CONFIRM signature's sample grid: windows at the
      // half-step offsets len·(2i+1)/128, byte-disjoint from the
      // primary grid's len·i/64 windows once blocks span ≥ 8 bytes —
      // an (approximately) independent second 64-bit draw.
      val start =
        if (midpoint) idiv(len * (2 * i + 1), lit(2 * PHashBlocks))
        else idiv(len * i, lit(PHashBlocks)) // 0-based byte offset
      val v = coalesce(
        conv(substr(hx, (start * 2 + 1).cast("int"), lit(PHashSampleBytes * 2)),
          16, 10).cast("long"),
        lit(0L))
      (0 until PHashSampleBytes).map(b =>
        shiftrightunsigned(v, 8 * b).bitwiseAND(lit(255L))).reduce(_ + _)
    }: _*)
  }

  /** A documents-shaped perceptual-hash analogue of the image
    * blockhash algorithm, over the RAW BYTE STREAM: a real image
    * phash runs the same block/median/bit pipeline over DECODED
    * pixels — plug a decoder in front and this operator is exactly
    * that; until then it is a deterministic, oracle-replicable
    * near-dup signature for any binary payload (small byte edits
    * flip few blocks → small Hamming distance). Returns ONE long. */
  def pHash64(feats: Column): Column =
    element_at(packWords(feats, PHashBlocks), 1)

  /** [[graft.expressions.PHashPackWords]] as a Column — the native
    * codegen'd form of the blockhash bit rule (sort → 2× lower median
    * → strict-> bit per block, packed ⌈blocks/64⌉ longs). The composed
    * when-chain forms below ([[pHash64Composed]], [[pHashWordsComposed]])
    * are the cross-engine reference formulas the equivalence spec pins
    * the native loop against — per bit they are what the DuckDB oracle
    * replicates. */
  private def packWords(feats: Column, blocks: Int): Column =
    org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.PHashPackWords(
        org.apache.spark.sql.graft.ColumnAdapter.expression(feats), blocks))

  /** The composed (array_sort + per-bit when-chain) form of
    * [[pHash64]] — kept as the equivalence-spec reference for the
    * native packer (512 when-branches per dual-grid signature blew
    * past JIT method limits: the scaled signature stage measured
    * 6.9 s of the query's 7.8 s at sf0.1 running this shape). */
  private[graft] def pHash64Composed(feats: Column): Column = {
    val sorted = array_sort(feats)
    // 2× the lower median of 64 values; strict > means ties → 0.
    val med2 = element_at(sorted, PHashBlocks / 2) +
      element_at(sorted, PHashBlocks / 2 + 1)
    (0 until PHashBlocks).map { i =>
      when(element_at(feats, i + 1) * 2 > med2, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Per-payload packed signature table `(idCol, __sig0, __sigm)` —
    * `__sig0` is the primary signature (the banding/candidate key,
    * the shape [[graft.operators.NearDup.bandedHammingPairs]]
    * consumes), `__sigm` the midpoint-grid CONFIRM signature. Narrow,
    * zero-shuffle. */
  def pHashSignatures(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
        pHashFeatures(col(binCol)).as("__feats"),
        pHashFeatures(col(binCol), midpoint = true).as("__featsm"))
      .select(col(idCol),
        pHash64(col("__feats")).as("__sig0"),
        pHash64(col("__featsm")).as("__sigm"))

  /** Perceptual near-dup pairs (doc_a < doc_b, hamming_dist ≤
    * maxHamming) — signatures through the SAME banded-Hamming
    * candidate machinery as SimHash ([[NearDup.bandedHammingPairs]]):
    * candidates come from a band equijoin, never all pairs, and with
    * the default dials (8 bands × 8 bits, Hamming ≤ 6) the primary
    * pair set is pigeonhole-exact.
    *
    * A pair must ALSO sit within `maxHamming` on the second,
    * midpoint-grid signature. One 64-bit signature with an absolute
    * cutoff has a FIXED per-pair random-collision rate (measured ≈
    * 7·10⁻⁷ on the fixture corpus), so its pair output grows
    * quadratically with corpus size no matter how good the banding is
    * — the 10× soak surfaced exactly that. Requiring both
    * (approximately independent) signatures squares the noise rate to
    * ~5·10⁻¹³ while a genuine byte-edit near-dup — K edited bytes
    * touch ≤ K sample windows on EACH grid — stays far inside both
    * cutoffs. `hamming_dist` in the output remains the primary
    * signature's distance (the documented contract).
    *
    * SMALL-CORPUS MODE. Even with the dual-grid confirm, the 64-bit
    * signature's band-PAIR keys span only 16 bits, so the CANDIDATE
    * join (before the confirm can crush it) grows n²·C(8,2)/2¹⁶ — the
    * 100× soak measured it at 576× the linear envelope, which is why
    * this mode is excluded from the soak gate alongside the exact
    * SimHash mode ([[graft.Soak.soakQueries]]). A growing corpus runs
    * [[pHashPairsScaled]]: 256-bit signatures, 32-bit band-pair keys,
    * collision floor ~n²·120/2³², measured LINEAR at the same 100×
    * spot. This mode remains the small-corpus correctness oracle (its
    * 8-band geometry is the one the DuckDB oracle replicates
    * bit-for-bit). */
  def pHashPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "payload",
      bands: Int = PHashBands,
      maxHamming: Int = PHashMaxHamming): DataFrame = {
    // This operator PROMISES exact recall, and its candidate stage
    // requires agreement on a band PAIR (minSharedBands = 2 below), so
    // the pigeonhole argument needs two bands to survive maxHamming
    // corrupted bits. A wider cutoff must also widen the band count —
    // fail loudly instead of silently losing pairs.
    require(bands - maxHamming >= 2,
      s"pHashPairs is exact only when bands - maxHamming >= 2 " +
        s"(band-pair candidates); got bands=$bands, maxHamming=$maxHamming")
    // Materialize the signature table through ONE exchange. The sig
    // pipeline is narrow (no shuffle of its own) and every join below
    // broadcasts, so without this seam nothing in the plan is reusable
    // and the 128-conv feature extraction re-runs once per consumer —
    // the band join's two sides plus the two midpoint joins recompute
    // it 8× (measured: 16 parquet scans, 0 reuse). Repartitioning on
    // the id key ends all four subtrees in the SAME canonical exchange,
    // which AQE/ReuseExchange computes once; what shuffles is 3 longs
    // per payload, and every consumer reads the tiny materialized
    // table instead of re-hashing payload bytes. At 100 TB this is the
    // "persist the signatures" step of any real near-dup deployment,
    // expressed as plan structure instead of a cache.
    // minSharedBands = 2 inside pHashPairsFromSignatures: the 64-bit
    // signature's 8-bit single-band keys give only 256 buckets, so the
    // single-band equijoin is quadratic in corpus size (1.9·10⁸
    // candidate rows at the 10× soak); requiring an agreeing band PAIR
    // keys the join on 16 bits at an UNCHANGED exact-recall contract —
    // Hamming ≤ 6 over 8 bands always leaves ≥ 2 bands intact. See the
    // dial's scaladoc in [[graft.operators.NearDup.bandedHammingPairs]].
    pHashPairsFromSignatures(
      NearDup.seamRepartition(pHashSignatures(df, idCol, binCol), idCol),
      idCol, bands, maxHamming)
  }

  /** The midpoint-grid CONFIRM shared by the one- and two-corpus pair
    * forms: keep primary-signature pairs whose second signatures also
    * sit within the cutoff. */
  private def confirmMidpoint(
      prim: DataFrame,
      mA: DataFrame,
      mB: DataFrame,
      idCol: String,
      maxHamming: Int): DataFrame =
    prim
      .join(mA.select(col(idCol).as("doc_a"), col("__sigm").as("__ma")), "doc_a")
      .join(mB.select(col(idCol).as("doc_b"), col("__sigm").as("__mb")), "doc_b")
      .where(bit_count(col("__ma").bitwiseXOR(col("__mb"))) <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming_dist"))

  /** [[pHashPairs]] over PRE-COMPUTED signature tables (the
    * [[pHashSignatures]] shape `(idCol, __sig0, __sigm)`), cross-corpus:
    * doc_a from `sigsA`, doc_b from `sigsB`. This is the
    * incremental-ingest seam — each tranche's payloads are hashed ONCE
    * into the store and pairing consumes only signatures (6 longs per
    * pair; unlike MinHash's exact-Jaccard confirm, the byte-domain
    * confirm never re-reads payloads). Id spaces must be disjoint;
    * passing the same table on both sides emits both orientations
    * (filter doc_a < doc_b for the ordered one-corpus set). Same
    * band-pair candidate stage and dual-signature confirm as
    * [[pHashPairs]], so unions of tranche-wise calls reproduce the
    * one-shot batch result exactly. */
  def pHashPairsFromSignatures(
      sigsA: DataFrame,
      sigsB: DataFrame,
      idCol: String = "doc_id",
      bands: Int = PHashBands,
      maxHamming: Int = PHashMaxHamming): DataFrame = {
    require(bands - maxHamming >= 2,
      s"pHash pairing is exact only when bands - maxHamming >= 2 " +
        s"(band-pair candidates); got bands=$bands, maxHamming=$maxHamming")
    val prim = NearDup.bandedHammingPairsBetween(
      sigsA.select(col(idCol), col("__sig0")),
      sigsB.select(col(idCol), col("__sig0")),
      idCol, widthBits = 64, bands = bands, hammingMax = maxHamming,
      minSharedBands = 2)
      .distinct()
    confirmMidpoint(prim,
      sigsA.select(col(idCol), col("__sigm")),
      sigsB.select(col(idCol), col("__sigm")),
      idCol, maxHamming)
  }

  /** One-corpus [[pHashPairsFromSignatures]]: the ordered (doc_a <
    * doc_b) pair set over a single pre-computed signature table,
    * through the one-corpus banded join — half the join/distinct/
    * confirm work of the two-table form fed the same table twice. */
  def pHashPairsFromSignatures(
      sigs: DataFrame,
      idCol: String,
      bands: Int,
      maxHamming: Int): DataFrame = {
    require(bands - maxHamming >= 2,
      s"pHash pairing is exact only when bands - maxHamming >= 2 " +
        s"(band-pair candidates); got bands=$bands, maxHamming=$maxHamming")
    val prim = NearDup.bandedHammingPairs(
      sigs.select(col(idCol), col("__sig0")),
      idCol, widthBits = 64, bands = bands, hammingMax = maxHamming,
      minSharedBands = 2)
      .distinct()
    val m = sigs.select(col(idCol), col("__sigm"))
    confirmMidpoint(prim, m, m, idCol, maxHamming)
  }

  /** [[pHash64]] generalized to any block count: the blockhash bit
    * rule (bit i = block i's sum strictly above 2× the lower median)
    * packed into ⌈blocks/64⌉ longs — the multi-word signature shape
    * [[graft.operators.NearDup.bandedHammingPairs]] consumes. Word 0
    * of `blocks = 64` is bit-identical to [[pHash64]]. */
  def pHashWords(feats: Column, blocks: Int): Seq[Column] = {
    require(blocks >= 2, s"blocks must be >= 2, got $blocks")
    val packed = packWords(feats, blocks)
    (0 until (blocks + 63) / 64).map(w => element_at(packed, w + 1))
  }

  /** The composed when-chain form of [[pHashWords]] — the
    * equivalence-spec reference for the native packer (see
    * [[pHash64Composed]]). */
  private[graft] def pHashWordsComposed(feats: Column, blocks: Int): Seq[Column] = {
    require(blocks >= 2, s"blocks must be >= 2, got $blocks")
    val sorted = array_sort(feats)
    val med2 = element_at(sorted, blocks / 2) +
      element_at(sorted, blocks / 2 + 1)
    (0 until (blocks + 63) / 64).map { w =>
      (0 until math.min(64, blocks - 64 * w)).map { j =>
        when(element_at(feats, 64 * w + j + 1) * 2 > med2, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
  }

  /** Wide dual-grid signature table `(idCol, __sig0.., __sigm0..)` —
    * the `blocks`-block form of [[pHashSignatures]]. Narrow,
    * zero-shuffle; the two feature arrays are materialized once each
    * before the word packing consumes them. */
  def pHashSignaturesWide(
      df: DataFrame,
      idCol: String,
      binCol: String,
      blocks: Int = PHashScaledBlocks): DataFrame = {
    val sigW = pHashWords(col("__feats"), blocks)
    val sigM = pHashWords(col("__featsm"), blocks)
    df.select(col(idCol),
        pHashFeatures(col(binCol), midpoint = false, blocks).as("__feats"),
        pHashFeatures(col(binCol), midpoint = true, blocks).as("__featsm"))
      .select(col(idCol) +:
        (sigW.zipWithIndex.map { case (c, w) => c.as(s"__sig$w") } ++
          sigM.zipWithIndex.map { case (c, w) => c.as(s"__sigm$w") }): _*)
  }

  /** Corpus-SCALE perceptual near-dup — [[pHashPairs]]' wider sibling
    * (see [[PHashScaledBlocks]] for why the 64-bit mode's 16-bit
    * band-pair keys saturate in the corpus's second decade of
    * growth): the same banded-band-PAIR candidate stage and
    * dual-grid confirm over a 256-bit blockhash signature, so the
    * candidate join keys span 32 bits and the random-collision floor
    * drops ~2¹⁶×. Pigeonhole-exact at Hamming ≤ `maxHamming` on the
    * primary grid (bands − maxHamming ≥ 2), midpoint-grid cutoff
    * equal by default, `hamming_dist` = the primary distance — the
    * same output contract as the 64-bit mode at its own cutoff.
    *
    * `midMaxHamming` is the RECALL dial the measured twin distances
    * motivate (dev probe `phash_twin_ham`): a 1-byte re-encode can
    * land primary-close but midpoint-far (the planted sf0.01 twin the
    * default cutoff misses sits at primary 12 / midpoint 17), because
    * the two grids sample different windows. The midpoint test is a
    * POST-JOIN filter — not banded — so widening it NEVER changes the
    * candidate volume or the primary pigeonhole envelope; it only
    * trades the dual-grid random-collision squaring (a collision must
    * now survive ≤ midMaxHamming instead of ≤ maxHamming on the second
    * grid — still a ~2⁻¹⁰⁰-ish event for 256-bit signatures of
    * unrelated payloads at either cutoff). */
  def pHashPairsScaled(
      df: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "payload",
      blocks: Int = PHashScaledBlocks,
      bands: Int = PHashScaledBands,
      maxHamming: Int = PHashScaledMaxHamming,
      midMaxHamming: Option[Int] = None): DataFrame = {
    require(bands - maxHamming >= 2,
      s"pHash pairing is exact only when bands - maxHamming >= 2 " +
        s"(band-pair candidates); got bands=$bands, maxHamming=$maxHamming")
    val midCut = midMaxHamming.getOrElse(maxHamming)
    require(midCut >= maxHamming,
      s"midMaxHamming widens the midpoint confirm; narrowing it below " +
        s"maxHamming would break the dual-grid contract (got $midCut < $maxHamming)")
    val words = (blocks + 63) / 64
    // same materialize-once seam as pHashPairs: one exchange of
    // 2·words longs per payload feeds the band join's sides and both
    // midpoint joins
    val sigs = NearDup.seamRepartition(
      pHashSignaturesWide(df, idCol, binCol, blocks), idCol)
    val prim = NearDup.bandedHammingPairs(
      sigs.select(col(idCol) +: (0 until words).map(w => col(s"__sig$w")): _*),
      idCol, widthBits = blocks, bands = bands, hammingMax = maxHamming,
      minSharedBands = 2)
      .distinct()
    val hamM = (0 until words)
      .map(w => bit_count(col(s"__ma$w").bitwiseXOR(col(s"__mb$w"))))
      .reduce(_ + _)
    prim
      .join(sigs.select(col(idCol).as("doc_a") +:
        (0 until words).map(w => col(s"__sigm$w").as(s"__ma$w")): _*), "doc_a")
      .join(sigs.select(col(idCol).as("doc_b") +:
        (0 until words).map(w => col(s"__sigm$w").as(s"__mb$w")): _*), "doc_b")
      .where(hamM <= midCut)
      .select(col("doc_a"), col("doc_b"), col("hamming_dist"))
  }

  /** Full metadata projection over a binary column: one narrow,
    * shuffle-free pass per payload. */
  def describe(
      df: DataFrame,
      binCol: String,
      frames: Int = 3,
      frameBytes: Int = 8): DataFrame = {
    val bin = col(binCol)
    df
      .withColumn("byte_len", byteLen(bin))
      .withColumn("sha256", sha256Hex(bin))
      .withColumn("header_hex", headerHex(bin))
      .withColumn("frames_hex", frameSampleHex(bin, frames, frameBytes))
      .withColumn("decoded", stubDecode(bin))
  }
}
