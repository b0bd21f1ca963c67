package graft.operators

/** Real audio/video metadata decode, header-only and dependency-free — the
  * same contract as [[ImageDecode]]: a STRICT magic sniff gates each parser,
  * corrupt or truncated payloads return None instead of throwing (at 100 TB
  * some payloads WILL be truncated, and a poison row must not kill the
  * task), and no sample/frame data is ever decoded — O(header bytes), not
  * O(media).
  *
  * Formats (both fully specified publicly; no codec library needed for the
  * container headers):
  *   - WAV/RIFF: `RIFF....WAVE` + chunk walk; the `fmt ` chunk carries
  *     channels / sample rate / bits-per-sample, the `data` chunk size with
  *     the fmt byte rate gives duration.
  *   - MP4/ISO-BMFF: length-prefixed box walk; `moov/mvhd` carries
  *     timescale + duration, `moov/trak/tkhd` the 16.16 fixed-point display
  *     dimensions, `moov/trak/mdia/minf/stbl/stsz` the sample (frame) count.
  */
object AvDecode {

  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int, durationMs: Long)
  final case class Mp4Info(durationMs: Long, width: Int, height: Int, nSamples: Long)

  // ---- little-endian / big-endian bounded readers (corrupt-safe) ----
  private def u16le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
  private def u32le(p: Array[Byte], o: Int): Long =
    (p(o) & 0xFFL) | ((p(o + 1) & 0xFFL) << 8) | ((p(o + 2) & 0xFFL) << 16) | ((p(o + 3) & 0xFFL) << 24)
  private def u32be(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xFFL) << 24) | ((p(o + 1) & 0xFFL) << 16) | ((p(o + 2) & 0xFFL) << 8) | (p(o + 3) & 0xFFL)
  private def u64be(p: Array[Byte], o: Int): Long =
    (u32be(p, o) << 32) | u32be(p, o + 4)
  private def fourCC(p: Array[Byte], o: Int): String =
    new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def looksLikeWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      fourCC(p, 0) == "RIFF" && fourCC(p, 8) == "WAVE"

  def looksLikeMp4(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 && fourCC(p, 4) == "ftyp"

  /** Walk the RIFF chunk list; duration derives from the data chunk size and
    * the fmt byte rate. None on anything malformed.
    */
  def wavInfo(p: Array[Byte]): Option[WavInfo] = {
    if (!looksLikeWav(p)) return None
    try {
      var off = 12
      var channels = -1; var sampleRate = -1; var bits = -1
      var byteRate = -1L; var dataSize = -1L
      while (off + 8 <= p.length) {
        val id = fourCC(p, off)
        val size = u32le(p, off + 4)
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= p.length) {
          channels = u16le(p, off + 10)
          sampleRate = u32le(p, off + 12).toInt
          byteRate = u32le(p, off + 16)
          bits = u16le(p, off + 22)
        } else if (id == "data") {
          // the data chunk's payload need not be present (header-only
          // fixture or truncated file) — only its declared size matters
          dataSize = size
        }
        off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        if (size < 0 || size > Int.MaxValue - 8) return None
      }
      if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataSize < 0) None
      else Some(WavInfo(channels, sampleRate, bits, dataSize * 1000L / byteRate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // find the first child box with the given type inside [start, end)
  private def findBox(p: Array[Byte], start: Long, end: Long, typ: String): Option[(Long, Long)] = {
    var off = start
    while (off + 8 <= end) {
      val size = u32be(p, off.toInt)
      val id = fourCC(p, off.toInt + 4)
      val (bodyOff, boxSize) =
        if (size == 1 && off + 16 <= end) (off + 16, u64be(p, off.toInt + 8))
        else (off + 8, size)
      if (boxSize < 8 || off + boxSize > end) return None
      if (id == typ) return Some((bodyOff, off + boxSize))
      off += boxSize
    }
    None
  }

  /** moov/mvhd + first trak's tkhd + its stbl/stsz. None on anything
    * malformed (missing moov, truncated box, bad version fields).
    */
  def mp4Info(p: Array[Byte]): Option[Mp4Info] = {
    if (!looksLikeMp4(p)) return None
    try {
      val end = p.length.toLong
      for {
        (moovB, moovE) <- findBox(p, 0, end, "moov")
        (mvhdB, _) <- findBox(p, moovB, moovE, "mvhd")
        (durMs) <- {
          val v = p(mvhdB.toInt) & 0xFF
          if (v == 1 && mvhdB + 28 + 4 <= moovE) {
            val timescale = u32be(p, mvhdB.toInt + 20)
            val duration = u64be(p, mvhdB.toInt + 24)
            if (timescale > 0) Some(duration * 1000L / timescale) else None
          } else if (v == 0 && mvhdB + 20 + 4 <= moovE) {
            val timescale = u32be(p, mvhdB.toInt + 12)
            val duration = u32be(p, mvhdB.toInt + 16)
            if (timescale > 0) Some(duration * 1000L / timescale) else None
          } else None
        }
        (trakB, trakE) <- findBox(p, moovB, moovE, "trak")
        (tkhdB, tkhdE) <- findBox(p, trakB, trakE, "tkhd")
        dims <- {
          val v = p(tkhdB.toInt) & 0xFF
          val base = if (v == 1) tkhdB + 4 + 8 + 8 + 4 + 4 + 8 else tkhdB + 4 + 4 + 4 + 4 + 4 + 4
          val wOff = base + 8 + 2 + 2 + 2 + 2 + 36 // reserved, layer, alt, volume, reserved, matrix
          if (wOff + 8 <= tkhdE)
            Some(((u32be(p, wOff.toInt) >> 16).toInt, (u32be(p, wOff.toInt + 4) >> 16).toInt))
          else None
        }
      } yield {
        val nSamples = (for {
          (mdiaB, mdiaE) <- findBox(p, trakB, trakE, "mdia")
          (minfB, minfE) <- findBox(p, mdiaB, mdiaE, "minf")
          (stblB, stblE) <- findBox(p, minfB, minfE, "stbl")
          (stszB, stszE) <- findBox(p, stblB, stblE, "stsz")
          n <- if (stszB + 12 <= stszE) Some(u32be(p, stszB.toInt + 8)) else None
        } yield n).getOrElse(0L)
        Mp4Info(durMs, dims._1, dims._2, nSamples)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------------------------------------------------------- fixtures

  /** A genuine (header-complete, silent) PCM WAV file of `nSamples` frames. */
  def wavFixture(channels: Int, sampleRate: Int, nSamples: Int, bitsPerSample: Int = 16): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
    bb.array()
  }

  /** A genuine minimal MP4: ftyp + moov(mvhd, trak(tkhd, mdia(minf(stbl(stsz))))).
    * Version-0 boxes, no media data — exactly the metadata surface the
    * parser reads, byte-laid-out per ISO-BMFF.
    */
  def mp4Fixture(durationMs: Long, timescale: Int, width: Int, height: Int, nFrames: Long): Array[Byte] = {
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(8)
      bb.put("isom".getBytes("US-ASCII")).putInt(512)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(timescale).putInt((durationMs * timescale / 1000L).toInt)
      bb.array()
    })
    val tkhd = box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0).putInt(1).putInt(0) // ctime, mtime, track_id, reserved
        .putInt((durationMs * timescale / 1000L).toInt)
        .put(new Array[Byte](8)) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt_group, volume, reserved
        .put(new Array[Byte](36)) // identity matrix slot (content unread)
        .putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      bb.array()
    })
    val stsz = box("stsz", {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0).putInt(0).putInt(nFrames.toInt) // version, sample_size=0, count
      bb.array()
    })
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }
}
