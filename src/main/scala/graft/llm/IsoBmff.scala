package graft.llm

/** Minimal ISO base-media-file-format (ISO/IEC 14496-12) box parser —
  * enough to read an MP4/MOV/3GP container's presentation metadata
  * without any codec: walk the box tree (`[u32 size][4cc type]`,
  * size 1 → u64 largesize, size 0 → to end-of-enclosure), find
  * `moov/mvhd` for timescale + duration and the first `moov/trak/tkhd`
  * with nonzero 16.16 fixed-point display dimensions.
  *
  * Defensive by construction: every read is bounds-checked, child
  * walks never trust a size beyond the enclosure, and any structural
  * violation yields None rather than a throw — this parses untrusted
  * corpus bytes inside executor tasks. */
private[llm] object IsoBmff {

  final case class VideoMeta(durationMs: Long, width: Int, height: Int)

  /** Container metadata, or None if `bytes` is not ISO-BMFF. */
  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    // cheap sniff: a plausible first box with a known top-level type —
    // rejects non-BMFF bytes before any tree walk
    if (bytes.length < 16) return None
    val firstType = fourCC(bytes, 4)
    if (firstType != "ftyp" && firstType != "moov" && firstType != "mdat" &&
        firstType != "free" && firstType != "wide" && firstType != "skip") return None
    for {
      moov <- findBox(bytes, 0, bytes.length, "moov")
      mvhd <- findBox(bytes, moov._1, moov._2, "mvhd")
      durationMs <- parseMvhd(bytes, mvhd._1, mvhd._2)
    } yield {
      val dims = firstTrackDims(bytes, moov._1, moov._2)
      VideoMeta(durationMs, dims._1, dims._2)
    }
  }

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** First box of `tpe` in [start, end): Some((payloadStart, payloadEnd)). */
  private def findBox(b: Array[Byte], start: Int, end: Int, tpe: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size32 = u32(b, off)
      val boxType = fourCC(b, off + 4)
      var header = 8L
      var size = size32
      if (size32 == 1L) {                 // 64-bit largesize
        if (off + 16 > end) return None
        size = u64(b, off + 8)
        header = 16L
      } else if (size32 == 0L) {          // box extends to end of enclosure
        size = (end - off).toLong
      }
      if (size < header || off + size > end) return None // corrupt size
      if (boxType == tpe) return Some((off + header.toInt, (off + size).toInt))
      off += size.toInt
    }
    None
  }

  /** mvhd → duration in ms: v0 packs timescale@12 duration@16 as u32s,
    * v1 (64-bit times) packs timescale@20 duration@24 as u32/u64. */
  private def parseMvhd(b: Array[Byte], start: Int, end: Int): Option[Long] = {
    if (start + 4 > end) return None
    val version = b(start) & 0xFF
    val (tsOff, durOff, durIs64) =
      if (version == 1) (start + 20, start + 24, true) else (start + 12, start + 16, false)
    if (durOff + (if (durIs64) 8 else 4) > end) return None
    val timescale = u32(b, tsOff)
    val duration = if (durIs64) u64(b, durOff) else u32(b, durOff)
    if (timescale <= 0 || duration < 0) None
    else Some(duration * 1000L / timescale)
  }

  /** Display dims of the first trak whose tkhd has nonzero 16.16 width
    * and height (audio/hint tracks carry zeros); (0, 0) if none. */
  private def firstTrackDims(b: Array[Byte], moovStart: Int, moovEnd: Int): (Int, Int) = {
    var off = moovStart
    while (off < moovEnd) {
      findBox(b, off, moovEnd, "trak") match {
        case None => return (0, 0)
        case Some((trakStart, trakEnd)) =>
          val dims = findBox(b, trakStart, trakEnd, "tkhd") match {
            case Some((s, e)) if s + 4 <= e =>
              val version = b(s) & 0xFF
              // width/height trail the 36-byte matrix; v1 widens the
              // creation/modification/duration fields by 4 bytes each
              val wOff = if (version == 1) s + 88 else s + 76
              if (wOff + 8 <= e)
                ((u32(b, wOff) >> 16).toInt, (u32(b, wOff + 4) >> 16).toInt)
              else (0, 0)
            case _ => (0, 0)
          }
          if (dims._1 > 0 && dims._2 > 0) return dims
          off = trakEnd
      }
    }
    (0, 0)
  }
}
