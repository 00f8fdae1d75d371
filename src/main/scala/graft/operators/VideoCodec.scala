package graft.operators

/** Zero-dependency video decode: AVI (RIFF) containers carrying
  * uncompressed 24bpp DIB frames OR Motion-JPEG frames — pure byte
  * arithmetic plus the in-repo T.81 codec, no codec library, same
  * contract as the image/audio side.
  *
  *  - Container: `RIFF....AVI ` with the standard LIST tree — `hdrl`
  *    (main `avih` header, per-stream `strl` with `strh`/`strf`) and
  *    `movi` (the frame chunks). The walk is tag-driven and skips
  *    unknown chunks by their declared (word-aligned) sizes, so `idx1`
  *    indexes, `JUNK` padding, and extra streams don't derail it.
  *  - DIB frames: `NNdb` / `NNdc` chunks of the first video stream
  *    whose `strf` BITMAPINFOHEADER declares BI_RGB 24bpp — decoded
  *    with the same bottom-up/stride-padded/BGR row arithmetic as BMP.
  *    A BI_RGB `dc` chunk with an actual compressed payload (size ≠
  *    the DIB raster size) → None.
  *  - MOTION-JPEG frames (round 16 — the first COMPRESSED video
  *    codec): a `strf` whose biCompression fourcc is `MJPG` marks each
  *    frame chunk as one complete JPEG stream, decoded by
  *    [[JpegCodec.decode]] (baseline/progressive/arithmetic/lossless —
  *    whatever frame type the payload carries). MJPEG frames are
  *    independent key frames, so stride-k sampling decodes only every
  *    k-th JPEG — non-sampled frames cost a chunk-walk skip, no
  *    entropy work, exactly the shape a 100 TB clip corpus needs. A
  *    frame whose decoded geometry disagrees with the stream header,
  *    or that [[JpegCodec]] rejects, → None.
  *  - Other codecs (H.264/VP9/…) → None: the labeled stub path, like
  *    MP3/AAC on the audio side.
  *  - Frame SAMPLING is first-class: [[decodeSampled]] walks the movi
  *    chunks and materializes only every `stride`-th frame, so a
  *    100-frame clip sampled at stride 10 allocates 10 frames — the
  *    shape a training-data pipeline needs (sample k frames per clip,
  *    featurize, never hold the whole clip).
  *  - Animated GIF rides the same entry point, including (round 16)
  *    full GIF89a COMPOSITING — partial frames, transparency, disposal
  *    methods — see [[decodeGifSampled]].
  *  - ANIMATED WEBP rides it too (round 18): VP8X/ANIM/ANMF chunk walk
  *    with real alpha-blend compositing over VP8L and lossy-VP8
  *    sub-frames (+ ALPH alpha planes) — see [[decodeWebpAnimSampled]].
  *
  * Anything malformed decodes to None, never an exception — corrupt
  * media in a 100 TB crawl is data, not an error.
  *
  * Reference capability: multimodal columns over binary payloads
  * (BASELINE.md north star; video rides the same opaque-binary lane).
  */
object VideoCodec {
  import PixelCodec.PixelImage

  /** Sampled clip: total frame count in the container, the sampled
    * frames (indices 0, stride, 2·stride, …), geometry, and the
    * container kind ("dib" for AVI/DIB, "mjpg" for AVI/Motion-JPEG,
    * "mrle" for AVI/Microsoft-RLE, "gif" for animated GIF, "webp" for
    * animated WebP). */
  final case class VideoClip(width: Int, height: Int, totalFrames: Int,
      sampledIdx: Array[Int], frames: Array[PixelImage],
      container: String = "dib")

  private val MaxPixels = 1 << 26 // per frame, in step with PixelCodec
  private val MaxSampledFrames = 4096

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  def decodeSampled(b: Array[Byte], stride: Int): Option[VideoClip] = {
    if (b == null || b.length < 24 || stride < 1) return None
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return decodeGifSampled(b, stride)
    if (tag(b, 0, "RIFF") && tag(b, 8, "WEBP"))
      return decodeWebpAnimSampled(b, stride)
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var w = 0
    var h = 0
    var topDown = false
    var mjpeg = false
    var mrlePalOff = -1 // ≥ 0 marks an MRLE stream; offset of its RGBQUADs
    var mrleColors = 0
    var moviOff = -1
    var moviEnd = -1

    // pass 1: find the video stream geometry (strf) and the movi LIST.
    // LIST payloads nest, so recurse into hdrl/strl lists.
    def walk(from: Int, to: Int): Boolean = { // false = lost alignment
      var i = from
      while (i + 8 <= to) {
        val size = le32(b, i + 4)
        if (size < 0 || i + 8 + size.toLong > to) return false
        if (tag(b, i, "LIST")) {
          if (size < 4) return false
          if (tag(b, i + 8, "movi")) { moviOff = i + 12; moviEnd = i + 8 + size }
          else if (!walk(i + 12, i + 8 + size)) return false
        } else if (tag(b, i, "strf") && w == 0 && size >= 40) {
          // BITMAPINFOHEADER of the FIRST stream that looks like video;
          // BI_RGB 24bpp or the MJPG fourcc qualify for the real-decode
          // path (biCompression stores the handler fourcc bytes)
          val bw = le32(b, i + 8 + 4)
          val bh = le32(b, i + 8 + 8)
          val bpp = le16(b, i + 8 + 14)
          val compression = le32(b, i + 8 + 16)
          val isMjpg = tag(b, i + 8 + 16, "MJPG")
          // Microsoft RLE8 ('MRLE' handler): 8bpp, biCompression BI_RLE8,
          // palette as RGBQUADs right after the 40-byte header
          val isMrle = bpp == 8 && compression == 1 && bh > 0
          if (bw > 0 && bh != 0 && bh != Int.MinValue &&
              ((bpp == 24 && compression == 0) || isMjpg || isMrle)) {
            w = bw; h = math.abs(bh); topDown = bh < 0; mjpeg = isMjpg
            if (isMrle) {
              val clrUsed = le32(b, i + 8 + 32)
              mrleColors = if (clrUsed == 0) 256 else clrUsed
              if (mrleColors < 1 || mrleColors > 256 ||
                  size < 40 + 4 * mrleColors) { w = 0; mrleColors = 0 }
              else mrlePalOff = i + 8 + 40
            }
          }
        }
        i += 8 + size + (size & 1)
      }
      true
    }
    if (!walk(12, b.length)) return None
    if (w <= 0 || h <= 0 || moviOff < 0) return None
    if (w.toLong * h > MaxPixels) return None

    val rasterStride = ((w * 3 + 3) / 4) * 4
    val rasterSize = rasterStride * h
    val idx = new scala.collection.mutable.ArrayBuffer[Int]()
    val frames = new scala.collection.mutable.ArrayBuffer[PixelImage]()
    // MRLE state: palette indices accumulate across frames — pixels a
    // delta frame skips show the previous frame through, the codec's
    // whole inter-frame compression scheme (so EVERY frame's stream
    // must decode regardless of stride, like composited GIF)
    val mrleCanvas = if (mrlePalOff >= 0) new Array[Byte](w * h) else null
    var total = 0
    var i = moviOff
    while (i + 8 <= moviEnd) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size.toLong > moviEnd) return None
      // frame chunk ids are '<2-digit stream>db'/'dc' ('00db', '01dc', …)
      val isFrame = b(i) >= '0' && b(i) <= '9' && b(i + 1) >= '0' &&
        b(i + 1) <= '9' && b(i + 2) == 'd' && (b(i + 3) == 'b' || b(i + 3) == 'c')
      if (isFrame && mrleCanvas != null) {
        if (!PixelCodec.rle8DecodeInto(b, i + 8, i + 8 + size, w, h, mrleCanvas))
          return None
        if (total % stride == 0) {
          if (frames.length >= MaxSampledFrames) return None
          val rgb = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            val ci = mrleCanvas(p) & 0xff
            if (ci >= mrleColors) return None
            rgb(p * 3) = b(mrlePalOff + ci * 4 + 2) // RGBQUAD is BGRX
            rgb(p * 3 + 1) = b(mrlePalOff + ci * 4 + 1)
            rgb(p * 3 + 2) = b(mrlePalOff + ci * 4)
            p += 1
          }
          idx += total
          frames += PixelImage(w, h, rgb)
        }
        total += 1
      } else if (isFrame && mjpeg) {
        // each chunk is one complete JPEG; frames are independent key
        // frames, so ONLY sampled frames pay the entropy/IDCT work —
        // but EVERY chunk passes the cheap structural check (size + SOI
        // marker), so accept/reject cannot depend on the stride: a clip
        // with one corrupt frame is a stub row at every stride, not just
        // the strides that happen to sample it
        if (size < 4 || (b(i + 8) & 0xff) != 0xff || (b(i + 9) & 0xff) != 0xd8)
          return None
        if (total % stride == 0) {
          if (frames.length >= MaxSampledFrames) return None
          val payload = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + size)
          val img = JpegCodec.decode(payload).getOrElse(return None)
          if (img.width != w || img.height != h) return None
          idx += total
          frames += img
        }
        total += 1
      } else if (isFrame) {
        if (size != rasterSize) return None // compressed payload → stub path
        if (total % stride == 0) {
          if (frames.length >= MaxSampledFrames) return None
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val srcRow = if (topDown) y else h - 1 - y // DIB default: bottom-up
            var x = 0
            var src = i + 8 + srcRow * rasterStride
            var dst = y * w * 3
            while (x < w) {
              rgb(dst) = b(src + 2) // BGR on disk
              rgb(dst + 1) = b(src + 1)
              rgb(dst + 2) = b(src)
              x += 1; src += 3; dst += 3
            }
            y += 1
          }
          idx += total
          frames += PixelImage(w, h, rgb)
        }
        total += 1
      }
      i += 8 + size + (size & 1)
    }
    if (total == 0) return None
    Some(VideoClip(w, h, total, idx.toArray, frames.toArray,
      if (mjpeg) "mjpg" else if (mrleCanvas != null) "mrle" else "dib"))
  }

  /** ANIMATED WEBP (round 18) as a frame-sampled video source: a
    * RIFF/WEBP container whose VP8X header carries the animation flag,
    * rendered per the container spec's compositing model —
    *
    *  - ANMF frames place a sub-image at an even (x, y) offset on the
    *    canvas; the blending bit selects alpha-blend ("over" operator,
    *    straight alpha) or overwrite; the disposal bit optionally fills
    *    the frame rectangle with the ANIM background color AFTER
    *    display.
    *  - Frame pixels come from the in-repo decoders: VP8L sub-frames
    *    keep their own alpha ([[WebpCodec.decodeVp8lArgb]]); lossy VP8
    *    sub-frames ([[Vp8Codec]]) are opaque unless an ALPH chunk
    *    supplies the alpha plane ([[WebpCodec.decodeAlph]] — raw or
    *    lossless tier, all four prediction filters).
    *  - The canvas is initialized to the ANIM background color, and
    *    sampled snapshots are flattened over that color (PixelImage is
    *    RGB; the spec leaves under-canvas presentation to the viewer, so
    *    the fixture discipline keeps oracle rows fully opaque where any
    *    rounding choice would show).
    *
    * Like composited GIF, frame N depends on frames < N, so every
    * ANMF's pixels decode regardless of stride, bounded by the same
    * total-pixel-work cap. Alpha-blend integer spelling: with frame
    * alpha aF and canvas alpha aC, a·255 = 255·aF + aC·(255−aF) and
    * each channel is round-half-up of (f·aF·255 + c·aC·(255−aF)) / a·255
    * — exact whenever aF ∈ {0, 255} or both pixels are opaque. */
  private def decodeWebpAnimSampled(b: Array[Byte], stride: Int): Option[VideoClip] = {
    def le24(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
    // VP8X must lead and carry the animation flag (bit 0x02); a still
    // WebP (VP8/VP8L/VP8X-still) is not a video → None, stub row
    if (b.length < 30 || !tag(b, 12, "VP8X")) return None
    val vp8xSize = le32(b, 16)
    if (vp8xSize < 10 || 20 + vp8xSize.toLong > b.length) return None
    if (((b(20) & 0xff) & 0x02) == 0) return None
    val w = le24(24) + 1
    val h = le24(27) + 1
    if (w.toLong * h > MaxPixels) return None

    var bgArgb = 0
    var sawAnim = false
    var sawLossyVp8 = false
    val canvas = new Array[Int](w * h)
    val idx = new scala.collection.mutable.ArrayBuffer[Int]()
    val frames = new scala.collection.mutable.ArrayBuffer[PixelImage]()
    var total = 0
    var work = 0L

    def flatten(): PixelImage = { // canvas over the (opaque) bg color
      val rgb = new Array[Byte](w * h * 3)
      var k = 0
      while (k < w * h) {
        val c = canvas(k)
        val ac = c >>> 24
        var sh = 16
        var o = k * 3
        while (sh >= 0) {
          val cc = (c >> sh) & 0xff
          val bgc = (bgArgb >> sh) & 0xff
          rgb(o) = (if (ac == 255) cc
                    else (cc * ac + bgc * (255 - ac) + 127) / 255).toByte
          sh -= 8; o += 1
        }
        k += 1
      }
      PixelImage(w, h, rgb)
    }

    var i = 20 + vp8xSize + (vp8xSize & 1)
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size.toLong > b.length) return None
      if (tag(b, i, "ANIM")) {
        if (size < 6 || sawAnim) return None
        // background color is [B, G, R, A] byte order on disk
        bgArgb = ((b(i + 11) & 0xff) << 24) | ((b(i + 10) & 0xff) << 16) |
          ((b(i + 9) & 0xff) << 8) | (b(i + 8) & 0xff)
        java.util.Arrays.fill(canvas, bgArgb)
        sawAnim = true
      } else if (tag(b, i, "ANMF")) {
        if (!sawAnim || size < 16) return None
        val fx = 2 * le24(i + 8)
        val fy = 2 * le24(i + 11)
        val fw = le24(i + 14) + 1
        val fh = le24(i + 17) + 1
        val fl = b(i + 23) & 0xff // |reserved(6)|B|D|
        val noBlend = (fl & 0x02) != 0
        val disposeBg = (fl & 0x01) != 0
        if (fx.toLong + fw > w || fy.toLong + fh > h) return None
        work += fw.toLong * fh + w.toLong * h
        if (work > (1L << 28)) return None // CPU bound → stub path
        // frame data: optional ALPH, then exactly one VP8/VP8L chunk
        var j = i + 24 // 8-byte chunk header + 16-byte ANMF frame header
        val end = i + 8 + size
        var alphaPlane: Array[Byte] = null
        var sub: Array[Int] = null
        while (j + 8 <= end && sub == null) {
          val ssz = le32(b, j + 4)
          if (ssz < 0 || j + 8 + ssz.toLong > end) return None
          if (tag(b, j, "ALPH")) {
            if (alphaPlane != null) return None
            alphaPlane = WebpCodec.decodeAlph(b, j + 8, ssz, fw, fh)
              .getOrElse(return None)
          } else if (tag(b, j, "VP8L")) {
            // VP8L carries its own alpha; an ALPH alongside it is
            // ignored (the spec says it SHOULD NOT be present)
            val (sw, sh, argb) = WebpCodec.decodeVp8lArgb(b, j + 8, ssz)
              .getOrElse(return None)
            if (sw != fw || sh != fh) return None
            sub = argb
          } else if (tag(b, j, "VP8 ")) {
            sawLossyVp8 = true // lossy frames: unverified-probs caveat
            val img = Vp8Codec.decodeFrame(b, j + 8, ssz).getOrElse(return None)
            if (img.width != fw || img.height != fh) return None
            sub = new Array[Int](fw * fh)
            var k = 0
            while (k < sub.length) {
              val a = if (alphaPlane != null) alphaPlane(k) & 0xff else 255
              sub(k) = (a << 24) | ((img.rgb(k * 3) & 0xff) << 16) |
                ((img.rgb(k * 3 + 1) & 0xff) << 8) | (img.rgb(k * 3 + 2) & 0xff)
              k += 1
            }
          } else return None // unknown chunk inside ANMF
          j += 8 + ssz + (ssz & 1)
        }
        if (sub == null) return None
        var yy = 0
        while (yy < fh) {
          var xx = 0
          val rowBase = (fy + yy) * w + fx
          while (xx < fw) {
            val fp = sub(yy * fw + xx)
            canvas(rowBase + xx) =
              if (noBlend) fp else blendOver(fp, canvas(rowBase + xx))
            xx += 1
          }
          yy += 1
        }
        if (total % stride == 0) {
          if (frames.length >= MaxSampledFrames) return None
          idx += total
          frames += flatten()
        }
        if (disposeBg) { // AFTER display: frame rect → background color
          var ry = 0
          while (ry < fh) {
            java.util.Arrays.fill(canvas, (fy + ry) * w + fx,
              (fy + ry) * w + fx + fw, bgArgb)
            ry += 1
          }
        }
        total += 1
      } // else: skip ICCP/EXIF/XMP/unknown chunks
      i += 8 + size + (size & 1)
    }
    if (total == 0) return None
    // Clips containing any lossy-VP8 sub-frame carry the caveat label:
    // those frames decode under self-consistent probability tables, not
    // offline-verified spec constants ([[Vp8Codec]] HONESTY NOTE).
    Some(VideoClip(w, h, total, idx.toArray, frames.toArray,
      if (sawLossyVp8) "webp-vp8-unverified-probs" else "webp"))
  }

  /** Straight-alpha "over" compositing of frame pixel `f` onto canvas
    * pixel `c` (both 0xAARRGGBB), the container spec's blend formula in
    * exact integer form; round-half-up on the single divide. */
  private def blendOver(f: Int, c: Int): Int = {
    val af = f >>> 24
    if (af == 255) return f
    if (af == 0) return c
    val ac = c >>> 24
    val a255 = 255 * af + ac * (255 - af) // blended alpha × 255
    if (a255 == 0) return 0
    def ch(sh: Int): Int = {
      val num = ((f >> sh) & 0xff).toLong * af * 255 +
        ((c >> sh) & 0xff).toLong * ac * (255 - af)
      ((num + a255 / 2) / a255).toInt
    }
    (((a255 + 127) / 255) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** Animated GIF as a frame-sampled video source, in two tiers:
    *
    *  - STANDALONE fast path: every frame is a full-canvas opaque image
    *    (left/top 0, frame size = logical screen size, no GCE
    *    transparency) — each frame renders independently, so non-sampled
    *    frames are skipped at the CONTAINER level (sub-block walk, no
    *    LZW work): stride-k sampling of an n-frame GIF decodes n/k
    *    frames.
    *  - COMPOSITED path (round 16 — closes the r15 stub): partial
    *    frames, GCE transparency, and disposal methods 2 (restore to
    *    background) / 3 (restore to previous) render against a
    *    maintained canvas per the GIF89a semantics — transparent pixels
    *    leave the canvas untouched, disposal applies AFTER the frame is
    *    displayed, "background" is the logical-screen background color
    *    (black when no global table). Frame N depends on frames < N, so
    *    EVERY frame's LZW stream must decode regardless of stride — the
    *    honest cost of composited GIFs, bounded by a total-pixel-work
    *    cap (≈256 M composite pixel ops) beyond which the payload takes
    *    the labeled stub path rather than unbounded CPU.
    *
    * A cheap structure-only pre-scan (no LZW) picks the tier. */
  private def decodeGifSampled(b: Array[Byte], stride: Int): Option[VideoClip] =
    gifNeedsCompositing(b) match {
      case None => None // malformed block structure
      case Some(true) => decodeGifComposited(b, stride)
      case Some(false) => decodeGifStandalone(b, stride)
    }

  /** Structure-only walk: does any frame need canvas composition
    * (partial placement, transparency, disposal 2/3)? None = malformed. */
  private def gifNeedsCompositing(b: Array[Byte]): Option[Boolean] = {
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val packed = b(10) & 0xff
    var i = 13
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1))
    var needs = false
    var sawFrame = false
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 =>
          if (i + 1 >= b.length) return None
          if ((b(i + 1) & 0xff) == 0xf9) {
            if (i + 4 >= b.length) return None
            val flags = b(i + 3) & 0xff
            if ((flags & 1) != 0 || ((flags >> 2) & 7) >= 2) needs = true
          }
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c =>
          if (i + 10 > b.length) return None
          val left = (b(i + 1) & 0xff) | ((b(i + 2) & 0xff) << 8)
          val top = (b(i + 3) & 0xff) | ((b(i + 4) & 0xff) << 8)
          val iw = (b(i + 5) & 0xff) | ((b(i + 6) & 0xff) << 8)
          val ih = (b(i + 7) & 0xff) | ((b(i + 8) & 0xff) << 8)
          if (left != 0 || top != 0 || iw != w || ih != h) needs = true
          val p2 = b(i + 9) & 0xff
          i += 10
          if ((p2 & 0x80) != 0) i += 3 * (1 << ((p2 & 7) + 1))
          if (i >= b.length) return None
          i += 1 // min code size
          while (i < b.length && (b(i) & 0xff) != 0) {
            val len = b(i) & 0xff
            if (i + 1 + len > b.length) return None
            i += 1 + len
          }
          if (i >= b.length) return None
          i += 1
          sawFrame = true
        case 0x3b => return if (sawFrame) Some(needs) else None
        case _ => return None
      }
    }
    None // no trailer
  }

  /** GIF89a canvas composition: decode EVERY frame's indices, blit onto
    * the canvas honoring transparency, snapshot sampled frames, then
    * apply the frame's disposal. */
  private def decodeGifComposited(b: Array[Byte], stride: Int): Option[VideoClip] = {
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val packed = b(10) & 0xff
    val bgIndex = b(11) & 0xff
    var i = 13
    val gct: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val size = 3 * (1 << ((packed & 7) + 1))
        if (i + size > b.length) return None
        val t = java.util.Arrays.copyOfRange(b, i, i + size); i += size; t
      } else null
    // background color: logical-screen background index into the global
    // table when present and in range, else black — the opaque-RGB
    // reading of the spec (we have no alpha channel to hand through)
    val bg = new Array[Byte](3)
    if (gct != null && bgIndex < gct.length / 3)
      System.arraycopy(gct, bgIndex * 3, bg, 0, 3)
    val canvas = new Array[Byte](w * h * 3)
    var p = 0
    while (p < canvas.length) { // init to background
      canvas(p) = bg(0); canvas(p + 1) = bg(1); canvas(p + 2) = bg(2)
      p += 3
    }
    val idx = new scala.collection.mutable.ArrayBuffer[Int]()
    val frames = new scala.collection.mutable.ArrayBuffer[PixelImage]()
    var total = 0
    var work = 0L // composite pixel ops — the CPU bound
    var disposal = 0
    var transIdx = -1
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 =>
          if (i + 1 >= b.length) return None
          if ((b(i + 1) & 0xff) == 0xf9) {
            if (i + 6 >= b.length) return None // reads through b(i+6)
            val flags = b(i + 3) & 0xff
            disposal = (flags >> 2) & 7
            transIdx = if ((flags & 1) != 0) b(i + 6) & 0xff else -1
          }
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c =>
          if (i + 10 > b.length) return None
          val left = (b(i + 1) & 0xff) | ((b(i + 2) & 0xff) << 8)
          val top = (b(i + 3) & 0xff) | ((b(i + 4) & 0xff) << 8)
          val iw = (b(i + 5) & 0xff) | ((b(i + 6) & 0xff) << 8)
          val ih = (b(i + 7) & 0xff) | ((b(i + 8) & 0xff) << 8)
          if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h) return None
          val p2 = b(i + 9) & 0xff
          val interlaced = (p2 & 0x40) != 0
          i += 10
          val palette: Array[Byte] =
            if ((p2 & 0x80) != 0) {
              val size = 3 * (1 << ((p2 & 7) + 1))
              if (i + size > b.length) return None
              val t = java.util.Arrays.copyOfRange(b, i, i + size); i += size; t
            } else gct
          if (palette == null) return None
          if (i >= b.length) return None
          val minCodeSize = b(i) & 0xff; i += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          work += iw.toLong * ih
          if (work > (1L << 28)) return None // CPU bound → stub path
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && (b(i) & 0xff) != 0) {
            val len = b(i) & 0xff
            if (i + 1 + len > b.length) return None
            data.write(b, i + 1, len)
            i += 1 + len
          }
          if (i >= b.length) return None
          i += 1 // sub-block terminator
          val indices = PixelCodec.lzwDecode(data.toByteArray, minCodeSize,
            iw * ih).getOrElse(return None)
          val nColors = palette.length / 3
          // disposal 3 restores the pre-draw canvas afterwards
          val saved = if (disposal == 3) canvas.clone() else null
          var row = 0
          var src = 0
          while (row < ih) {
            val destRow = top +
              (if (interlaced) PixelCodec.deinterlaceRow(row, ih) else row)
            var x = 0
            while (x < iw) {
              val ci = indices(src)
              if (ci >= nColors) return None
              if (ci != transIdx) { // transparent: canvas shows through
                val o = (destRow * w + left + x) * 3
                canvas(o) = palette(ci * 3)
                canvas(o + 1) = palette(ci * 3 + 1)
                canvas(o + 2) = palette(ci * 3 + 2)
              }
              x += 1; src += 1
            }
            row += 1
          }
          if (total % stride == 0) {
            if (frames.length >= MaxSampledFrames) return None
            idx += total
            frames += PixelImage(w, h, canvas.clone())
          }
          // disposal applies AFTER display
          disposal match {
            case 2 => // restore the frame REGION to background
              var ry = 0
              while (ry < ih) {
                var rx = 0
                val base = ((top + ry) * w + left) * 3
                while (rx < iw) {
                  canvas(base + rx * 3) = bg(0)
                  canvas(base + rx * 3 + 1) = bg(1)
                  canvas(base + rx * 3 + 2) = bg(2)
                  rx += 1
                }
                ry += 1
              }
            case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
            case _ => // 0/1: leave the canvas as displayed
          }
          disposal = 0
          transIdx = -1
          total += 1
        case 0x3b =>
          return if (total == 0) None
          else Some(VideoClip(w, h, total, idx.toArray, frames.toArray, "gif"))
        case _ => return None
      }
    }
    None // no trailer
  }

  private def decodeGifStandalone(b: Array[Byte], stride: Int): Option[VideoClip] = {
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val packed = b(10) & 0xff
    var i = 13
    val gct: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val size = 3 * (1 << ((packed & 7) + 1))
        if (i + size > b.length) return None
        val t = java.util.Arrays.copyOfRange(b, i, i + size); i += size; t
      } else null
    val idx = new scala.collection.mutable.ArrayBuffer[Int]()
    val frames = new scala.collection.mutable.ArrayBuffer[PixelImage]()
    var total = 0
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension
          if (i + 1 >= b.length) return None
          val label = b(i + 1) & 0xff
          if (label == 0xf9) { // graphic control: transparency needs compositing
            if (i + 4 >= b.length) return None
            if ((b(i + 3) & 1) != 0) return None
          }
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val left = (b(i + 1) & 0xff) | ((b(i + 2) & 0xff) << 8)
          val top = (b(i + 3) & 0xff) | ((b(i + 4) & 0xff) << 8)
          val iw = (b(i + 5) & 0xff) | ((b(i + 6) & 0xff) << 8)
          val ih = (b(i + 7) & 0xff) | ((b(i + 8) & 0xff) << 8)
          val p2 = b(i + 9) & 0xff
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          val interlaced = (p2 & 0x40) != 0
          i += 10
          val palette: Array[Byte] =
            if ((p2 & 0x80) != 0) {
              val size = 3 * (1 << ((p2 & 7) + 1))
              if (i + size > b.length) return None
              val t = java.util.Arrays.copyOfRange(b, i, i + size); i += size; t
            } else gct
          if (palette == null) return None
          if (i >= b.length) return None
          val minCodeSize = b(i) & 0xff; i += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          val sampled = total % stride == 0
          if (sampled && frames.length >= MaxSampledFrames) return None
          val data = if (sampled) new java.io.ByteArrayOutputStream() else null
          while (i < b.length && (b(i) & 0xff) != 0) {
            val len = b(i) & 0xff
            if (i + 1 + len > b.length) return None
            if (sampled) data.write(b, i + 1, len)
            i += 1 + len
          }
          if (i >= b.length) return None
          i += 1 // sub-block terminator
          if (sampled) {
            val indices = PixelCodec.lzwDecode(data.toByteArray, minCodeSize,
              w * h).getOrElse(return None)
            val rgb = new Array[Byte](w * h * 3)
            val nColors = palette.length / 3
            var y = 0
            var src = 0
            while (y < h) {
              val destRow = if (interlaced) PixelCodec.deinterlaceRow(y, h) else y
              var x = 0
              while (x < w) {
                val ci = indices(src)
                if (ci >= nColors) return None
                val o = (destRow * w + x) * 3
                rgb(o) = palette(ci * 3)
                rgb(o + 1) = palette(ci * 3 + 1)
                rgb(o + 2) = palette(ci * 3 + 2)
                x += 1; src += 1
              }
              y += 1
            }
            idx += total
            frames += PixelImage(w, h, rgb)
          }
          total += 1
        case 0x3b =>
          return if (total == 0) None
          else Some(VideoClip(w, h, total, idx.toArray, frames.toArray, "gif"))
        case _ => return None // lost block alignment
      }
    }
    None // no trailer
  }

  /** Real animated-GIF bytes (fixtures + tests): GIF89a, every frame a
    * full-canvas opaque image with its own LOCAL color table and an
    * uncompressed-LZW pixel stream (same spec-compliant trick as
    * [[PixelCodec.encodeGif]]), GCE per frame with no transparency. */
  def encodeGifAnim(width: Int, height: Int, nFrames: Int,
      px: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 &&
      width.toLong * height <= MaxPixels)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    wle16(width); wle16(height)
    w8(0); w8(0); w8(0) // no global color table
    var f = 0
    while (f < nFrames) {
      // one single-frame encode gives us descriptor+local-table+LZW;
      // strip its 13-byte header and trailing 0x3b trailer, then flip
      // the "global" table bits into the local-table form
      val one = PixelCodec.encodeGif(width, height, (x, y) => px(f, x, y))
      val gctPacked = one(10) & 0xff
      val tableBytes = 3 * (1 << ((gctPacked & 7) + 1))
      // graphic control extension: no transparency, disposal 1
      w8(0x21); w8(0xf9); w8(4); w8(0x04); wle16(5); w8(0); w8(0)
      w8(0x2c); wle16(0); wle16(0); wle16(width); wle16(height)
      w8(0x80 | (gctPacked & 7)) // local color table, same size bits
      out.write(one, 13, tableBytes) // the palette
      // the image payload: skip the original descriptor (10 bytes after
      // the table) and copy through to (but not including) the trailer
      val payloadStart = 13 + tableBytes + 10
      out.write(one, payloadStart, one.length - payloadStart - 1)
      f += 1
    }
    w8(0x3b)
    out.toByteArray
  }

  /** One frame of a COMPOSITED animated-GIF fixture: placed at
    * (left, top), sized fw×fh, with `disposal` (0/1 leave, 2 restore-
    * background, 3 restore-previous) and an optional transparent
    * SENTINEL color — pixels px returns as `transparentColor` are coded
    * with the GCE transparent index (the canvas shows through). The
    * sentinel must be a color the frame doesn't otherwise use. */
  final case class GifFrame(left: Int, top: Int, fw: Int, fh: Int,
      disposal: Int, px: (Int, Int) => (Int, Int, Int),
      transparentColor: Option[(Int, Int, Int)] = None)

  /** Real composited animated-GIF bytes (fixtures + tests): partial
    * placement, per-frame disposal, and GCE transparency — the feature
    * set [[decodeGifSampled]]'s composited tier renders. Reuses the
    * single-frame GIF encoder per frame (its palette includes the
    * sentinel color, whose local index becomes the GCE transparent
    * index), then patches the descriptor's placement. */
  def encodeGifAnimComposited(width: Int, height: Int,
      frames: Seq[GifFrame], bgIndexColor: Option[(Int, Int, Int)] = None)
      : Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty)
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.fw > 0 && f.fh > 0 &&
        f.left + f.fw <= width && f.top + f.fh <= height &&
        f.disposal >= 0 && f.disposal <= 3)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    wle16(width); wle16(height)
    bgIndexColor match {
      case Some((r, g, bl)) =>
        // 2-entry global table just to carry the background color at
        // index 0 (logical-screen background index = 0)
        w8(0x80); w8(0); w8(0)
        w8(r); w8(g); w8(bl); w8(0); w8(0); w8(0)
      case None =>
        w8(0); w8(0); w8(0) // no global table → background is black
    }
    frames.foreach { f =>
      val one = PixelCodec.encodeGif(f.fw, f.fh, f.px)
      val gctPacked = one(10) & 0xff
      val tableBytes = 3 * (1 << ((gctPacked & 7) + 1))
      // locate the sentinel color inside the per-frame palette
      val transIdx = f.transparentColor.map { case (r, g, bl) =>
        val n = tableBytes / 3
        val found = (0 until n).find(ci =>
          (one(13 + ci * 3) & 0xff) == r && (one(13 + ci * 3 + 1) & 0xff) == g &&
            (one(13 + ci * 3 + 2) & 0xff) == bl)
        found.getOrElse(throw new IllegalArgumentException(
          s"transparent sentinel ($r,$g,$bl) not present in frame"))
      }
      // GCE: disposal + optional transparency
      w8(0x21); w8(0xf9); w8(4)
      w8((f.disposal << 2) | (if (transIdx.isDefined) 1 else 0))
      wle16(5); w8(transIdx.getOrElse(0)); w8(0)
      // descriptor with the real placement; local color table follows
      w8(0x2c); wle16(f.left); wle16(f.top); wle16(f.fw); wle16(f.fh)
      w8(0x80 | (gctPacked & 7))
      out.write(one, 13, tableBytes)
      val payloadStart = 13 + tableBytes + 10
      out.write(one, payloadStart, one.length - payloadStart - 1)
    }
    w8(0x3b)
    out.toByteArray
  }

  /** One frame of an animated-WebP fixture: placed at the EVEN offset
    * (left, top) — ANMF stores x/2, y/2 — sized fw×fh. `blend` selects
    * alpha-blend vs overwrite; `disposeBg` fills the rect with the ANIM
    * background after display. `argb(x, y)` gives 0xAARRGGBB pixels
    * (frame-local coords), carried as a real VP8L sub-stream with
    * per-pixel alpha; `raw` instead supplies explicit (fourcc, payload)
    * frame-data chunks — the lossy-VP8 / ALPH spellings. */
  final case class WebpFrame(left: Int, top: Int, fw: Int, fh: Int,
      blend: Boolean = true, disposeBg: Boolean = false,
      argb: (Int, Int) => Int = null,
      raw: Seq[(String, Array[Byte])] = Nil)

  /** Real animated-WebP bytes (fixtures + tests): VP8X with the
    * animation flag + ANIM (background color, infinite loop) + one ANMF
    * chunk per frame, each nesting its VP8L (or raw) frame data. */
  def encodeWebpAnim(width: Int, height: Int, frames: Seq[WebpFrame],
      bgArgb: Int = 0xff000000): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty &&
      width <= (1 << 24) && height <= (1 << 24) &&
      width.toLong * height <= MaxPixels)
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.left % 2 == 0 && f.top % 2 == 0 &&
        f.fw > 0 && f.fh > 0 && f.left + f.fw <= width &&
        f.top + f.fh <= height && (f.argb != null || f.raw.nonEmpty))
    }
    val body = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = body.write(v & 0xff)
    def wle24(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16) }
    def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    def wtag(t: String): Unit = t.foreach(c => w8(c))
    def chunk(tag: String, payload: Array[Byte]): Unit = {
      wtag(tag); wle32(payload.length)
      body.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) w8(0)
    }
    // VP8X: animation + alpha flags, 24-bit reserved, canvas w-1 / h-1
    chunk("VP8X", {
      val p = new java.io.ByteArrayOutputStream()
      p.write(0x12); p.write(0); p.write(0); p.write(0) // A + L flags
      def p24(v: Int): Unit = { p.write(v & 0xff); p.write((v >> 8) & 0xff); p.write((v >> 16) & 0xff) }
      p24(width - 1); p24(height - 1)
      p.toByteArray
    })
    // ANIM: background color in [B, G, R, A] byte order, loop count 0
    chunk("ANIM", Array[Byte](
      (bgArgb & 0xff).toByte, ((bgArgb >> 8) & 0xff).toByte,
      ((bgArgb >> 16) & 0xff).toByte, ((bgArgb >>> 24) & 0xff).toByte,
      0, 0))
    frames.foreach { f =>
      val data = new java.io.ByteArrayOutputStream()
      def dchunk(tag: String, payload: Array[Byte]): Unit = {
        tag.foreach(c => data.write(c))
        data.write(payload.length & 0xff); data.write((payload.length >> 8) & 0xff)
        data.write((payload.length >> 16) & 0xff); data.write((payload.length >> 24) & 0xff)
        data.write(payload, 0, payload.length)
        if ((payload.length & 1) == 1) data.write(0)
      }
      if (f.raw.nonEmpty) f.raw.foreach { case (t, p) => dchunk(t, p) }
      else dchunk("VP8L", WebpCodec.encodeVp8lChunk(f.fw, f.fh, f.argb))
      val payload = data.toByteArray
      wtag("ANMF"); wle32(16 + payload.length)
      wle24(f.left / 2); wle24(f.top / 2)
      wle24(f.fw - 1); wle24(f.fh - 1)
      wle24(100) // duration ms
      w8((if (f.blend) 0 else 0x02) | (if (f.disposeBg) 1 else 0))
      body.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) w8(0)
    }
    val inner = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def o8(v: Int): Unit = out.write(v & 0xff)
    "RIFF".foreach(c => o8(c))
    val total = 4 + inner.length
    o8(total); o8(total >> 8); o8(total >> 16); o8(total >> 24)
    "WEBP".foreach(c => o8(c))
    out.write(inner, 0, inner.length)
    out.toByteArray
  }

  // ------------------------------------------------------------- encode

  /** Real AVI bytes (fixtures + round-trip tests): one 'vids'/'DIB '
    * stream, `nFrames` uncompressed 24bpp bottom-up DIB frames from
    * `px(frame, x, y)`, spec-correct hdrl/strl headers and an idx1
    * index (which the decoder must skip over). */
  def encodeAvi(width: Int, height: Int, nFrames: Int,
      px: (Int, Int, Int) => (Int, Int, Int), fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0 &&
      width.toLong * height <= MaxPixels)
    val rasterStride = ((width * 3 + 3) / 4) * 4
    val rasterSize = rasterStride * height
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    def wtag(t: String): Unit = t.foreach(c => w8(c))

    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + nFrames * (8 + rasterSize)
    val idx1Size = nFrames * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    wtag("RIFF"); wle32(riffSize); wtag("AVI ")
    wtag("LIST"); wle32(hdrlSize); wtag("hdrl")
    wtag("avih"); wle32(56)
    wle32(1000000 / fps) // µs per frame
    wle32(rasterSize * fps); wle32(0); wle32(0x10) // maxBytesPerSec, pad, HASINDEX
    wle32(nFrames); wle32(0); wle32(1); wle32(rasterSize)
    wle32(width); wle32(height)
    wle32(0); wle32(0); wle32(0); wle32(0) // reserved
    wtag("LIST"); wle32(4 + (8 + 56) + (8 + 40)); wtag("strl")
    wtag("strh"); wle32(56)
    wtag("vids"); wtag("DIB ")
    wle32(0); wle16(0); wle16(0); wle32(0) // flags, prio, lang, initFrames
    wle32(1); wle32(fps) // scale, rate
    wle32(0); wle32(nFrames); wle32(rasterSize)
    wle32(-1); wle32(0) // quality, sampleSize
    wle16(0); wle16(0); wle16(width); wle16(height) // rcFrame
    wtag("strf"); wle32(40)
    wle32(40); wle32(width); wle32(height)
    wle16(1); wle16(24); wle32(0); wle32(rasterSize) // planes, bpp, BI_RGB
    wle32(2835); wle32(2835); wle32(0); wle32(0)
    wtag("LIST"); wle32(moviSize); wtag("movi")
    var f = 0
    while (f < nFrames) {
      wtag("00db"); wle32(rasterSize)
      var row = height - 1 // bottom-up
      while (row >= 0) {
        var x = 0
        var written = 0
        while (x < width) {
          val (r, g, bl) = px(f, x, row)
          w8(bl); w8(g); w8(r)
          written += 3; x += 1
        }
        while (written < rasterStride) { w8(0); written += 1 }
        row -= 1
      }
      f += 1
    }
    wtag("idx1"); wle32(idx1Size)
    var off = 4 // offsets are relative to the 'movi' tag
    f = 0
    while (f < nFrames) {
      wtag("00db"); wle32(0x10); wle32(off); wle32(rasterSize) // AVIIF_KEYFRAME
      off += 8 + rasterSize
      f += 1
    }
    out.toByteArray
  }

  /** Real Motion-JPEG AVI bytes (fixtures + round-trip tests): one
    * 'vids'/'MJPG' stream whose `00dc` chunks each carry one complete
    * JPEG from [[JpegCodec.encodeJpeg]] (grayscale when `gray` — the
    * block-constant-exact fixture shape, see the JpegCodec object doc).
    * Variable-size chunks exercise the word-alignment stepping the
    * fixed-raster DIB path never does; idx1 records real sizes. */
  def encodeAviMjpeg(width: Int, height: Int, nFrames: Int,
      px: (Int, Int, Int) => (Int, Int, Int), fps: Int = 10,
      gray: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0 &&
      width.toLong * height <= MaxPixels)
    val payloads = Array.tabulate(nFrames) { f =>
      JpegCodec.encodeJpeg(width, height, (x, y) => px(f, x, y), gray = gray)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    def wtag(t: String): Unit = t.foreach(c => w8(c))

    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val idx1Size = nFrames * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val maxPayload = payloads.map(_.length).max

    wtag("RIFF"); wle32(riffSize); wtag("AVI ")
    wtag("LIST"); wle32(hdrlSize); wtag("hdrl")
    wtag("avih"); wle32(56)
    wle32(1000000 / fps) // µs per frame
    wle32(maxPayload * fps); wle32(0); wle32(0x10) // maxBytesPerSec, pad, HASINDEX
    wle32(nFrames); wle32(0); wle32(1); wle32(maxPayload)
    wle32(width); wle32(height)
    wle32(0); wle32(0); wle32(0); wle32(0) // reserved
    wtag("LIST"); wle32(4 + (8 + 56) + (8 + 40)); wtag("strl")
    wtag("strh"); wle32(56)
    wtag("vids"); wtag("MJPG")
    wle32(0); wle16(0); wle16(0); wle32(0) // flags, prio, lang, initFrames
    wle32(1); wle32(fps) // scale, rate
    wle32(0); wle32(nFrames); wle32(maxPayload)
    wle32(-1); wle32(0) // quality, sampleSize
    wle16(0); wle16(0); wle16(width); wle16(height) // rcFrame
    wtag("strf"); wle32(40)
    wle32(40); wle32(width); wle32(height)
    wle16(1); wle16(24); wtag("MJPG"); wle32(maxPayload) // planes, bpp, fourcc
    wle32(2835); wle32(2835); wle32(0); wle32(0)
    wtag("LIST"); wle32(moviSize); wtag("movi")
    payloads.foreach { p =>
      wtag("00dc"); wle32(p.length)
      out.write(p, 0, p.length)
      if ((p.length & 1) == 1) w8(0) // RIFF word alignment
    }
    wtag("idx1"); wle32(idx1Size)
    var off = 4 // offsets are relative to the 'movi' tag
    payloads.foreach { p =>
      wtag("00dc"); wle32(0x10); wle32(off); wle32(p.length) // AVIIF_KEYFRAME
      off += 8 + p.length + (p.length & 1)
    }
    out.toByteArray
  }

  /** One frame of a Microsoft-RLE AVI fixture: paints the rect at
    * (left, top) sized fw×fh in DISPLAY coordinates with palette
    * indices from `idx(x, y)` (frame-local coords); everything outside
    * the rect is a delta skip — the previous frame shows through. A
    * full-canvas frame is a key frame. */
  final case class MrleFrame(left: Int, top: Int, fw: Int, fh: Int,
      idx: (Int, Int) => Int)

  /** Real Microsoft-RLE AVI bytes (fixtures + round-trip tests): one
    * 'vids'/'MRLE' stream, strf = BITMAPINFOHEADER with 8bpp /
    * BI_RLE8 + the RGBQUAD palette, each `00dc` chunk an RLE8 stream
    * ([[PixelCodec.rle8Encode]] wire coding) that paints only its
    * frame's rect via cursor deltas — real inter-frame delta
    * compression. `palette(i)` = 0xRRGGBB. */
  def encodeAviMrle(width: Int, height: Int, frames: Seq[MrleFrame],
      palette: Array[Int], fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty && fps > 0 &&
      width.toLong * height <= MaxPixels)
    require(palette.nonEmpty && palette.length <= 256)
    require(width <= 255 && height <= 255, "fixture deltas are byte-sized")
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.fw > 0 && f.fh > 0 &&
        f.left + f.fw <= width && f.top + f.fh <= height)
    }
    val payloads = frames.map { f =>
      val o = new java.io.ByteArrayOutputStream()
      val yBottom = height - f.top - f.fh // rect's lowest row, BMP space
      if (yBottom > 0) { o.write(0); o.write(2); o.write(0); o.write(yBottom) }
      var row = f.fh - 1 // frame-local row painted at this BMP line
      while (row >= 0) {
        if (f.left > 0) { o.write(0); o.write(2); o.write(f.left); o.write(0) }
        val r = row
        PixelCodec.rle8EncodeRuns(o, f.fw, x => f.idx(x, r))
        o.write(0); o.write(if (row == 0) 1 else 0) // EOL / final EOB
        row -= 1
      }
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    def wtag(t: String): Unit = t.foreach(c => w8(c))

    val strfSize = 40 + 4 * palette.length
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + strfSize))
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val idx1Size = frames.length * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val maxPayload = payloads.map(_.length).max

    wtag("RIFF"); wle32(riffSize); wtag("AVI ")
    wtag("LIST"); wle32(hdrlSize); wtag("hdrl")
    wtag("avih"); wle32(56)
    wle32(1000000 / fps)
    wle32(maxPayload * fps); wle32(0); wle32(0x10)
    wle32(frames.length); wle32(0); wle32(1); wle32(maxPayload)
    wle32(width); wle32(height)
    wle32(0); wle32(0); wle32(0); wle32(0)
    wtag("LIST"); wle32(4 + (8 + 56) + (8 + strfSize)); wtag("strl")
    wtag("strh"); wle32(56)
    wtag("vids"); wtag("MRLE")
    wle32(0); wle16(0); wle16(0); wle32(0)
    wle32(1); wle32(fps)
    wle32(0); wle32(frames.length); wle32(maxPayload)
    wle32(-1); wle32(0)
    wle16(0); wle16(0); wle16(width); wle16(height)
    wtag("strf"); wle32(strfSize)
    wle32(40); wle32(width); wle32(height)
    wle16(1); wle16(8); wle32(1); wle32(maxPayload) // 8bpp, BI_RLE8
    wle32(2835); wle32(2835); wle32(palette.length); wle32(0)
    palette.foreach { c =>
      w8(c); w8(c >> 8); w8(c >> 16); w8(0) // RGBQUAD: B G R X
    }
    wtag("LIST"); wle32(moviSize); wtag("movi")
    payloads.foreach { p =>
      wtag("00dc"); wle32(p.length)
      out.write(p, 0, p.length)
      if ((p.length & 1) == 1) w8(0)
    }
    wtag("idx1"); wle32(idx1Size)
    var off = 4
    payloads.zipWithIndex.foreach { case (p, fi) =>
      wtag("00dc"); wle32(if (fi == 0) 0x10 else 0); wle32(off); wle32(p.length)
      off += 8 + p.length + (p.length & 1)
    }
    out.toByteArray
  }
}
