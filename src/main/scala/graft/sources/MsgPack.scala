package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/**
 * Minimal MessagePack codec for the reference's on-disk store format.
 *
 * The reference persists its whole database as ONE MessagePack blob
 * (MerkonDatabase.cs:128-162): `VectorDatabase` is a `[MessagePackObject]`
 * with a single `[Key(0)]` member, which MessagePack-C# serializes as a
 * 1-element array wrapping a map of collection name -> list of
 * `DatabaseEntry`, and each entry (MerkonDatabase.cs:243-254, integer
 * keys 0..3) as a 4-element array of `[key, metadata, embedding,
 * timestamp]` strings (nil where the C# string is null).
 *
 * Only the wire types that object graph can produce are implemented —
 * nil, str (all four widths), array and map (all widths) — plus the
 * integer family defensively (a foreign file fails with a clear message
 * instead of a buffer underflow). Encodings follow the public
 * MessagePack spec (github.com/msgpack/msgpack/blob/master/spec.md);
 * the encoder always emits the smallest width, matching
 * MessagePack-C#'s canonical output so export -> C# -> import is
 * byte-stable.
 */
private[graft] object MsgPack {

  // ---- decode (cursor-style over a ByteBuffer) ----

  def readArrayHeader(buf: ByteBuffer): Int = {
    val b = buf.get() & 0xff
    if ((b & 0xf0) == 0x90) b & 0x0f
    else b match {
      case 0xdc => buf.getShort() & 0xffff
      case 0xdd => readLen32(buf)
      case _ => die("array header", b, buf)
    }
  }

  def readMapHeader(buf: ByteBuffer): Int = {
    val b = buf.get() & 0xff
    if ((b & 0xf0) == 0x80) b & 0x0f
    else b match {
      case 0xde => buf.getShort() & 0xffff
      case 0xdf => readLen32(buf)
      case _ => die("map header", b, buf)
    }
  }

  /** A str-family value; nil is an error here (keys can't be nil). */
  def readString(buf: ByteBuffer): String = {
    val n = readStringHeader(buf)
    readUtf8(buf, n)
  }

  /** A str-family value or nil (the C# `string?` fields). */
  def readStringOrNil(buf: ByteBuffer): String = {
    if ((buf.get(buf.position()) & 0xff) == 0xc0) { buf.get(); null }
    else readString(buf)
  }

  /** Advance past one value without materializing it — what column
    * pruning and collection-filter pushdown compile down to. str/bin
    * payloads are jumped by length (no UTF-8 decode); containers
    * recurse over headers only. */
  def skipValue(buf: ByteBuffer): Unit = {
    val b = buf.get() & 0xff
    if (b <= 0x7f || b >= 0xe0) ()                      // fixint
    else if ((b & 0xe0) == 0xa0) skip(buf, b & 0x1f)    // fixstr
    else if ((b & 0xf0) == 0x90) {                      // fixarray
      var i = 0; val n = b & 0x0f
      while (i < n) { skipValue(buf); i += 1 }
    } else if ((b & 0xf0) == 0x80) {                    // fixmap
      var i = 0; val n = (b & 0x0f) * 2
      while (i < n) { skipValue(buf); i += 1 }
    } else b match {
      case 0xc0 | 0xc2 | 0xc3 => ()                     // nil, bool
      case 0xcc | 0xd0 => skip(buf, 1)
      case 0xcd | 0xd1 => skip(buf, 2)
      case 0xce | 0xd2 | 0xca => skip(buf, 4)
      case 0xcf | 0xd3 | 0xcb => skip(buf, 8)
      case 0xd9 | 0xc4 => skip(buf, buf.get() & 0xff)
      case 0xda | 0xc5 => skip(buf, buf.getShort() & 0xffff)
      case 0xdb | 0xc6 => skip(buf, readLen32(buf))
      case 0xdc => { var i = 0; val n = buf.getShort() & 0xffff
        while (i < n) { skipValue(buf); i += 1 } }
      case 0xdd => { var i = 0; val n = readLen32(buf)
        while (i < n) { skipValue(buf); i += 1 } }
      case 0xde => { var i = 0; val n = (buf.getShort() & 0xffff) * 2
        while (i < n) { skipValue(buf); i += 1 } }
      case 0xdf => { var i = 0; val n = readLen32(buf) * 2
        while (i < n) { skipValue(buf); i += 1 } }
      case _ => die("value", b, buf)
    }
  }

  private def readStringHeader(buf: ByteBuffer): Int = {
    val b = buf.get() & 0xff
    if ((b & 0xe0) == 0xa0) b & 0x1f
    else b match {
      case 0xd9 => buf.get() & 0xff
      case 0xda => buf.getShort() & 0xffff
      case 0xdb => readLen32(buf)
      case _ => die("string", b, buf)
    }
  }

  private def readUtf8(buf: ByteBuffer, n: Int): String = {
    val out = new Array[Byte](n)
    buf.get(out)
    new String(out, StandardCharsets.UTF_8)
  }

  private def readLen32(buf: ByteBuffer): Int = {
    val n = buf.getInt()
    if (n < 0) throw new IllegalArgumentException(
      s"msgpack length $n exceeds 2^31-1 — not a Merkon legacy store")
    n
  }

  private def skip(buf: ByteBuffer, n: Int): Unit = buf.position(buf.position() + n)

  private def die(what: String, b: Int, buf: ByteBuffer): Nothing =
    throw new IllegalArgumentException(
      f"unexpected msgpack byte 0x$b%02x where a $what was required " +
        s"(offset ${buf.position() - 1}) — not a Merkon legacy store")

  // ---- encode (smallest-width, spec-canonical) ----

  final class Writer {
    private val out = new ByteArrayOutputStream(1 << 16)

    def writeArrayHeader(n: Int): Unit =
      if (n < 16) out.write(0x90 | n)
      else if (n < (1 << 16)) { out.write(0xdc); u16(n) }
      else { out.write(0xdd); u32(n) }

    def writeMapHeader(n: Int): Unit =
      if (n < 16) out.write(0x80 | n)
      else if (n < (1 << 16)) { out.write(0xde); u16(n) }
      else { out.write(0xdf); u32(n) }

    def writeString(s: String): Unit =
      if (s == null) writeNil()
      else {
        val b = s.getBytes(StandardCharsets.UTF_8)
        if (b.length < 32) out.write(0xa0 | b.length)
        else if (b.length < (1 << 8)) { out.write(0xd9); out.write(b.length) }
        else if (b.length < (1 << 16)) { out.write(0xda); u16(b.length) }
        else { out.write(0xdb); u32(b.length) }
        out.write(b)
      }

    def writeNil(): Unit = out.write(0xc0)

    def toBytes: Array[Byte] = out.toByteArray

    private def u16(n: Int): Unit = { out.write(n >>> 8); out.write(n) }
    private def u32(n: Int): Unit = {
      out.write(n >>> 24); out.write(n >>> 16); out.write(n >>> 8); out.write(n)
    }
  }
}
