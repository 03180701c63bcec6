package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wire-frame codec for the reference gateway's two frame dialects
  * (SURVEY.md §2.2; ※ oemgatewaylistener.py — symbol-level citations,
  * `/root/reference/` is empty). Pure column expressions shared by the
  * batch analogs (graft.operators.Etl) and the streaming module
  * (graft.streaming.Gateway), so both paths decode identically and
  * everything stays inside WholeStageCodegen — no UDFs.
  *
  * Frame dialects:
  *  - socket (※ OemGatewaySocketListener): `"<node> <v1> <v2> …"`,
  *    decimal literals taken as-is.
  *  - RFM2Pi (※ OemGatewayRFM2PiListener): `"OK <node> <lo1> <hi1> …"`,
  *    payload bytes reassembled as little-endian signed int16 pairs.
  *  - Lines starting with `?` are "unreliable content" → dropped (P2).
  */
object FrameCodec {

  /** P3 — little-endian signed-int16 reassembly.
    * ※ OemGatewayRFM2PiListener._process_frame:
    * `v = lo + 256*hi; if v > 32767: v -= 65536`.
    */
  def decodeInt16(lo: Column, hi: Column): Column = {
    val raw = lo + hi * lit(256)
    when(raw > 32767, raw - 65536).otherwise(raw)
  }

  /** Inverse of [[decodeInt16]] (generator/test side): int16 → (lo, hi).
    * Exact for the full −32768..32767 domain; both bytes land in 0..255.
    * The division is exact (numerator is a multiple of 256), so the
    * double-typed `/` carries no rounding risk.
    */
  def encodeInt16(v: Column): (Column, Column) = {
    val u = pmod(v, lit(65536))
    val lo = u % 256
    (lo.cast("long"), ((u - lo) / 256).cast("long"))
  }

  /** P1 — reference tokenization: `strip().split(' ')`. */
  def tokens(line: Column): Column = split(trim(line), " ")

  /** P2 — frames flagged unreliable by the radio firmware. */
  def unreliable(line: Column): Column = trim(line).startsWith("?")

  /** Socket-dialect parse of a token array: node id + as-is numerics.
    * Nulls inside the result mark malformed tokens; see [[socketValid]].
    */
  def socketNode(toks: Column): Column = element_at(toks, 1).try_cast("long")

  def socketValues(toks: Column): Column =
    transform(
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      t => t.try_cast("double"))

  /** P2 validity for the socket dialect: at least node+1 value, numeric
    * node, every value numeric (try_cast null ⇒ malformed ⇒ drop).
    */
  def socketValid(line: Column, toks: Column): Column =
    !unreliable(line) &&
      size(toks) >= 2 &&
      socketNode(toks).isNotNull &&
      !exists(socketValues(toks), v => v.isNull)

  /** RFM2Pi-dialect parse: `"OK <node> <lo hi>*"` → decoded int16s. */
  def rfm2piNode(toks: Column): Column = element_at(toks, 2).try_cast("long")

  private def rfm2piBytes(toks: Column): Column =
    transform(
      slice(toks, lit(3), greatest(size(toks) - 2, lit(0))),
      t => t.try_cast("long"))

  def rfm2piValues(toks: Column): Column = {
    val b = rfm2piBytes(toks)
    val nPairs = (size(b) / 2).cast("int")
    when(
      nPairs > 0,
      transform(
        sequence(lit(0), nPairs - 1),
        i =>
          decodeInt16(
            element_at(b, i * 2 + 1),
            element_at(b, i * 2 + 2)).cast("double")))
      .otherwise(array().cast("array<double>"))
  }

  /** P2 validity for the RFM2Pi dialect: OK-prefixed, numeric node, an
    * even payload of bytes each within 0..255, at least one pair.
    */
  def rfm2piValid(line: Column, toks: Column): Column = {
    val b = rfm2piBytes(toks)
    !unreliable(line) &&
      element_at(toks, 1) === "OK" &&
      rfm2piNode(toks).isNotNull &&
      size(b) >= 2 &&
      size(b) % 2 === 0 &&
      !exists(b, x => x.isNull || x < 0 || x > 255)
  }
}
