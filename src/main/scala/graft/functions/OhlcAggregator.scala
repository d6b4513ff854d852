package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** U1 — the engine's typed UDAF surface (SURVEY.md §2.10): a custom
  * `Aggregator[IN, BUF, OUT]` computing an OHLC candle in one pass.
  *
  * The window/min_by composition in Queries (a4_ohlc_bars) is the
  * preferred, fully-codegen'd route; this Aggregator demonstrates the
  * extension point itself — a mergeable buffer (partial aggregation
  * works map-side, so at 100 TB the shuffle carries one 48-byte buffer
  * per group per partition, not the ticks). */
/** TickIn carries no trade size, so the candle accumulates `priceSum`
  * (sum of observed prices — usable as the numerator of an equal-weight
  * average), NOT a traded volume. A real feed would add a size field and
  * a `size`-weighted accumulator alongside. */
final case class TickIn(tsMicros: Long, price: Double)

final case class OhlcBuf(
    openTs: Long, open: Double,
    closeTs: Long, close: Double,
    high: Double, low: Double,
    priceSum: Double, n: Long)

final case class Ohlc(open: Double, high: Double, low: Double, close: Double,
    priceSum: Double, n: Long)

object OhlcAggregator extends Aggregator[TickIn, OhlcBuf, Ohlc] {
  override def zero: OhlcBuf = OhlcBuf(
    Long.MaxValue, 0.0, Long.MinValue, 0.0,
    Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0L)

  override def reduce(b: OhlcBuf, t: TickIn): OhlcBuf = OhlcBuf(
    openTs = if (t.tsMicros < b.openTs) t.tsMicros else b.openTs,
    open = if (t.tsMicros < b.openTs) t.price else b.open,
    closeTs = if (t.tsMicros > b.closeTs) t.tsMicros else b.closeTs,
    close = if (t.tsMicros > b.closeTs) t.price else b.close,
    high = math.max(b.high, t.price),
    low = math.min(b.low, t.price),
    priceSum = b.priceSum + t.price,
    n = b.n + 1)

  override def merge(a: OhlcBuf, b: OhlcBuf): OhlcBuf =
    if (a.n == 0) b else if (b.n == 0) a
    else OhlcBuf(
      openTs = math.min(a.openTs, b.openTs),
      open = if (a.openTs <= b.openTs) a.open else b.open,
      closeTs = math.max(a.closeTs, b.closeTs),
      close = if (a.closeTs >= b.closeTs) a.close else b.close,
      high = math.max(a.high, b.high),
      low = math.min(a.low, b.low),
      priceSum = a.priceSum + b.priceSum,
      n = a.n + b.n)

  override def finish(r: OhlcBuf): Ohlc =
    Ohlc(r.open, r.high, r.low, r.close, r.priceSum, r.n)

  override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
}
