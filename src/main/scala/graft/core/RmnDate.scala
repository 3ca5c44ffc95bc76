package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}

/** CMC/RMN date-stamp codec.
  *
  * New-style stamps encode time in 5-second ticks since
  * 1980-01-01T00:00:00Z packed as `stamp = (ticks/8)*10 + ticks%8 +
  * 123200000`; the directory-word arithmetic in the reference
  * (`datev = (raw >> 3) * 10 + (raw & 0x7)`,
  * /root/reference/fstpy/std_io.py:781-786) is the same packing on the
  * raw word. Golden value from the reference docstring
  * (/root/reference/fstpy/std_dec.py:180-182):
  * 442998800 -> 2020-07-14T12:00:00.
  *
  * Dummy stamps 0 and 10101011 decode to null
  * (/root/reference/fstpy/std_dec.py:183-184).
  */
object RmnDate {
  val EpochSeconds: Long = 315532800L // 1980-01-01T00:00:00Z
  val StampOffset: Long = 123200000L
  val DummyStamps: Set[Long] = Set(0L, 10101011L)

  /** stamp -> seconds since Unix epoch; None for dummy or pre-1980
    * old-style stamps (out of scope for this engine).
    */
  def toEpochSeconds(stamp: Long): Option[Long] = {
    if (DummyStamps.contains(stamp) || stamp < StampOffset) None
    else {
      val s = stamp - StampOffset
      val ticks = (s / 10) * 8 + (s % 10)
      Some(EpochSeconds + ticks * 5)
    }
  }

  def toLocalDateTime(stamp: Long): Option[LocalDateTime] =
    toEpochSeconds(stamp).map(s =>
      LocalDateTime.ofInstant(Instant.ofEpochSecond(s), ZoneOffset.UTC))

  /** seconds since Unix epoch -> stamp (truncates to the 5 s grid). */
  def fromEpochSeconds(epochSeconds: Long): Long = {
    val ticks = (epochSeconds - EpochSeconds) / 5
    (ticks / 8) * 10 + (ticks % 8) + StampOffset
  }

  def fromLocalDateTime(dt: LocalDateTime): Long =
    fromEpochSeconds(dt.toEpochSecond(ZoneOffset.UTC))

  /** dateo from datev: stamps tick every 5 s, so subtract
    * deet*npas/5 ticks (/root/reference/fstpy/std_io.py:782-786).
    */
  def dateoFromDatev(datev: Long, deet: Long, npas: Long): Long = {
    val s = datev - StampOffset
    val ticks = (s / 10) * 8 + (s % 10) - (deet * npas) / 5
    (ticks / 8) * 10 + (ticks % 8) + StampOffset
  }
}
