package graft.streaming

/** Shared timestamp↔micros conversion for the streaming operators.
  * The `(getNanos / 1000) % 1000` term recovers the sub-millisecond
  * microseconds that `getTime` (millis) cannot carry; the inverse
  * uses floor math so pre-epoch timestamps round toward -∞, not 0. */
private[streaming] object StreamTime {
  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Inverse of [[micros]] — exact to the microsecond. */
  def toTimestamp(us: Long): java.sql.Timestamp = {
    val seconds = Math.floorDiv(us, 1000000L)
    val t = new java.sql.Timestamp(seconds * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
