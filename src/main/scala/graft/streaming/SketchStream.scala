package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.ops.Sketch

/** Streaming distinct-count over an event stream — the streaming twin
  * of `ops.Sketch.hllDistinct` (q151): per group, 256 HLL registers
  * held as ONE 256-byte state value, updated by register max per
  * arrival and re-estimated per micro-batch (Update mode).
  *
  * The state is the mergeable sketch itself, which is the whole
  * point: memory per group is 256 bytes FOREVER — independent of the
  * distinct count, the stream length, and the duplicate rate — where
  * Spark's streaming `dropDuplicates`+count holds every key until
  * watermark expiry. A checkpointed run resumes mid-stream with no
  * rescan, and the per-group state equals the batch sketch of
  * everything seen (spec-proven: stream registers ≡
  * `Sketch.hllSketch`, stream estimate ≡ `Sketch.hllEstimate`,
  * bit-for-bit, including across multi-batch feeds — HLL's
  * register-max merge law in action).
  *
  * Hash derivation duplicates the batch path's md5 string arithmetic
  * exactly (register = first 2 hex digits, rho = leading-zero bits
  * of the next 8 + 1), so batch, stream, and the DuckDB oracle all
  * hold the identical sketch.
  */
object SketchStream {

  case class Ev(event_type: String, ts: java.sql.Timestamp, user_id: Long)
  case class HllState(regs: Array[Byte], lastMicros: Long)
  case class DistinctEstimate(event_type: String, hll_estimate: Double,
                              n_zero_registers: Int)

  /** (register, rho) of one value — the JVM replay of
    * `Sketch.hllRho` over md5 hex (same alphabet, same nibble CASE). */
  private[streaming] def registerAndRho(value: String): (Int, Int) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    val reg = Integer.parseInt(hex.substring(0, 2), 16)
    val stripped = hex.substring(2, 10).dropWhile(_ == '0')
    val rho =
      if (stripped.isEmpty) 33
      else {
        val extra = stripped.head match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
        (8 - stripped.length) * 4 + extra + 1
      }
    (reg, rho)
  }

  /** Estimate from a register array — `Sketch.hllEstimate`'s
    * arithmetic: exact binary-fraction sum (order-independent), the
    * same α·m² constant, the same driver-computed linear-counting
    * table. */
  private[streaming] def estimate(regs: Array[Byte]): (Double, Int) = {
    var s = 0.0
    var zeros = 0
    var i = 0
    while (i < regs.length) {
      val m = regs(i)
      if (m == 0) { zeros += 1; s += 1.0 }
      else s += 1.0 / (1L << m)
      i += 1
    }
    val raw = Sketch.HllAlphaM2 / s
    val est =
      if (raw <= 2.5 * Sketch.HllRegisters && zeros > 0)
        Sketch.LinearCountTable(zeros)
      else raw
    (est, zeros)
  }

  /** Per-group running distinct estimate, one row per group per
    * micro-batch (Update mode). Idle groups evict by event-time
    * timeout, flushing their final estimate on the way out. */
  def distinctCounts(events: Dataset[Ev],
                     watermarkDelay: String = "10 minutes",
                     idleTimeout: String = "1 hour"): Dataset[DistinctEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    import StreamTime.micros

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .mapGroupsWithState[HllState, DistinctEstimate](
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[Ev], state: GroupState[HllState]) =>
          if (state.hasTimedOut) {
            val (est, zeros) = estimate(state.get.regs)
            state.remove()
            DistinctEstimate(key, est, zeros)
          } else {
            val st = state.getOption
              .getOrElse(HllState(new Array[Byte](Sketch.HllRegisters), 0L))
            val regs = st.regs.clone()
            var last = st.lastMicros
            batch.foreach { ev =>
              val (reg, rho) = registerAndRho(ev.user_id.toString)
              if (rho > regs(reg)) regs(reg) = rho.toByte
              val m = micros(ev.ts)
              if (m > last) last = m
            }
            state.update(HllState(regs, last))
            state.setTimeoutTimestamp(last / 1000, idleTimeout)
            val (est, zeros) = estimate(regs)
            DistinctEstimate(key, est, zeros)
          }
      }
  }
}
