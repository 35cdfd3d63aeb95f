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

  case class Tok(group: String, ts: java.sql.Timestamp, tok: String)
  case class CmsState(cells: Array[Int], candTok: Array[String],
                      candEst: Array[Long], lastMicros: Long)
  case class HeavyHitter(group: String, rank: Int, tok: String,
                         cms_estimate: Long)

  /** CMS row-j bucket of a token — the JVM replay of
    * `Sketch.bucketOf` (first 2 md5 hex digits of "j:token"). */
  private[streaming] def cmsBucket(j: Int, tok: String, width: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$tok".getBytes("UTF-8"))
    (((d(0) >> 4) & 0xf) * 16 + (d(0) & 0xf)) % width
  }

  /** Streaming heavy hitters — the streaming twin of
    * `ops.Sketch.cmsHeavyHitters` (q150): per group, the 4×256 CMS
    * cell array plus a `k`-entry candidate list (the space-saving
    * composition: Charikar et al.'s CMS+heap), all as ONE bounded
    * state value. Every arrival bumps its d cells; after each
    * micro-batch the batch's distinct tokens are probed against the
    * sketch (min over rows — the one-sided CMS estimate, identical
    * arithmetic to the batch audit) and the candidate list keeps the
    * k largest by (estimate desc, token asc). Memory per group is
    * d·w ints + k strings FOREVER — independent of vocabulary size,
    * stream length, and skew; the exact alternative holds the whole
    * vocabulary. Emits the current top-k per group per batch (Update
    * mode); idle groups flush their final list and evict. */
  def heavyHitters(toks: Dataset[Tok], k: Int = 10,
                   depth: Int = 4, width: Int = 256,
                   watermarkDelay: String = "10 minutes",
                   idleTimeout: String = "1 hour"): Dataset[HeavyHitter] = {
    require(k > 0 && depth > 0 && width > 0 && 256 % width == 0,
      "need k > 0, depth > 0, width dividing 256")
    val spark = toks.sparkSession
    import spark.implicits._
    import StreamTime.micros

    toks
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.group)
      .flatMapGroupsWithState[CmsState, HeavyHitter](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[Tok], state: GroupState[CmsState]) =>
          def topK(st: CmsState): Iterator[HeavyHitter] =
            st.candTok.zip(st.candEst).sortBy { case (t, e) => (-e, t) }
              .iterator.zipWithIndex.map { case ((t, e), i) =>
                HeavyHitter(key, i + 1, t, e) }
          if (state.hasTimedOut) {
            val out = topK(state.get)
            state.remove()
            out
          } else {
            val st = state.getOption.getOrElse(
              CmsState(new Array[Int](depth * width),
                Array.empty, Array.empty, 0L))
            val cells = st.cells.clone()
            val seen = scala.collection.mutable.TreeSet.empty[String]
            var last = st.lastMicros
            batch.foreach { tk =>
              var j = 0
              while (j < depth) {
                cells(j * width + cmsBucket(j, tk.tok, width)) += 1
                j += 1
              }
              seen += tk.tok
              val m = micros(tk.ts)
              if (m > last) last = m
            }
            def estimate(tok: String): Long = {
              var est = Long.MaxValue
              var j = 0
              while (j < depth) {
                est = math.min(est,
                  cells(j * width + cmsBucket(j, tok, width)).toLong)
                j += 1
              }
              est
            }
            // re-probe prior candidates (their cells moved too) and
            // the batch's distinct tokens, keep the k best
            val cand = scala.collection.mutable.Map.empty[String, Long]
            st.candTok.foreach(t => cand(t) = estimate(t))
            seen.foreach(t => cand(t) = estimate(t))
            val kept = cand.toSeq.sortBy { case (t, e) => (-e, t) }.take(k)
            val next = CmsState(cells, kept.map(_._1).toArray,
              kept.map(_._2).toArray, last)
            state.update(next)
            state.setTimeoutTimestamp(last / 1000, idleTimeout)
            topK(next)
          }
      }
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
