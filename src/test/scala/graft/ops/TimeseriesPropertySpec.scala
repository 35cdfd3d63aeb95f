package graft.ops

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants for the Timeseries family over
  * randomized event sets, checked against a brute-force in-memory
  * model (fixed seeds, the PropertySpec discipline — no
  * scalatestplus bridge in the offline cache). */
class TimeseriesPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (user, dayOffset, secondOfDay, value) — few users, tight day
  // range, so day collisions, gaps, and ties all occur
  private val eventGen = Gen.listOfN(200, Gen.zip(
    Gen.chooseNum(1L, 6L),
    Gen.chooseNum(0, 20),
    Gen.chooseNum(0, 86399),
    Gen.chooseNum(-50.0, 50.0)))

  private def eventsOf(seed: Long) =
    sample(eventGen, seed).zipWithIndex.map { case ((u, d, s, v), i) =>
      (i.toLong,
        Timestamp.valueOf(java.time.LocalDate.of(2024, 3, 1)
          .plusDays(d).atStartOfDay.plusSeconds(s)), u, v)
    }

  test("gapFillLocf ≡ brute-force model: dense span, LOCF values") {
    (1L to 3L).foreach { seed =>
      val rows = eventsOf(seed)
      val df = rows.toDF("event_id", "ts", "user_id", "value")
      val got = Timeseries.gapFillLocf(df)
        .as[(Long, java.sql.Date, Double, Boolean)].collect().toSeq

      // model: per user, last (ts, id) value per day; dense day span
      val byUser = rows.groupBy(_._3)
      val expect = byUser.toSeq.flatMap { case (u, es) =>
        val perDay = es.groupBy(_._2.toLocalDateTime.toLocalDate)
          .map { case (d, l) =>
            d -> l.maxBy(e => (e._2.getTime, e._1))._4 }
        val days = perDay.keySet
        val (d0, d1) = (days.min, days.max)
        Iterator.iterate(d0)(_.plusDays(1))
          .takeWhile(!_.isAfter(d1)).toSeq
          .foldLeft((Seq.empty[(Long, java.sql.Date, Double, Boolean)],
            0.0)) { case ((acc, prev), d) =>
            val obs = perDay.get(d)
            val v = obs.getOrElse(prev)
            (acc :+ ((u, java.sql.Date.valueOf(d), v, obs.isEmpty)), v)
          }._1
      }.sortBy(r => (r._1, r._2.toString))
      assert(got == expect, s"seed=$seed")
    }
  }

  test("trailingFeatures ≡ brute-force model over random events") {
    (1L to 3L).foreach { seed =>
      val rows = eventsOf(seed)
      val df = rows.toDF("event_id", "ts", "user_id", "value")
      val got = Timeseries.trailingFeatures(df)
        .as[(Long, java.sql.Date, Long, Double, Option[Long])]
        .collect().toSeq

      val byUser = rows.groupBy(_._3)
      val expect = byUser.toSeq.flatMap { case (u, es) =>
        val perDay = es.groupBy(_._2.toLocalDateTime.toLocalDate)
          .map { case (d, l) => d -> (l.size.toLong, l.map(_._4).max) }
        val days = perDay.keys.toSeq.sorted(
          Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
        days.zipWithIndex.map { case (d, i) =>
          val win = perDay.filter { case (dd, _) =>
            !dd.isAfter(d) && dd.isAfter(d.minusDays(7)) }
          (u, java.sql.Date.valueOf(d),
            win.values.map(_._1).sum, win.values.map(_._2).max,
            if (i == 0) None
            else Some(java.time.temporal.ChronoUnit.DAYS
              .between(days(i - 1), d)))
        }
      }.sortBy(r => (r._1, r._2.toString))
      assert(got == expect, s"seed=$seed")
    }
  }
}
