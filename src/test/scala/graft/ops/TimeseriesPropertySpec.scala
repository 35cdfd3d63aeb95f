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

  test("volumeAnomalies ≡ brute-force model: exact median/MAD/flag") {
    (1L to 3L).foreach { seed =>
      val rows = eventsOf(seed)
      // reuse the generator's user column as the anomaly key
      val df = rows.map(r => (r._1, r._2, s"t${r._3}"))
        .toDF("event_id", "ts", "event_type")
      val got = Timeseries.volumeAnomalies(df)
        .as[(String, java.sql.Date, Long, Double, Double,
          Option[Double], Boolean)].collect().toSeq

      // model: exact rational median as 2·median over sorted longs
      def med2(xs: Seq[Long]): Long = {
        val s = xs.sorted
        val n = s.size
        if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
      }
      val expect = rows.groupBy(r => s"t${r._3}").toSeq.flatMap {
        case (key, es) =>
          val perDay = es.groupBy(_._2.toLocalDateTime.toLocalDate)
            .map { case (d, l) => d -> l.size.toLong }
          val m2 = med2(perDay.values.toSeq)
          val dev2 = perDay.map { case (d, n) => d -> (2 * n - m2).abs }
          val mad4 = med2(dev2.values.toSeq)
          perDay.toSeq.sortBy(_._1.toString).map { case (d, n) =>
            (key, java.sql.Date.valueOf(d), n,
              m2.toDouble / 2.0, mad4.toDouble / 4.0,
              if (mad4 != 0) Some(2.0 * dev2(d) / mad4) else None,
              2 * dev2(d) > 5 * mad4)
          }
      }.sortBy(r => (r._1, r._2.toString))
      assert(got == expect, s"seed=$seed")
    }
  }
}
