package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check of scd2History against a brute-force
  * sequential model over randomized changelogs. The generator forces
  * frequent VERSION-TIME COLLISIONS (coarse time slots, unique id
  * tiebreak), NULL payload values (the null-safe run compare), and
  * single-row keys — the three places a window formulation can drift
  * from the sequential semantics. Also pins the composition law the
  * operator is FOR: an as-of style point-in-time lookup at any time t
  * against the history equals "latest changelog row at or before t"
  * collapsed to its run value. */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (key, timeSlot, payload-or-null); ids assigned by index
  private val rowGen = Gen.listOfN(120, Gen.zip(
    Gen.chooseNum(1L, 6L),
    Gen.chooseNum(0L, 25L),
    Gen.option(Gen.oneOf("a", "b", "c"))))

  private case class R(k: Long, t: Long, id: Long, v: Option[String])

  private def changelogOf(seed: Long): Seq[R] =
    sample(rowGen, seed).zipWithIndex.map { case ((k, t, v), i) =>
      R(k, t, i.toLong, v)
    }

  /** Sequential reference: order per key by (t, id), emit a version
    * whenever the payload differs from the previous row's (null-safe),
    * chain effective_to from the next emitted version. */
  private def model(rows: Seq[R]): Seq[(Long, Option[String], Long, Option[Long], Boolean, Long)] =
    rows.groupBy(_.k).toSeq.flatMap { case (k, rs) =>
      val ordered = rs.sortBy(r => (r.t, r.id))
      val openers = ordered.foldLeft(Vector.empty[R]) { (acc, r) =>
        if (acc.isEmpty || acc.last.v != r.v) acc :+ r else acc
      }
      openers.zipWithIndex.map { case (o, i) =>
        val to = openers.lift(i + 1).map(_.t)
        (k, o.v, o.t, to, to.isEmpty, (i + 1).toLong)
      }
    }.sortBy(r => (r._1, r._6))

  test("scd2History ≡ sequential model under ties and null payloads") {
    (1L to 4L).foreach { seed =>
      val rows = changelogOf(seed)
      val df = rows.map(r => (r.k, r.t, r.id, r.v.orNull))
        .toDF("k", "t", "id", "v")
      val got = Upsert.scd2History(df, Seq("k"), "t", Seq("id"), Seq("v"))
        .as[(Long, Option[String], Long, Option[Long], Boolean, Long)]
        .collect().sortBy(r => (r._1, r._6)).toSeq
      assert(got == model(rows), s"seed=$seed")
    }
  }

  test("point-in-time lookup against the history ≡ latest run at t") {
    val rows = changelogOf(7L)
    val df = rows.map(r => (r.k, r.t, r.id, r.v.orNull))
      .toDF("k", "t", "id", "v")
    val hist = Upsert.scd2History(df, Seq("k"), "t", Seq("id"), Seq("v"))
      .as[(Long, Option[String], Long, Option[Long], Boolean, Long)]
      .collect().toSeq
    // half-open interval semantics: at time t the active version is
    // the one with effective_from <= t < effective_to
    for (t <- 0L to 26L; k <- 1L to 6L) {
      val active = hist.filter(h => h._1 == k && h._3 <= t &&
        h._4.forall(t < _)).map(h => h._2)
      assert(active.size <= 1, s"overlapping versions at k=$k t=$t")
      val expected = rows.filter(r => r.k == k && r.t <= t)
        .sortBy(r => (r.t, r.id)).lastOption.map(_.v)
      assert(active.headOption == expected, s"k=$k t=$t")
    }
  }
}
