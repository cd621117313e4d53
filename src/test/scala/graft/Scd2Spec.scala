package graft

import graft.ops.Scd2
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Behavior specs for SCD2 history derivation. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("scd2 collapses unchanged states and chains validity") {
    val changes = Seq(
      (1L, 10L, ts("2026-01-01 00:00:00"), "bronze"),
      (1L, 11L, ts("2026-01-02 00:00:00"), "bronze"), // unchanged → no version
      (1L, 12L, ts("2026-01-03 00:00:00"), "silver"),
      (1L, 13L, ts("2026-01-04 00:00:00"), "gold"),
      (2L, 20L, ts("2026-01-01 00:00:00"), "gold")
    ).toDF("k", "ord", "ts", "tier")
    val h = Scd2.history(changes, "k", "ts", "ord", Seq("tier"))
      .select("k", "version", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(h.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 1, "bronze"), (1L, 2, "silver"), (1L, 3, "gold"), (2L, 1, "gold")))
    // validity chains: each valid_to equals the next version's valid_from
    assert(h(0)._5.contains(ts("2026-01-03 00:00:00")))
    assert(h(1)._5.contains(ts("2026-01-04 00:00:00")))
    assert(h(2)._5.isEmpty && h(2)._6) // open-ended current row
    assert(h(3)._5.isEmpty && h(3)._6)
    assert(h.count(_._6) == 2) // exactly one current row per key
  }

  test("scd2 NULL attribute: NULL→NULL is unchanged, NULL→value is a change") {
    val changes = Seq(
      (1L, 1L, ts("2026-01-01 00:00:00"), null.asInstanceOf[String]),
      (1L, 2L, ts("2026-01-02 00:00:00"), null.asInstanceOf[String]), // no fork
      (1L, 3L, ts("2026-01-03 00:00:00"), "set"),
      (1L, 4L, ts("2026-01-04 00:00:00"), null.asInstanceOf[String]) // back to NULL = change
    ).toDF("k", "ord", "ts", "tier")
    val h = Scd2.history(changes, "k", "ts", "ord", Seq("tier"))
      .orderBy("version")
      .select("version", "tier").as[(Int, Option[String])].collect()
    assert(h.toSeq == Seq((1, None), (2, Some("set")), (3, None)))
  }

  test("scd2 equal timestamps break ties on the ord column") {
    val t0 = ts("2026-01-01 00:00:00")
    val changes = Seq(
      (1L, 2L, t0, "b"), (1L, 1L, t0, "a"), (1L, 3L, t0, "c")
    ).toDF("k", "ord", "ts", "tier")
    val h = Scd2.history(changes, "k", "ts", "ord", Seq("tier"))
      .orderBy("version").select("tier").as[String].collect()
    assert(h.toSeq == Seq("a", "b", "c"))
  }

  test("scd2 multi-attribute: change in ANY tracked column opens a version") {
    val changes = Seq(
      (1L, 1L, ts("2026-01-01 00:00:00"), "x", 1),
      (1L, 2L, ts("2026-01-02 00:00:00"), "x", 2), // second attr changed
      (1L, 3L, ts("2026-01-03 00:00:00"), "x", 2)  // unchanged
    ).toDF("k", "ord", "ts", "a", "b")
    val h = Scd2.history(changes, "k", "ts", "ord", Seq("a", "b"))
    assert(h.count() == 2)
  }

  test("scd2 plans a single exchange on the key") {
    val changes = Seq((1L, 1L, ts("2026-01-01 00:00:00"), "x"))
      .toDF("k", "ord", "ts", "tier")
    val plan = Scd2.history(changes, "k", "ts", "ord", Seq("tier"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one exchange, plan:\n$plan")
  }
}
