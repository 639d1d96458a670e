package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join operator (plans.AsofJoin): plan shape pinned,
  * then equivalence with the union+window spelling on randomized
  * datasets — keys missing on either side, duplicate timestamps,
  * time ties between left and right (<= semantics), empty sides. */
class AsofJoinSpec extends SparkSpec {

  private def asofNative(left: DataFrame, right: DataFrame): DataFrame =
    AsofJoin.join(left, right,
        Seq(col("user_id")), Seq(col("r_user")),
        col("t"), col("rt"), Seq(col("click_id")))
      .select(col("purchase_id"), col("user_id"), col("t"),
        col("click_id"), col("rt"))

  /** Reference spelling: union + last(ignoreNulls) window. */
  private def asofWindow(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("purchase_id"), col("user_id"), col("t"),
      lit(null).cast("long").as("c_click"), lit(null).cast("long").as("c_rt"),
      lit(1).as("is_l"))
    val r = right.select(lit(null).cast("long").as("purchase_id"),
      col("r_user").as("user_id"), col("rt").as("t"),
      col("click_id").as("c_click"), col("rt").as("c_rt"), lit(0).as("is_l"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_l"), col("c_click"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("click_id", last(col("c_click"), ignoreNulls = true).over(w))
      .withColumn("rt", last(col("c_rt"), ignoreNulls = true).over(w))
      .filter(col("is_l") === 1)
      .select(col("purchase_id"), col("user_id"), col("t"),
        col("click_id"), col("rt"))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("plans as the custom exec with two sorts, no window, no SMJ") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("purchase_id", "user_id", "t")
    val right = Seq((7L, 10L, 90L)).toDF("click_id", "r_user", "rt")
    val plan = asofNative(left, right).queryExecution.executedPlan.toString
    assert(plan.contains("GraftAsofJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan)
  }

  test("matches the window spelling on 15 randomized datasets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (c <- 1 to 15) {
      val nUsers = 1 + rnd.nextInt(6)
      val lRows = (0 until rnd.nextInt(40)).map { i =>
        (i.toLong, rnd.nextInt(nUsers).toLong, rnd.nextInt(20).toLong)
      }
      val rRows = (0 until rnd.nextInt(40)).map { i =>
        (1000L + i, rnd.nextInt(nUsers).toLong, rnd.nextInt(20).toLong)
      }
      val left = lRows.toDF("purchase_id", "user_id", "t")
      val right = rRows.toDF("click_id", "r_user", "rt")
      assert(canon(asofNative(left, right)) === canon(asofWindow(left, right)),
        s"case $c: l=$lRows r=$rRows")
    }
  }

  test("empty right side yields all-null matches; empty left yields nothing") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 11L, 50L)).toDF("purchase_id", "user_id", "t")
    val right = Seq.empty[(Long, Long, Long)].toDF("click_id", "r_user", "rt")
    val out = asofNative(left, right).collect()
    assert(out.length === 2 && out.forall(_.isNullAt(3)))
    assert(asofNative(right.toDF("purchase_id", "user_id", "t"),
      left.toDF("click_id", "r_user", "rt")).count() === 0)
  }

  test("time tie on the right resolves to the largest tiebreaker (window parity)") {
    import spark.implicits._
    val left = Seq((1L, 5L, 10L)).toDF("purchase_id", "user_id", "t")
    val right = Seq((100L, 5L, 10L), (101L, 5L, 10L), (99L, 5L, 9L))
      .toDF("click_id", "r_user", "rt")
    val row = asofNative(left, right).collect().head
    assert(row.getLong(3) === 101L, row)
  }

  test("nearest: closer side wins, ties go backward, single-sided and " +
    "clickless rows survive") {
    import spark.implicits._
    // user 1: clicks at 10us, 100us; purchases at 40 (back 30 < fwd 60),
    //   95 (back 85 > fwd 5), 55 (back 45 == fwd 45 -> TIE -> backward)
    // user 2: purchase only -> NULL click, row kept
    // user 3: click ONLY AFTER the purchase -> forward fallback
    def ns(us: Long) = us * 1000L
    val ev = Seq(
      (1L, 1L, "click", ns(10)), (2L, 1L, "click", ns(100)),
      (3L, 1L, "purchase", ns(40)), (4L, 1L, "purchase", ns(95)),
      (5L, 1L, "purchase", ns(55)),
      (6L, 2L, "purchase", ns(50)),
      (7L, 3L, "purchase", ns(50)), (8L, 3L, "click", ns(70)))
      .toDF("event_id", "user_id", "event_type", "ts_ns")
    val rows = graft.analytics.EventsPipeline.joinAsofNearestOf(ev).collect()
    // exactly one output row per purchase — assert BEFORE the toMap,
    // which would silently dedup a fan-out regression
    assert(rows.length === 5)
    val r = rows.map(x => x.getAs[Long]("purchase_id") -> x).toMap
    assert(r(3L).getAs[Long]("click_id") === 1L)  // back 30 beats fwd 60
    assert(r(3L).getAs[Long]("dist_us") === 30L)
    assert(r(4L).getAs[Long]("click_id") === 2L)  // fwd 5 beats back 85
    assert(r(4L).getAs[Long]("dist_us") === 5L)
    assert(r(5L).getAs[Long]("click_id") === 1L)  // tie -> BACKWARD
    assert(r(5L).getAs[Long]("dist_us") === 45L)
    assert(r(6L).isNullAt(r(6L).fieldIndex("click_id"))) // clickless kept
    assert(r(7L).getAs[Long]("click_id") === 8L)  // forward-only fallback
    assert(r(7L).getAs[Long]("dist_us") === 20L)
    assert(r.size === 5)
  }
}
