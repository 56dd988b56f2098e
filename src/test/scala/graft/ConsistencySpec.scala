package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** CROSS-QUERY consistency certificates: independent queries that measure
  * the same underlying quantity must agree exactly. Each assertion ties
  * two separately-implemented paths together, so a regression in either
  * one (or a silent semantic fork) fails here even when both queries
  * individually still hash-match a stale oracle expectation.
  */
class ConsistencySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("consistency-spec", cores = 8)
  val sf = "/root/testdata/sf0.01"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("growth accounting partitions DAU: per-day state counts sum to distinct actives") {
    val ga = q("events_growth_accounting")
      .groupBy("day").agg(sum("n_users").as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dau = Tables.events(spark, sf)
      .select(col("user_id"), expr("t_us div 86400000000").as("day"))
      .distinct().groupBy("day").agg(count(lit(1)).as("dau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ga == dau, "new+retained+resurrected must partition the daily actives")
  }

  test("cohort LTV closes the books: terminal cumulative equals cohort revenue; curve monotone") {
    val rows = q("events_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val byOff = rs.sortBy(_._2).map(_._3)
      assert(byOff.zip(byOff.tail).forall { case (a, b) => a <= b },
        s"cohort $cohort: cumulative revenue must be nondecreasing")
    }
    val terminal = rows.groupBy(_._1).view
      .mapValues(rs => rs.maxBy(_._2)._3).toMap
    val direct = Tables.events(spark, sf)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .join(Tables.events(spark, sf)
        .select(col("user_id"), expr("t_us div 86400000000").as("day"))
        .groupBy("user_id").agg(min("day").as("cohort")), "user_id")
      .groupBy("cohort").agg(sum("cents").as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(terminal == direct,
      "terminal cumulative LTV must equal the cohort's directly-summed revenue")
  }

  test("RFM partitions the user base: segment counts sum to users, events, and cents totals") {
    val seg = q("events_rfm")
      .agg(sum("n_users").as("u"), sum("n_events").as("e"), sum("total_cents").as("c"))
      .collect().head
    val tot = Tables.events(spark, sf)
      .agg(countDistinct("user_id").as("u"), count(lit(1)).as("e"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().head
    assert(seg.getLong(0) == tot.getLong(0), "users must partition")
    assert(seg.getLong(1) == tot.getLong(1), "events must partition")
    assert(seg.getLong(2) == tot.getLong(2), "cents must partition")
  }

  test("seasonal backtest scores exactly the declared 14-day holdout for both baselines") {
    val rows = q("events_seasonal_backtest").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 14L, s"${r.getString(0)}: holdout must be 14 days")
      assert(r.getDouble(3) >= 0, "WAPE must be a valid nonnegative ratio")
    }
  }

  test("scene cut and VAD agree on the frame contour: identical per-item frame counts") {
    val sc = q("mm_scene_cut").select("id", "n_frames")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vad = q("mm_audio_vad").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(vad.map(v => v._1 -> v._2).toMap == sc,
      "both consumers of the energy contour must see the same frames")
    vad.foreach { case (id, nf, nv, maxRun) =>
      assert(nv <= nf && maxRun <= nv,
        s"item $id: voiced counts must nest (voiced<=frames, run<=voiced)")
    }
  }

  test("k-center gap curve is nonincreasing and selections are distinct") {
    val rows = q("sim_kcenter_init").collect()
      .sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length,
      "greedy selections must be distinct vectors")
    val gaps = rows.drop(1).map(_._2) // step 0 is the seed, gap 0 by convention
    assert(gaps.zip(gaps.tail).forall { case (a, b) => a >= b },
      s"max-min distance must shrink as centers are added: ${gaps.toSeq}")
  }

  test("fixed-point k-means partitions the corpus and outlier counts nest") {
    val n = Tables.embeddings(spark, sf).count()
    val km = q("sim_kmeans_iter").agg(sum("n")).collect().head.getLong(0)
    assert(km == n, "every vector must land in exactly one cell")
    val out = q("emb_outlier").collect()
    assert(out.map(_.getLong(1)).sum == n, "label cohorts must partition the corpus")
    out.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      s"label ${r.getInt(0)}: outliers cannot exceed cohort size"))
  }

  test("dedup Pareto is consistent with the token yield it prioritizes") {
    val paretoRows = q("dedup_pareto_topk").collect()
    val shares = paretoRows.sortBy(_.getInt(0)).map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "cumulative share must be nondecreasing in rank")
    assert(shares.forall(s => s >= 0 && s <= 1.0))
    // the clusters' duplicated tokens can never exceed the corpus-wide
    // saved-token total the yield query reports
    val savedTotal = q("corpus_dedup_yield")
      .agg(sum("saved_tokens")).collect().head.getLong(0)
    val paretoSum = paretoRows.map(_.getLong(3)).sum
    assert(paretoSum <= savedTotal,
      s"top-20 dup tokens $paretoSum must be within the corpus total $savedTotal")
  }

  test("Kaplan-Meier curve matches an independent sequential estimator") {
    // reference: the textbook K-M computed with plain Scala collections
    // from the same raw events — none of the windowed machinery under test
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("t_us div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val hz = p.map(_._2).max
    val subjects = p.groupBy(_._1).values.flatMap { rows =>
      val days = rows.map(_._2).sorted
      days.zip(days.tail).map { case (a, b) => (b - a, true) } :+
        ((hz - days.last, false))
    }.toSeq
    val byT = subjects.groupBy(_._1).view
      .mapValues(s => (s.count(_._2).toLong, s.size.toLong)).toMap
    var atRisk = subjects.size.toLong
    var surv = 1.0
    val expect = byT.toSeq.sortBy(_._1).flatMap { case (t, (d, leave)) =>
      val row = if (d > 0) {
        surv = if (d >= atRisk) 0.0 else surv * (1.0 - d.toDouble / atRisk)
        Some((t, atRisk, d, math.rint(surv * 10000) / 10000))
      } else None
      atRisk -= leave
      row
    }
    val got = q("events_survival_km").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // compare counts exactly; survival to 4 dp with a 1-ulp tolerance for
    // the exp-sum-ln vs direct-product formulation
    assert(got.map(t => (t._1, t._2, t._3)) == expect.map(t => (t._1, t._2, t._3)),
      s"risk sets diverge: $got vs $expect")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) <= 0.0001 + 1e-9,
        s"t=${g._1}: survival ${g._4} vs reference ${e._4}")
    }
    // and the curve is a valid survival function: strictly within [0,1],
    // nonincreasing
    val curve = got.map(_._4)
    assert(curve.forall(s => s >= 0 && s <= 1))
    assert(curve.zip(curve.tail).forall { case (a, b) => a >= b })
  }

  test("substring runs imply span-level duplication: every run pair has dup spans on both sides") {
    val dup = q("text_substring_dup").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val spanDup = q("dedup_span_stats")
      .filter(col("n_dup_spans") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // an 8-token run IS a duplicated 8-token span, so run participants are
    // a subset of the span query's dup-flagged docs
    assert(dup.subsetOf(spanDup),
      s"run docs without dup spans: ${(dup -- spanDup).take(5)}")
  }
}
