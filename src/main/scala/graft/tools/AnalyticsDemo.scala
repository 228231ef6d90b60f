package graft.tools

import graft.engine.{Registry, Sessions}

/** Runnable product-analytics walkthrough: the event-stream and entity
  * analytics a dashboard backend would issue, straight from the declared
  * registry — conversion funnel, retention cohorts, activity streaks,
  * growth curve, RFM segmentation, sequence-pattern match, and the
  * FK-integrity audit that gates them all. Run:
  *   sbt "runMain graft.tools.AnalyticsDemo /root/testdata/sf0.001"
  */
object AnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(appName = "graft-analytics-demo")
    val show = Seq(
      "q_fk_audit" -> "referential-integrity audit (load gate)",
      "q_funnel" -> "view -> click -> purchase conversion funnel",
      "q_cohort" -> "weekly retention cohorts",
      "q_streak" -> "longest activity streaks per user",
      "q_win_cumdistinct" -> "daily actives + cumulative distinct users",
      "q_rfm" -> "RFM customer segmentation",
      "q_seq_match" -> "sequence-pattern funnel (regex form)",
      "q_skew_profile" -> "hottest join keys (skew pre-flight)")
    show.foreach { case (name, what) =>
      println(s"\n=== $name — $what")
      Registry.byName(name).run(spark, sf).show(8, truncate = false)
    }
    spark.stop()
  }
}
