package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BoundLevenshtein, GraftExtensions}

/** The BoundLevenshtein optimizer rule: naive `levenshtein(x,y) <= k`
  * predicates rewrite to the banded thresholded kernel wherever they
  * appear, with identical results. The rule is attached to the shared
  * session via `experimental.extraOptimizations` (the per-session
  * injection point — builder extensions cannot be retrofitted onto a
  * running session); production registration goes through
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BoundLevenshtein
    try f
    finally spark.experimental.extraOptimizations = prev
  }

  // literal Seq fixtures constant-fold into a LocalRelation before the
  // rule can be observed — plan-inspection tests need a real scan
  private def scanFixture = {
    import spark.implicits._
    graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 6)
      .select(substring($"text", 1, 12).as("a"),
        substring($"text", 3, 12).as("b"))
  }

  private def fixture = {
    import spark.implicits._
    Seq(("kitten", "sitting"), ("flaw", "lawn"), ("abc", "abc"),
      ("short", "completely different string"))
      .toDF("a", "b")
  }

  test("naive filter bound rewrites to the thresholded kernel") {
    withRule {
      val df = scanFixture.filter(levenshtein(col("a"), col("b")) <= 3)
      val levs = df.queryExecution.optimizedPlan
        .collect { case n => n.expressions }.flatten
        .flatMap(_.collect { case l: Levenshtein => l })
      assert(levs.nonEmpty, df.queryExecution.optimizedPlan.toString)
      assert(levs.forall(_.threshold.isDefined),
        df.queryExecution.optimizedPlan.toString)
    }
  }

  test("rewrite preserves results across comparison shapes") {
    import spark.implicits._
    val naive = Seq(
      fixture.filter(levenshtein($"a", $"b") <= 3),
      fixture.filter(levenshtein($"a", $"b") < 4),
      fixture.filter(levenshtein($"a", $"b") === 3),
      fixture.filter(lit(3) >= levenshtein($"a", $"b")))
    val expected = naive.map(_.collect().map(_.toSeq).toSet)
    val rewritten = withRule(naive.map(_.collect().map(_.toSeq).toSet))
    assert(rewritten == expected)
    // sanity: the bound actually selects a strict subset of the fixture
    assert(expected.head.nonEmpty && expected.head.size < 4)
  }

  test("already-thresholded and unbounded uses are left alone") {
    withRule {
      // projection (no comparison) must keep the 2-arg exact kernel
      val proj = scanFixture.select(levenshtein(col("a"), col("b")).as("d"))
      val projLevs = proj.queryExecution.optimizedPlan
        .collect { case n => n.expressions }.flatten
        .flatMap(_.collect { case l: Levenshtein => l })
      assert(projLevs.nonEmpty && projLevs.forall(_.threshold.isEmpty))
      // an explicit 3-arg call keeps ITS threshold (no double wrap)
      val pre = scanFixture.filter(levenshtein(col("a"), col("b"), 2) >= 0)
      val preLevs = pre.queryExecution.optimizedPlan
        .collect { case n => n.expressions }.flatten
        .flatMap(_.collect { case l: Levenshtein => l })
      assert(preLevs.nonEmpty)
      assert(preLevs.forall(_.threshold.contains(
        org.apache.spark.sql.catalyst.expressions.Literal(2))))
    }
  }

  test("GraftExtensions installs the rule into a session builder") {
    // the production path: new sessions built with the extension get the
    // rule; we can't rebuild the shared test session, so assert the
    // injection callback itself registers without error
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
