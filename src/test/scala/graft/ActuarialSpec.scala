package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

import graft.actuarial.Actuarial

class ActuarialSpec extends SparkSpec {

  /** Tiny policy CSV fixture (FIXTURES.md §A.1 schema + golden value). */
  private lazy val policyCsv: String = {
    val dir = Files.createTempDirectory("graft_policies_")
    val rows =
      """id,age,gender,smoking_status,occupation,policy_type,effective_date,term,premium
        |P-0001,34.0,F,non-smoker,engineer,term-life,2020-01-15,3650.0,120.50
        |P-0002,51.0,M,smoker,teacher,whole-life,2018-06-01,7300.0,310.00
        |""".stripMargin
    Files.writeString(dir.resolve("policy_1.csv"), rows)
    dir.toString
  }

  test("readPolicies parses the reference CSV schema") {
    val ds = Actuarial.readPolicies(spark, policyCsv)
    val rows = ds.collect().sortBy(_.id)
    assert(rows.length == 2)
    assert(rows(0).id == "P-0001" && rows(0).term == 3650.0)
    assert(rows(1).premium == 310.0)
  }

  test("closed-form expected reserves matches the FIXTURES.md golden value") {
    val expected = Actuarial.readPolicies(spark, policyCsv).toDF()
      .agg(sum(Actuarial.expectedReservePerPolicy)).first().getDouble(0)
    // 100/(e^0.1−1) + 100/(e^0.05−1) ≈ 950.83 + 1950.42 ≈ 2901.25
    assert(math.abs(expected - 2901.25) < 0.01, s"got $expected")
  }

  test("seeded Monte Carlo lands within a CLT band of the closed form") {
    val p = Actuarial.policiesFromOrders(spark, sf)
    val mc = Actuarial.simulateReserves(p, nSims = 300, seed = 7L)
      .agg(sum("mc_reserves")).first().getDouble(0)
    val exact = p.agg(sum(Actuarial.expectedReservePerPolicy)).first().getDouble(0)
    // loose 5σ-style band: MC avg over 300 trials of ~1500 policies
    assert(math.abs(mc - exact) / exact < 0.05,
      s"mc=$mc exact=$exact relerr=${math.abs(mc - exact) / exact}")
  }

  test("sum-of-averages gather is NOT a global average (SURVEY §2.4 trap)") {
    val df = Actuarial.q23GatherSumOfAvgs(spark, sf)
    val sumOfAvgs = df.first().getDouble(0)
    val p = Actuarial.policiesFromOrders(spark, sf)
    val globalAvg = p.agg(avg(Actuarial.expectedReservePerPolicy)).first().getDouble(0)
    assert(sumOfAvgs > globalAvg * 2, "sum over groups must exceed any single average")
  }

  test("partitionPlan reproduces the reference slice semantics exactly") {
    val prop = forAll(Gen.chooseNum(0, 200), Gen.chooseNum(1, 24)) { (n: Int, w: Int) =>
      val files = (0 until n).map(i => f"policy_$i%04d.csv")
      val plan = Actuarial.partitionPlan(files, w)
      plan.length == w &&
        plan.flatten == files && // disjoint cover, original order
        plan.forall(_.length <= math.ceil(n.toDouble / w).toInt)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(res.passed, res.status.toString)
  }

  test("term <= 0 policies are excluded, not a crash (reference panics)") {
    import spark.implicits._
    val p = Seq(
      ("P-1", "t", 3650.0, 1.0),
      ("P-2", "t", 0.0, 1.0), // reference: Exp::new panics
      ("P-3", "t", -10.0, 1.0))
      .toDF("id", "policy_type", "term", "premium")
    val out = Actuarial.simulateReserves(p, nSims = 10, seed = 1L).collect()
    assert(out.length == 1) // only the valid policy's group
    assert(out(0).getDouble(1) >= 0.0)
  }

  test("N < W leaves trailing workers empty (entrypoint.sh edge)") {
    val plan = Actuarial.partitionPlan(Seq("a", "b", "c"), 5)
    assert(plan.take(3).forall(_.length == 1) && plan.drop(3).forall(_.isEmpty))
  }
}
