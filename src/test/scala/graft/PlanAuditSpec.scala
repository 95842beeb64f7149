package graft

/** The plan-shape gate as part of `sbt test`: every registered query's
  * physical plan must be free of 100 TB anti-patterns (global windows,
  * cartesian products, unbounded broadcast nested-loop joins) at
  * sf0.001. Same core as the `graft.PlanAudit` main — a plan regression
  * now fails the suite instead of waiting for a manual audit run.
  */
class PlanAuditSpec extends SparkSpec {
  test("no registered query plan trips a scale anti-pattern rule") {
    val flagged = PlanAudit.run(spark, sfDir)
    assert(flagged.isEmpty, s"plan audit flagged: ${flagged.mkString(", ")}")
  }

  test("no engine-facade read plan trips a scale anti-pattern rule") {
    val flagged = PlanAudit.runFacade(spark)
    assert(flagged.isEmpty, s"facade plan audit flagged: ${flagged.mkString(", ")}")
  }
}
