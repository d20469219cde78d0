package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stage-attribution invariants of the composed cascade: every stage
  * fires on the planted corpus, keepers are stage-consistent (a
  * keeper can only have fallen at a LATER stage than the doc it
  * represents), and kept rows self-represent. */
class DedupCascadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stage attribution is consistent on the sf0.001 corpus") {
    val rows = graft.queries.ExtQueries
      .dedupCascade(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byId = rows.map(r => r._1 -> r).toMap
    val stages = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // every stage fires on the planted corpus
    Seq("url", "exact", "near", "kept").foreach(s =>
      assert(stages.getOrElse(s, 0) > 0, s"stage $s never fired"))
    rows.foreach { case (id, stage, keeper) =>
      if (stage == "kept") assert(keeper === id)
      else {
        assert(keeper < id) // min-id keeper policy at every stage
        val keeperStage = byId(keeper)._2
        stage match {
          // a near keeper survived all three stages
          case "near" => assert(keeperStage === "kept")
          // an exact keeper survived URL + exact; it may fall at near
          case "exact" => assert(Set("kept", "near")(keeperStage))
          // a url keeper only has to have survived the URL stage
          case "url" => assert(keeperStage !== "url")
        }
      }
    }
  }
}
