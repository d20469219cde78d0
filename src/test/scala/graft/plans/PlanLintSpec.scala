package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Automated plan lint over every batch gate query — the checks that
  * used to be eyeballed via `runMain graft.PlanAudit`, as assertions:
  *
  *  1. no `CartesianProductExec` anywhere (broadcast 1-row scalars and
  *     broadcast query sets plan as BroadcastNestedLoopJoin, which is
  *     fine; a real cartesian on two scaling sides is never fine);
  *  2. no unpartitioned `WindowExec` (a global window funnels the
  *     whole input through one task at 100 TB; every window in the
  *     library must ride a partition key);
  *  3. every parquet scan that has scan-evaluable data filters pushes
  *     at least one of them into the reader (`PushedFilters` non-empty
  *     — a filter Spark holds above the scan reads the whole file).
  *
  * Streaming gate queries are excluded: calling them RUNS a stream to
  * completion; their plan shapes are spec'd in StreamingSpec /
  * Openf1SourceSpec instead. Plans are built at sf0.001 — lint reads
  * plan structure, not data, but a handful of queries (iterative
  * dedup clusters, sampling calibration) execute small jobs while
  * building their DataFrame.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val plans: Seq[(String, SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => SparkEntry.streamingQueries(n) }
      .map { case (n, fn) => n -> fn(spark, sfDir).queryExecution.sparkPlan }

  test("no CartesianProduct in any batch gate query") {
    val offenders = plans.flatMap { case (n, p) =>
      p.collectWithSubqueries { case c: CartesianProductExec => n }
    }.distinct
    assert(offenders.isEmpty,
      s"CartesianProductExec (non-broadcast cross join) in: $offenders")
  }

  test("no unpartitioned Window in any batch gate query") {
    val offenders = plans.flatMap { case (n, p) =>
      p.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => n
      }
    }.distinct
    assert(offenders.isEmpty, s"global (unpartitioned) WindowExec in: $offenders")
  }

  test("parquet scans push every source-translatable filter down") {
    // a dataFilter that Spark can express as a source Filter must show
    // up in PushedFilters; untranslatable expressions (salted-hash
    // predicates, UDF-ish math) are legitimately evaluated post-scan.
    // "Translatable" here is a conservative mirror of Spark's
    // DataSourceStrategy.translateFilter (which is protected):
    // attribute-vs-literal comparisons, null tests, IN lists, and
    // boolean combinations thereof.
    import org.apache.spark.sql.catalyst.expressions._
    def attrLit(l: Expression, r: Expression): Boolean =
      (l.isInstanceOf[Attribute] && r.isInstanceOf[Literal]) ||
        (l.isInstanceOf[Literal] && r.isInstanceOf[Attribute])
    def translatable(e: Expression): Boolean = e match {
      case And(l, r)      => translatable(l) && translatable(r)
      case Or(l, r)       => translatable(l) && translatable(r)
      case Not(c)         => translatable(c)
      case b: BinaryComparison => attrLit(b.left, b.right)
      case IsNull(c)      => c.isInstanceOf[Attribute]
      case IsNotNull(c)   => c.isInstanceOf[Attribute]
      case In(v, list)    => v.isInstanceOf[Attribute] && list.forall(_.isInstanceOf[Literal])
      case InSet(v, _)    => v.isInstanceOf[Attribute]
      case _              => false
    }
    val offenders = plans.flatMap { case (n, p) =>
      p.collectWithSubqueries {
        case s: FileSourceScanExec
            if s.dataFilters.exists(translatable) &&
              s.metadata.get("PushedFilters").exists(_ == "[]") =>
          (n, s.dataFilters.mkString(", "))
      }
    }
    assert(offenders.isEmpty, s"scans holding translatable filters: $offenders")
  }
}
