package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round debug probe: what output partitioning does the
  * cached token hub report to consumers? */
object ProbePart {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.queries.PipelineOps.tokenTable(spark, sfDir)
    t.count() // materialize cache
    val qe = t.groupBy("doc_id").count().queryExecution
    val sp = qe.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      System.err.println("  " * d + p.getClass.getSimpleName +
        " part=" + p.outputPartitioning)
      p.children.foreach(walk(_, d + 1))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, d + 1)
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(i.relation.cachedPlan, d + 1)
        case _ =>
      }
    }
    walk(sp, 0)
    spark.stop()
  }
}
