package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Sketch
    val d = "/root/repo/testdata-sf1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.3f s ($r)")
    }
    spark.range(1000).select(sum("id")).head()

    def stages(): Unit = {
      val docs = Tables(spark, d).documents
      var toked: org.apache.spark.sql.DataFrame = null
      time("  tokenize+ckpt") {
        toked = docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks")).localCheckpoint()
        toked.count()
      }
      var pos: org.apache.spark.sql.DataFrame = null
      time("  pos explode+ckpt") {
        pos = toked.select(col("doc_id"),
          posexplode(Sketch.gram_hash_positions(col("toks"), 8)).as(Seq("pos", "gh")))
          .localCheckpoint()
        pos.count()
      }
      var shared: org.apache.spark.sql.DataFrame = null
      time("  df-agg (minmax)") {
        shared = pos.groupBy("gh")
          .agg(min(col("doc_id")).as("_a"), max(col("doc_id")).as("_b"))
          .filter(col("_a") =!= col("_b")).select("gh")
        shared.count()
      }
      var starts: org.apache.spark.sql.DataFrame = null
      time("  semi-join+collect_set") {
        starts = pos.join(shared, Seq("gh"), "left_semi")
          .groupBy("doc_id")
          .agg(sort_array(collect_set(col("pos"))).as("starts"))
        starts.count()
      }
      time("  final join+kernel+sort+noop") {
        val fin = toked.join(starts, Seq("doc_id"), "left")
          .select(col("doc_id"), col("toks"),
            coalesce(col("starts"), array().cast("array<int>")).as("starts"))
          .select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens"),
            (size(col("toks")) - size(Sketch.remove_covered(col("toks"), col("starts"), 8))).cast("bigint").as("n_removed"),
            array_join(Sketch.remove_covered(col("toks"), col("starts"), 8), " ").as("cleaned_text"))
          .orderBy("doc_id")
        fin.write.format("noop").mode("overwrite").save()
      }
    }
    def noPosCkpt(): Unit = {
      val docs = Tables(spark, d).documents
      val toked = docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks")).localCheckpoint()
      val pos = toked.select(col("doc_id"),
        posexplode(Sketch.gram_hash_positions(col("toks"), 8)).as(Seq("pos", "gh")))
      val shared = pos.groupBy("gh")
        .agg(min(col("doc_id")).as("_a"), max(col("doc_id")).as("_b"))
        .filter(col("_a") =!= col("_b")).select("gh")
      val starts = pos.join(shared, Seq("gh"), "left_semi")
        .groupBy("doc_id")
        .agg(sort_array(collect_set(col("pos"))).as("starts"))
      val fin = toked.join(starts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("toks"),
          coalesce(col("starts"), array().cast("array<int>")).as("starts"))
        .select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens"),
          (size(col("toks")) - size(Sketch.remove_covered(col("toks"), col("starts"), 8))).cast("bigint").as("n_removed"),
          array_join(Sketch.remove_covered(col("toks"), col("starts"), 8), " ").as("cleaned_text"))
        .orderBy("doc_id")
      fin.write.format("noop").mode("overwrite").save()
    }
    def windowVariant(): Unit = {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(spark, d).documents
      val toked = docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks")).localCheckpoint()
      val pos = toked.select(col("doc_id"),
        posexplode(Sketch.gram_hash_positions(col("toks"), 8)).as(Seq("pos", "gh")))
      val w = Window.partitionBy("gh")
      val starts = pos
        .withColumn("_a", min(col("doc_id")).over(w))
        .withColumn("_b", max(col("doc_id")).over(w))
        .filter(col("_a") =!= col("_b"))
        .groupBy("doc_id")
        .agg(sort_array(collect_set(col("pos"))).as("starts"))
      val fin = toked.join(starts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("toks"),
          coalesce(col("starts"), array().cast("array<int>")).as("starts"))
        .select(col("doc_id"), col("toks"),
          Sketch.remove_covered(col("toks"), col("starts"), 8).as("kept"))
        .select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens"),
          (size(col("toks")) - size(col("kept"))).cast("bigint").as("n_removed"),
          array_join(col("kept"), " ").as("cleaned_text"))
        .orderBy("doc_id")
      fin.write.format("noop").mode("overwrite").save()
    }
    time("window warm")(windowVariant())
    time("window")(windowVariant())
    time("window")(windowVariant())
    time("noPosCkpt warm")(noPosCkpt())
    time("noPosCkpt")(noPosCkpt())
    time("noPosCkpt")(noPosCkpt())
    time("current")(graft.queries.ScaleOps.q74(spark, d).write.format("noop").mode("overwrite").save())
    time("current")(graft.queries.ScaleOps.q74(spark, d).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
