package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool for the r17 optimization round: dumps the formatted EXECUTED
  * plan of each touched query to `<outDir>/<qid>_<suffix>.txt` so the
  * judge can check plan claims without running Spark.
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [qids...]
  */
object PlanDump {
  val Touched: Seq[String] = Seq(
    "q160_curation_funnel", "q163_rejection_audit",
    "q176_neardup_artifact_append", "q177_containment_pairs",
    "q179_minhash_estimate_error", "q217_lsh_geometry_card",
    "q222_epoch_shuffle", "q227_ccnet_training_chunks",
    "q202_lr_quality_train", "q204_classifier_eval",
    "q206_threshold_sweep", "q215_platt_recalibration",
    "q224_calibration_method_card")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val suffix = args(2)
    val only = args.drop(3).toSet
    val spark = graft.GraftSession.get("graft-plandump")
    Files.createDirectories(Paths.get(out))
    for (name <- Touched if only.isEmpty || only.exists(name.startsWith)) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect() // finalize AQE so the printed plan is the executed one
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val qid = name.takeWhile(_ != '_')
      Files.write(Paths.get(s"$out/${qid}_$suffix.txt"),
        (s"# $name — explain(formatted), executed plan at $dir\n\n" + txt)
          .getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $qid" + s"_$suffix.txt")
    }
    spark.stop()
  }
}
