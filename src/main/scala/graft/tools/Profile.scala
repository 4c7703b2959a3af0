package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch profiler: times sub-stages of hot queries. Not part of the
  * library surface. Usage: runMain graft.tools.Profile <sfDir> <what>. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-profile")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = graft.sources.Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))").as("shingles"))
      .select(col("doc_id"), explode(col("shingles")).as("sh"))

    time("shingle explode")(sh.count())
    val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val docsArr = sh.join(freq, "sh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("sorted"))
      .select(col("doc_id"), expr("transform(sorted, s -> s.sh)").as("shingles"),
        size(col("sorted")).as("n"))
    time("docsArr")(docsArr.count())
    val cachedDocsArr = docsArr.cache()
    time("docsArr cached")(cachedDocsArr.count())
    val prefixes = cachedDocsArr.select(col("doc_id"),
      explode(expr("slice(shingles, 1, n - CAST(CEIL(0.5 * n) AS INT) + 1)")).as("sh"))
    time("prefixes")(prefixes.count())
    val cand = prefixes.as("a").join(prefixes.as("b"), Seq("sh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(cand.count())
    val verified = cand
      .join(cachedDocsArr.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(cachedDocsArr.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .filter(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")) >= 0.5)
    time("verify")(verified.count())
    time("full q72")(graft.operators.Dedup.ngramJaccardPairs(spark, dir).count())
    time("full q73 minhash")(graft.operators.Dedup.minhashLshPairs(spark, dir).count())
    spark.stop()
  }
}
