package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query executes through the `noop` sink so every projection /
  * expression actually runs (a bare `.count()` would let Catalyst
  * prune all columns and time an empty scan). A query that throws
  * fails the whole bench loudly — a crashed query must never register
  * as a fast time. The JSON line is also mirrored to bench_out.json
  * because sbt's logger prefixes forked stdout with "[info] " unless
  * outputStrategy is StdoutOutput (set in build.sbt).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Throwaway actions pay JVM/codegen warmup AND the one-time parquet
    // footer/OS-cache cost outside the timings — otherwise the first
    // query alphabetically absorbs it and its number stops meaning
    // anything about its plan. Later queries share the page cache
    // either way; this just levels the field.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Seq("lineitem", "orders", "events", "documents", "embeddings",
        "customer", "supplier", "part", "nation", "region").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
    }
    // the q_f1_* queries read the committed fixture set, not sfDir
    Seq("laps", "stints", "drivers", "sessions", "meetings", "pit",
        "car_data", "location").foreach { t =>
      spark.read.parquet(s"${graft.sources.F1Tables.FixtureDir}/$t.parquet")
        .write.format("noop").mode("overwrite").save()
    }
    // Warm EVERY query once untimed before any timing starts: the
    // table-level warmup above levels the I/O field, but the first
    // query to run still absorbs residual codegen/classloading for
    // whatever operators only IT uses (r02 showed q1_agg 2.5× slower
    // purely for running first alphabetically). A full untimed pass
    // makes each timed number a property of the plan, not the order.
    // Streaming gate queries run LAST (alphabetical within each
    // group): r03 showed their state-store machinery and sink setup
    // bleeding into batch timings when interleaved alphabetically.
    val (streaming, batch) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition { case (n, _) => SparkEntry.streamingQueries(n) }
    val ordered = batch ++ streaming
    ordered.foreach { case (_, fn) =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    def line(fmt: Double => String, withSf: Boolean,
             name: String => String = identity,
             withUnit: Boolean = true): String = {
      val qs = results.map { case (k, v) => "\"" + name(k) + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val sf = if (withSf) s""","sf":"$sfDir"""" else ""
      val unit = if (withUnit) ""","unit":"sec"""" else ""
      s"""{"metric":"total","value":${fmt(total)}$unit,"queries":$qs$sf}"""
    }
    def strip(s: String): String =
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    def rounded(decimals: Int)(v: Double): String =
      strip(java.lang.String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v)))
    // sub-second queries keep 2 decimals; coarser variants shave the
    // second decimal off multi-second values (ratio error <= 5%)
    def adaptive(v: Double): String = rounded(if (v >= 1) 1 else 2)(v)
    // every registry name starts q_ (or q1_): the uniform prefix is
    // 2 chars x ~100 queries of pure window budget. BASELINE.md's
    // measured table records the SAME stripped names, so the per-query
    // compare lines up; prepend q_ to recover the registry name.
    def short(n: String): String = n.stripPrefix("q_")
    // Full precision goes to the file; stdout gets a compacted line.
    // The driver keeps only the LAST 2000 chars of stdout and parses
    // the {"metric":...} line out of that window — at full precision
    // 79 queries is ~2300 chars, so the line's head fell outside the
    // window and rounds 1/3/4 recorded "parsed": null. Compaction
    // steps (trailing-zero-stripped 2-decimals → 1-decimal for >=1 s
    // values → drop the informational sf field → strip the uniform
    // q_ name prefix) apply only until the line fits 1900 chars,
    // leaving real window headroom. At 98 queries the raw name mass
    // alone is ~1300 chars, so the prefix strip is ALWAYS active in
    // practice; the earlier stages exist so a trimmed-down suite
    // regains precision automatically.
    Files.writeString(Paths.get("bench_out.json"), line(_.toString, withSf = true) + "\n")
    val out = Seq(
      line(rounded(2), withSf = true),
      line(adaptive, withSf = true),
      line(rounded(2), withSf = true, short),
      line(adaptive, withSf = true, short),
      line(adaptive, withSf = false, short),
      line(rounded(1), withSf = false, short),
      // values-are-seconds is BASELINE.md convention; the unit field
      // is the last ballast to go before precision would have to drop
      // below 0.1 s
      line(rounded(1), withSf = false, short, withUnit = false))
      .find(_.length <= 1900)
      .getOrElse(line(rounded(1), withSf = false, short, withUnit = false))
    // print the artifact line AFTER the session is down: nothing else
    // can interleave with stdout then (r03's driver artifact had a
    // truncated tail from in-flight logging).
    spark.stop()
    println(out)
    System.out.flush()
  }
}
