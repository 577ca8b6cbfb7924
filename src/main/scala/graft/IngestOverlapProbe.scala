package graft

import org.apache.spark.sql.SparkSession

/** Measurement tool for VERDICT r15 #7 (never run by the driver): does
  * overlapping `EthPipeline.ingestRange`'s three independent tail writes
  * (block/log/trace, guide §2.6) pay off once the job runs on MULTIPLE
  * executors? The r15 local[32] profile measured it flat (3.63 → 3.56 s:
  * the writes are CPU-saturated 100-task stages in one executor, so
  * overlap reclaims nothing) — but on a real cluster each write's
  * straggler tail idles whole executors that the next write's tasks could
  * back-fill. `local-cluster[n,cores,mem]` is the closest no-network
  * approximation Spark offers (real separate executor JVMs, real
  * scheduler round-trips).
  *
  * Usage:
  *   SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  *     sbt "runMain graft.IngestOverlapProbe [nBlocks] [rounds]"
  * (local[32] / local[8] for the single-executor baselines; on
  * local-cluster the compiled classes dir is shipped via
  * spark.executor.extraClassPath, so no assembly jar is needed.)
  *
  * Interleaved A/B, same discipline as [[PairedBench]]: one warm-up pair,
  * then `rounds` alternating sequential/overlap runs into fresh sink dirs,
  * report = per-variant medians. Each run ingests the SAME synthetic
  * range, so the work is identical and only the scheduling differs.
  */
object IngestOverlapProbe {
  def main(args: Array[String]): Unit = {
    val nBlocks = args.headOption.map(_.toLong).getOrElse(5000L)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(overlap: Boolean): Double = {
      val sink = java.nio.file.Files.createTempDirectory("graft_ovl").toString
      val t0 = System.nanoTime()
      graft.eth.EthPipeline.ingestRange(spark, sink, 0L, nBlocks - 1,
        overlapTailWrites = overlap)
      val t = (System.nanoTime() - t0) / 1e9
      // cleanup outside the timed window
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(sink))
      t
    }
    run(overlap = false); run(overlap = true) // warm-up, untimed
    val (seqT, ovlT) = (1 to rounds).map { _ =>
      (run(overlap = false), run(overlap = true))
    }.unzip
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val nExec = spark.sparkContext.statusTracker.getExecutorInfos.length
    println(f"""{"probe":"ingest_overlap","master":"$master","n_executors":$nExec,"n_blocks":$nBlocks,"rounds":$rounds,"seq_median_s":${median(seqT)}%.3f,"overlap_median_s":${median(ovlT)}%.3f,"seq_raw":[${seqT.map(x => f"$x%.2f").mkString(",")}],"overlap_raw":[${ovlT.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
