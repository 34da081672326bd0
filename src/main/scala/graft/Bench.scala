package graft

import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — prints ONE JSON line per the driver contract.
  *
  * Headline metric: extraction turns/sec over a deterministic synthetic
  * transcript table (the north-rule metric), measured end-to-end from
  * parquet scan through the ordering window, forced via the noop sink so
  * Catalyst cannot prune the extraction expression (a bare count() would
  * optimize the whole pipeline away).
  *
  * Per-query timings cover every SparkEntry operator on
  * SPARK_GRAFT_SF_DIR. Parallelism comes from SPARK_GRAFT_CPUS
  * (local[cpus]); the N-vs-4N scaling evidence is produced by running
  * this main at 8 and 32 (see ScalingBench + BENCH.md).
  */
object Bench {

  def makeSpark(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      // 2x threads: AQE coalesces the surplus; never fewer waves than cores
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // small splits so scan parallelism is never the scaling ceiling
      // (a ~1 GB bench input at 128 MB splits = 8 tasks — that, not the
      // engine, would cap local[32])
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // shuffle files on tmpfs: this box has one virtual disk whose
      // bandwidth is flat in thread count — a constant ~3.5 s shuffle
      // floor at every parallelism level. A real cluster shuffles over
      // many NVMe + NICs; RAM-backed local dirs restore that property
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.expr.Functions.register(s)
    s
  }

  def forceAll(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Materialize the bench transcript table once (deterministic content;
    * reused across runs/parallelism levels so every measurement reads the
    * same bytes).
    */
  def benchInput(spark: SparkSession, nConvs: Int, cap: Int): (String, Long) = {
    val path = s"/tmp/graft_bench_transcripts_${nConvs}_$cap"
    if (!graft.io.FsUtil.successExists(path)) {
      // fixed file count — input layout identical no matter which
      // parallelism level generated it
      SparkEntry.transcripts(spark, nConvs, cap)
        .repartition(256)
        .write.mode("overwrite").parquet(path)
    }
    (path, spark.read.parquet(path).count())
  }

  /** One timed extraction pass; returns (seconds, turns/sec). */
  def timeExtraction(spark: SparkSession, path: String, nTurns: Long): (Double, Double) = {
    val t0 = System.nanoTime()
    forceAll(ExtractPipeline.extract(spark.read.parquet(path)))
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, nTurns / sec)
  }

  /** Single-thread spin-rate probe (million splitmix64 mixes/sec): the
    * host-steal CONTROL. The loop's rate on an unloaded core is stable
    * run-to-run; CPU steal on this shared-host VM depresses it in direct
    * proportion. Probes run before and between the measured passes so a
    * contaminated measurement window is machine-detectable from the
    * bench JSON itself (two rounds running, the driver's recorded number
    * landed in a stolen window and had to be argued after the fact).
    */
  def spinProbeMops(iters: Long = 150000000L): Double = {
    var x = 0x9E3779B97F4A7C15L
    val t0 = System.nanoTime()
    var i = 0L
    while (i < iters) {
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // consume x so the JIT cannot dead-code the loop
    if (x == 42L) System.err.print("")
    iters / sec / 1e6
  }

  /** All-cores spin probe: `threads` concurrent splitmix loops, AGGREGATE
    * mops. The single-thread probe misses steal that only bites at full
    * width (another tenant taking half the host's cores leaves one core
    * fast); this one measures the aggregate CPU actually available to a
    * 32-wide stage.
    */
  def parallelSpinMops(threads: Int, itersPerThread: Long = 40000000L): Double = {
    val rates = new Array[Double](threads)
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => rates(i) = spinProbeMops(itersPerThread))
      t.start(); t
    }
    ts.foreach(_.join())
    rates.sum
  }

  /** One measurement window: nPasses timed extraction passes, each
    * bracketed by the single-thread and all-cores CPU probes, plus the
    * contamination classification (steal_suspect).
    */
  final case class WindowResult(passes: Seq[(Double, Double)],
      probes: Seq[Double], parProbes: Seq[Double]) {
    def bestSec: Double = passes.map(_._1).min
    def bestTps: Double = passes.map(_._2).max
    // contamination heuristics: pass spread beyond 1.4x, or either CPU
    // control (1-thread / all-cores aggregate) sagging within the window.
    // The FIRST measured pass is excluded from the spread whenever a
    // steadier pass exists (it stays in pass_tps raw): tiered JIT +
    // shuffle-file warm-in make it the slowest in every observed window,
    // clean or not, so including it flags clean windows (with one
    // remaining pass the spread degenerates to 1.0 and the probes stay
    // the signal); the probes remain the direct CPU evidence.
    def passSpread: Double = {
      val steady = if (passes.length > 1) passes.drop(1) else passes
      steady.map(_._1).max / steady.map(_._1).min
    }
    def probeSag: Double = probes.min / probes.max
    def parSag: Double = parProbes.min / parProbes.max
    /** Contamination vs `parRef`, the best all-cores probe seen ACROSS
      * the whole bench run. Within-window sag misses a window that is
      * UNIFORMLY stolen (every probe depressed the same amount shows no
      * sag); once any window in the run has seen true idle capacity,
      * every window is also held to 0.75 of it. Defaults to this
      * window's own max (pure within-window classification).
      */
    def stealSuspect(parRef: Double = parProbes.max): Boolean =
      passSpread > 1.4 || probeSag < 0.75 || parSag < 0.7 ||
        parProbes.min / parRef < 0.75
    def json(parRef: Double): String = {
      val passJson = passes.map(p => f"${p._2}%.0f").mkString("[", ",", "]")
      val probeJson = probes.map(p => f"$p%.1f").mkString("[", ",", "]")
      val parJson = parProbes.map(p => f"$p%.0f").mkString("[", ",", "]")
      s"""{"pass_tps":$passJson,"spin_probe_mops":$probeJson,""" +
        s""""spin_par_mops":$parJson,"steal_suspect":${stealSuspect(parRef)}}"""
    }
  }

  def measureWindow(spark: SparkSession, path: String, nTurns: Long,
      nPasses: Int, nThreads: Int): WindowResult = {
    val probes = scala.collection.mutable.ArrayBuffer(spinProbeMops())
    val parProbes = scala.collection.mutable.ArrayBuffer(
      parallelSpinMops(nThreads))
    val passes = (1 to nPasses).map { _ =>
      val r = timeExtraction(spark, path, nTurns)
      probes += spinProbeMops()
      parProbes += parallelSpinMops(nThreads)
      r
    }
    WindowResult(passes, probes.toSeq, parProbes.toSeq)
  }

  /** Run every SparkEntry query once against sfDir. Returns per-query
    * seconds (-1.0 on failure) plus the failure's class + message — a
    * broken query in a driver bench must be diagnosable from the JSON
    * alone, not require a rerun (round-3 hygiene item).
    */
  def runQueries(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame] =
        SparkEntry.queries): (Seq[(String, Double)], Map[String, String]) = {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // NonFatal only: an OutOfMemoryError/StackOverflowError must abort
      // the whole bench (timings on a compromised JVM are not an
      // artifact), not be recorded as a per-query -1 (round-4 ADVICE)
      val ok = try { forceAll(fn(spark, sfDir)); true }
        catch { case scala.util.control.NonFatal(e) =>
          errors(name) =
            s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
              .take(300)
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    (results, errors.toMap)
  }

  /** JSON string-body escape: backslash, quote, and EVERY control char
    * (an exception message with a stray control byte must not break the
    * driver's json.load — same rule Verify applies to oracle SQL).
    */
  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => " "
    case c => c.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 600k convs ~ 6.35M turns (same input ScalingBench uses, reused on
    // disk): the round-1 default (30k convs = 323k turns) could not
    // amortize the ~5s job/shuffle floor, so the driver recorded 38k
    // turns/sec while the engine sustains >1M — the measured pass must
    // be long enough that fixed costs are noise
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "600000").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "512").toInt
    val spark = makeSpark(cpus)

    val (path, nTurns) = benchInput(spark, nConvs, cap)
    // JIT/codegen warmup on a slice, then up to maxWindows measurement
    // WINDOWS of nPasses each. The floor of a window is its claim
    // (shared-host CPU steal only ever slows a pass down; see BENCH.md
    // noise protocol); every pass is bracketed by CPU probes so a stolen
    // window is machine-classified (steal_suspect). Round-3 gap: the
    // probes detected contamination but the artifact still recorded the
    // dirty window — now the bench RETRIES into a certified-clean window
    // (first clean window wins; if every attempt is flagged, the best
    // flagged window is reported WITH its flag and all windows ride in
    // the JSON as evidence).
    forceAll(ExtractPipeline.extract(
      spark.read.parquet(path).limit(20000)))
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "4").toInt
    val maxWindows = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "3").toInt)
    spinProbeMops(1000000L) // JIT the probe loop itself
    val nThreads = cpus.toInt
    val windows = scala.collection.mutable.ArrayBuffer.empty[WindowResult]
    // parRef only grows, so a window judged clean against the final ref
    // stays clean; loop until some window is clean vs the best capacity
    // seen so far, or the retry budget runs out. AT LEAST TWO windows
    // are always measured (budget permitting): the cross-window anchor
    // is blind until a second sample exists — a single UNIFORMLY stolen
    // window shows no within-window sag and its own max IS the ref, so
    // stopping after one "clean" window would re-open exactly the blind
    // spot the anchor closes (round-4 review finding).
    val minWindows = math.min(2, maxWindows)
    def parRef: Double = windows.map(_.parProbes.max).max
    while (windows.size < maxWindows &&
        (windows.size < minWindows || !windows.exists(!_.stealSuspect(parRef)))) {
      if (windows.nonEmpty)
        System.err.println(
          s"[bench] window ${windows.size}: no certified-clean window yet; " +
            "measuring another")
      windows += measureWindow(spark, path, nTurns, nPasses, nThreads)
    }
    // headline: the first clean window (vs the run-wide capacity ref),
    // else the best flagged one (its flag rides into the top-level
    // steal_suspect field)
    val headline = windows.find(!_.stealSuspect(parRef))
      .getOrElse(windows.maxBy(_.bestTps))
    val (exSec, tps) = headline.passes.minBy(_._1)

    val (results, qErrors) = runQueries(spark, sfDir)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = qErrors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + jsonEscape(v) + "\"" }
      .mkString("{", ",", "}")
    val total = exSec + results.map(_._2).filter(_ > 0).sum
    val passJson = headline.passes.map(p => f"${p._2}%.0f")
      .mkString("[", ",", "]")
    val probeJson = headline.probes.map(p => f"$p%.1f").mkString("[", ",", "]")
    val parJson = headline.parProbes.map(p => f"$p%.0f")
      .mkString("[", ",", "]")
    val windowsJson = windows.map(_.json(parRef)).mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","extract_sec":$exSec%.3f,"turns_per_sec":$tps%.0f,"pass_tps":$passJson%s,"spin_probe_mops":$probeJson%s,"spin_par_mops":$parJson%s,"steal_suspect":${headline.stealSuspect(parRef)}%s,"windows":$windowsJson%s,"n_windows":${windows.size}%d,"par_ref_mops":${f"$parRef%.0f"}%s,"query_errors":$errJson%s,"n_turns":$nTurns%d,"cpus":$cpus%s,"n_convs":$nConvs%d}""")
    spark.stop()
  }
}
