package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Verify <sfDir> <outDir>")
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional third arg: comma-separated query-name filter (local
    // iteration only; the driver always passes exactly two args)
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    // A thrown query must leave LOUD evidence, not silent absence: a
    // `_failed/<name>.txt` with the full stack so both the driver's gate
    // and tools/check_oracle.py can count it as a failure instead of a
    // missing key (the round-8 events-reader regression hid 33 crashed
    // queries exactly this way).
    val failedDir = Paths.get(outDir, "_failed")
    // clear stale markers from a previous run so every marker present
    // after exit belongs to THIS run
    if (Files.isDirectory(failedDir)) {
      val s = Files.list(failedDir)
      try s.forEach(p => Files.deleteIfExists(p)) finally s.close()
    }
    var nFailed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        nFailed += 1
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        // drop any stale <outDir>/<name> parquet from a previous run of
        // the same outDir — leaving it would let the comparer print a
        // bogus PASS for a query that just threw
        val stale = Paths.get(outDir, name)
        if (Files.isDirectory(stale)) {
          val s = Files.walk(stale)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally s.close()
        }
        Files.createDirectories(failedDir)
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        Files.writeString(failedDir.resolve(s"$name.txt"), sw.toString)
      }
    }
    if (nFailed > 0)
      System.err.println(s"[verify] $nFailed queries FAILED — see $failedDir")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
