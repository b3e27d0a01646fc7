package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // aid — the driver always passes exactly two)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
      case other => sys.error(s"usage: Verify <sfDir> <outDir> [q1,q2,...]; got ${other.mkString(" ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the gate runs with the engine's own cartesian guardrail ON (r8):
      // every registry query must plan without an unconditioned,
      // unhinted product — a standing plan regression net, not just a
      // user-facing opt-in
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.failOnCartesian", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Alphabetical order (Map iteration order is arbitrary): if the driver's
    // wall-clock budget cuts the run short, WHICH queries got verified is at
    // least deterministic round-over-round instead of hash-order roulette.
    // r9 (VERDICT Next #1): per-query canonical row digests, written as a
    // sidecar next to oracle_sql.json. A driver-side hash mismatch that no
    // local rerun reproduces (r8's emb_kmeans) is undebuggable without a
    // canonical form both sides can recompute; this one is: columns SORTED
    // BY NAME, every value CAST to Spark's string form (null -> \u0000),
    // columns joined with \u0001, rows SORTED, digest = 64-bit FNV-1a folded
    // over the sorted stream. `head` carries the first rows of the sorted
    // canonical stream so a mismatch names actual content, not just a hash.
    val digests = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.2fs")
        try {
          import org.apache.spark.sql.functions._
          val back = spark.read.parquet(s"$outDir/$name")
          // sentinels are ESCAPED out of values first (a literal \u0000 or
          // \u0001 inside a string value would alias the null marker /
          // column separator), and rows sort in UTF-8 BYTE order — Java's
          // default String order is UTF-16 code units, which disagrees
          // with bytewise/code-point engines (DuckDB ORDER BY, sort(1))
          // for supplementary-plane text, and this canonical form exists
          // precisely so another engine can recompute it
          val cols = back.columns.sorted.map(c =>
            coalesce(
              regexp_replace(regexp_replace(regexp_replace(
                col("`" + c + "`").cast("string"),
                "\u001b", "\u001be"), "\u0000", "\u001bz"), "\u0001", "\u001bo"),
              lit("\u0000")))
          val utf8Order = new Ordering[String] {
            def compare(a: String, b: String): Int = {
              val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
              var i = 0
              val n = math.min(x.length, y.length)
              while (i < n) {
                val d = (x(i) & 0xff) - (y(i) & 0xff)
                if (d != 0) return d
                i += 1
              }
              x.length - y.length
            }
          }
          val rows = back.select(concat_ws("\u0001", cols: _*).as("r"))
            .collect().map(_.getString(0)).sorted(utf8Order)
          val digest = rows.foldLeft(0L) { (acc, r) =>
            // order-sensitive fold over the SORTED stream: 64-bit FNV-1a
            // over the row's UTF-8 BYTES — both the ordering and the hash
            // input are byte-defined, so any engine can replay it
            var h = acc ^ 0xcbf29ce484222325L
            r.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
            h
          }
          val head = rows.take(2).map(_.take(120)).mkString(" | ")
          digests(name) =
            f"n=${rows.length} d=$digest%016x head=$head"
        } catch { case e: Throwable =>
          digests(name) = s"digest_error=${e.getClass.getSimpleName}"
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
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
      .filter(o => only.forall(_.contains(o._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val digestJson = digests
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/row_digests.json"), digestJson)
    spark.stop()
  }
}
