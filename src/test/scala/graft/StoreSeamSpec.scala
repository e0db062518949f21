package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-readiness guard (VERDICT r03 item 6): every engine read/write
  * of a table must go through the [[graft.store.TableStore]] seam — a
  * direct `spark.read.parquet` in engine code would silently bypass the
  * production catalog when the store implementation is swapped to
  * Iceberg. This spec greps the main source tree and fails on any
  * `.parquet(` call site outside the explicit allowlist:
  *
  *  - `store/TableStore.scala` — the seam itself (its parquet
  *    implementation is the only legitimate format-specific code);
  *  - `Bench*.scala` / `Verify.scala` — driver-contract harness mains:
  *    they generate scratch corpora in bench work dirs and dump the
  *    driver's verification parquet, none of which are engine tables;
  *  - `streaming/IndexStream.scala` / `streaming/EventsStream.scala` —
  *    `spark.readStream...parquet(dir)` is the micro-batch FILE SOURCE
  *    (the sandbox stand-in for streaming off an Iceberg commit log);
  *    `DataStreamReader` has no table-store seam to route through, and
  *    each file carries exactly one such source declaration.
  */
class StoreSeamSpec extends AnyFunSuite {

  private val allowed: Set[String] = Set(
    "store/TableStore.scala",
    "Bench.scala", "BenchBuild.scala", "BenchProbe.scala", "BenchBurn.scala",
    "Verify.scala",
    "streaming/IndexStream.scala", "streaming/EventsStream.scala")

  test("no direct parquet read/write outside the TableStore seam") {
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"source root missing: ${root.toAbsolutePath}")
    val sources: Seq[Path] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    assert(sources.size > 10, "sanity: the walk must see the main tree")

    val offenders = sources.flatMap { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      if (allowed.contains(rel)) Nil
      else {
        val lines = Files.readAllLines(p).asScala
        lines.zipWithIndex.collect {
          case (l, i) if l.contains(".parquet(") => s"$rel:${i + 1}: ${l.trim}"
        }
      }
    }
    assert(offenders.isEmpty,
      "direct parquet call sites outside TableStore (route through the store seam):\n" +
        offenders.mkString("\n"))

    // and the streaming allowance is exactly the declared file sources —
    // one DataStreamReader .parquet per streaming file, nothing more
    for (s <- Seq("streaming/IndexStream.scala", "streaming/EventsStream.scala")) {
      val text = new String(Files.readAllBytes(root.resolve(s)))
      val n = "\\.parquet\\(".r.findAllIn(text).size
      assert(n == 1, s"$s: expected exactly one streaming file-source .parquet( call, got $n")
      assert(text.contains("readStream"), s"$s: the allowed .parquet( must be a readStream source")
    }
  }
}
