package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable pin for the committed adjudication tooling: the canary
  * table must keep rendering from the git history, or BENCH_r{N} loses
  * its mechanical noise-vs-regression read. Cancels (not fails) where
  * python3 or the git checkout is unavailable. */
class ToolingSpec extends AnyFunSuite {

  test("canary_table.py renders the committed adjudication history") {
    import scala.sys.process._
    val python = try { Seq("python3", "--version").! == 0 } catch { case _: Throwable => false }
    assume(python, "python3 unavailable on this rig")
    assume(new java.io.File(".git").exists, "not running from a git checkout")
    val out = Seq("python3", "tools/canary_table.py").!!
    assert(out.linesIterator.count(_.startsWith("| round")) >= 4,
      s"expected at least the r5-r8 driver rows:\n$out")
    val header = out.linesIterator.next()
    Seq("canary", "ratio", "artifact reads", "fast-floor").foreach(c =>
      assert(header.contains(c), s"header lost the '$c' column:\n$header"))
  }
}
