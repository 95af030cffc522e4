package graft

/** Test-side sink for the MEASURED recall/error numbers behind every
  * rows-only (probabilistic) registry entry. Specs call
  * `RecallLog.record(op, metric, value)` at the point where they
  * already computed the number for their assertion; the log lands in
  * `RECALL_<round>.json` at the repo root so the driver's rows-only
  * correctness rows carry a quantity, not just a green spec.
  *
  * Writes are merge-on-write (read file → merge → atomic-move
  * rewrite), so the artifact accumulates across suites regardless of
  * execution order within the one forked test JVM, and a reader never
  * sees a half-written file. (Concurrent WRITER JVMs could still lose
  * each other's merges — sbt runs all suites in a single forked JVM
  * here, where the method-level lock is sufficient.)
  */
object RecallLog {
  private val round = sys.env.getOrElse("GRAFT_ROUND", "r14")
  private val path = java.nio.file.Paths.get(
    sys.env.getOrElse("GRAFT_REPO_DIR", "/root/repo"), s"RECALL_$round.json")

  def record(op: String, metric: String, value: Double): Unit = synchronized {
    val existing: Map[String, Map[String, Double]] =
      if (java.nio.file.Files.exists(path)) parse(java.nio.file.Files.readString(path))
      else Map.empty
    val merged = existing.updated(op,
      existing.getOrElse(op, Map.empty).updated(metric, value))
    val json = merged.toSeq.sortBy(_._1).map { case (o, ms) =>
      val fields = ms.toSeq.sortBy(_._1)
        .map { case (m, v) => s""""$m": ${fmt(v)}""" }.mkString(", ")
      s"""  "$o": {$fields}"""
    }.mkString("{\n", ",\n", "\n}\n")
    val tmp = path.resolveSibling(s".${path.getFileName}.tmp")
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.6f".reverse.dropWhile(_ == '0').reverse.stripSuffix(".")

  // minimal parser for exactly the flat two-level shape this object
  // writes (specs are the only writer, so no general JSON needed)
  private def parse(s: String): Map[String, Map[String, Double]] = {
    val op = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
    val kv = """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r
    op.findAllMatchIn(s).map { m =>
      m.group(1) -> kv.findAllMatchIn(m.group(2))
        .map(p => p.group(1) -> p.group(2).toDouble).toMap
    }.toMap
  }
}
