package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-vs-diff adherence analytics (SURVEY §2.B X1–X6; reference
  * `scripts/analyze-plan-diff.js:26-196`): regex section/field
  * extraction, dedup, set intersection/difference, ratio metrics with
  * 0.1 rounding.
  *
  * Extraction is driver-side Scala (one markdown document, not data);
  * the set algebra is exposed both ways: pure-Scala for the CLI shape,
  * and DataFrame `intersect`/`except` (`distributedMetrics`) so the same
  * operator scales to path inventories that don't fit a driver. */
object PlanDiff {

  final case class PlannedExtract(
      plannedFiles: Seq[String],
      plannedTargets: Seq[String],
      referencedPatterns: Seq[String])

  final case class Metrics(
      fileAdherence: Double,
      patternCompliance: Double,
      scopeCreep: Seq[String],
      missingFiles: Seq[String],
      overlap: Seq[String],
      totalPlanned: Int,
      totalActual: Int)

  /** X1: section-scoped regex extraction (`analyze-plan-diff.js:26-89`).
    * Sections: "### New Files to Create" bullets, "## STEP-BY-STEP
    * TASKS" CREATE/UPDATE/ADD/REMOVE/REFACTOR/MIRROR headers (first word
    * is the path), `- **PATTERN**: (...)` refs, "### Relevant Codebase
    * Files" bullets. X2: dedup via distinct.
    *
    * Deliberate deviation: the reference's lazy `[\s\S]*?(?=##|$)`
    * terminates the tasks section at the FIRST `###` (because `###`
    * starts with `##`), which makes its own task-header and PATTERN
    * extraction unreachable in practice. We implement the documented
    * intent — the section runs to the next h2 (`\n## `) — so task
    * targets and pattern refs are actually extracted. */
  def extractPlannedFiles(plan: String): PlannedExtract = {
    val planned = Seq.newBuilder[String]
    val targets = Seq.newBuilder[String]
    val patterns = Seq.newBuilder[String]

    val backtick = "`([^`]+)`".r
    def bulletPaths(section: String): Seq[String] =
      section.split('\n').toSeq
        .filter(_.trim.startsWith("- `"))
        .flatMap(l => backtick.findFirstMatchIn(l).map(_.group(1)))

    val newFiles = "(?i)### New Files to Create[\\s\\S]*?(?=\\n#|$)".r
      .findFirstIn(plan)
    newFiles.foreach(s => planned ++= bulletPaths(s))

    val tasks = "(?i)## STEP-BY-STEP TASKS[\\s\\S]*?(?=\\n## |$)".r
      .findFirstIn(plan)
    tasks.foreach { s =>
      val header = "(?i)### (?:CREATE|UPDATE|ADD|REMOVE|REFACTOR|MIRROR) (.+)".r
      header.findAllMatchIn(s).foreach { m =>
        val target = m.group(1).trim.split(' ').head
        targets += target
        planned += target
      }
      val pat = "(?i)- \\*\\*PATTERN\\*\\*:?.*\\(([^)]+)\\)".r
      pat.findAllMatchIn(s).foreach(m => patterns += m.group(1))
    }

    val relevant = "(?i)### Relevant Codebase Files[\\s\\S]*?(?=\\n#|$)".r
      .findFirstIn(plan)
    relevant.foreach(s => planned ++= bulletPaths(s))

    PlannedExtract(planned.result().distinct, targets.result().distinct,
      patterns.result().distinct)
  }

  /** X3–X5: set algebra + ratio metrics (`analyze-plan-diff.js:130-164`).
    * fileAdherence = |overlap|/|planned|·100 (100 when nothing planned);
    * patternCompliance checks the pattern's file part appears in the
    * diff text; both rounded to 0.1. */
  def calculateMetrics(
      planned: PlannedExtract,
      actualFiles: Seq[String],
      detailedDiff: String = ""): Metrics = {
    val plannedSet = planned.plannedFiles.toSet
    val actualSet = actualFiles.toSet
    val overlap = planned.plannedFiles.filter(actualSet.contains)
    val fileAdherence =
      if (plannedSet.nonEmpty) overlap.size.toDouble / plannedSet.size * 100
      else 100.0
    val scopeCreep = actualFiles.distinct.filterNot(plannedSet.contains)
    val missing = planned.plannedFiles.filterNot(actualSet.contains)
    val patternCompliance =
      if (planned.referencedPatterns.isEmpty) 100.0
      else planned.referencedPatterns
        .count(p => detailedDiff.contains(p.split(':').head)).toDouble /
        planned.referencedPatterns.size * 100
    Metrics(
      math.round(fileAdherence * 10) / 10.0,
      math.round(patternCompliance * 10) / 10.0,
      scopeCreep, missing, overlap,
      planned.plannedFiles.size, actualFiles.size)
  }

  /** The same overlap/creep/missing set algebra as DataFrame set ops —
    * `intersect` / left-anti `except` — for at-scale path inventories
    * (e.g. comparing two multi-billion-row file manifests). Returns one
    * aggregate row (n_planned, n_actual, n_overlap, n_creep, n_missing,
    * file_adherence). */
  def distributedMetrics(
      spark: SparkSession,
      planned: DataFrame, // single string column "path"
      actual: DataFrame): DataFrame = {
    // single full-outer join + one aggregation — each input is scanned
    // once (three separate count() actions would scan everything twice)
    val p = planned.select(col("path")).distinct()
      .withColumn("__p", lit(1))
    val a = actual.select(col("path")).distinct()
      .withColumn("__a", lit(1))
    val row = p.join(a, Seq("path"), "full_outer")
      .agg(
        sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("n_planned"),
        sum(when(col("__a").isNotNull, 1L).otherwise(0L)).as("n_actual"),
        sum(when(col("__p").isNotNull && col("__a").isNotNull, 1L)
          .otherwise(0L)).as("n_overlap"))
      .collect().head
    val (nP, nA, overlap) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    import spark.implicits._
    Seq((nP, nA, overlap, nA - overlap, nP - overlap,
      math.round((if (nP > 0) overlap.toDouble / nP * 100 else 100.0) * 10) / 10.0))
      .toDF("n_planned", "n_actual", "n_overlap", "n_creep", "n_missing",
        "file_adherence")
  }
}
