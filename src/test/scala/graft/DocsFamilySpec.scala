package graft

import org.scalatest.funsuite.AnyFunSuite

/** The docs1000 tier contract that makes its one-command preset safe:
  * every query in the "docs" bench family must run against a DOCS-ONLY
  * corpus (documents + embeddings, no relational tables — what
  * [[ScaleSmoke.buildDocsCorpus]] generates and what exists at
  * /tmp/graft_docs_1000x). A query that silently depends on lineitem/
  * orders/events would fail the tier's very first bench run at 500k
  * docs — this spec catches the drift at 500 docs instead.
  */
class DocsFamilySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every docs-family query runs green on a documents+embeddings-only corpus") {
    val dir = ScaleSmoke.buildDocsCorpus(spark, 1) // 500 docs / 500 vecs
    val fam = SparkEntry.families("docs").toSeq.sorted
    val failures = fam.flatMap { name =>
      try {
        val n = SparkEntry.queries(name)(spark, dir).count()
        assert(n >= 0)
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"docs-family queries broken on a docs-only corpus:\n${failures.mkString("\n")}")
  }
}
