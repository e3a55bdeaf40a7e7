package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkSpec {

  test("merged read NULL-fills absent columns and keeps pushdown") {
    val tmp = Files.createTempDirectory("graft_schemaevo_test").toString
    SchemaEvolution.writeGenerations(spark, sf, tmp)
    val df = SchemaEvolution.evolvedRead(spark, tmp)
    // union-of-columns schema, never a positional mis-bind (`gen` is
    // the inferred writer-generation partition column)
    assert(df.columns.toSet ==
      Set("doc_id", "lang", "source", "n_tokens", "gen"))
    // NULL-fill: every v1 row (even ids) reads NULL n_tokens; every
    // v2 row reads a real count
    assert(df.filter(col("doc_id") % 2 === 0 && col("n_tokens").isNotNull)
      .count() == 0)
    assert(df.filter(col("doc_id") % 2 === 1 && col("n_tokens").isNull)
      .count() == 0)
    // a predicate on a COMMON column still reaches the parquet scan
    val plan = df.filter(col("doc_id") === 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      plan.take(2000))
    // a predicate on the NEW column never matches pre-column files
    assert(df.filter(col("n_tokens") >= 0 && col("doc_id") % 2 === 0)
      .count() == 0)
  }
}
