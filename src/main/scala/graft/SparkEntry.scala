package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface: relational (TPC-H-ish), text
  * analysis, dedup (exact/minhash/simhash/jaccard/embedding), similarity
  * search, event analytics, ML feature prep, multimodal metadata, and the
  * flagship distributed train+predict. Every SQL-expressible entry has a
  * DuckDB oracle in `oracleSql`; `ml_train_predict` is intentionally
  * omitted there (hogwild training is nondeterministic by design, per the
  * reference's own semantics — rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * distributed hogwild train on the embeddings table + batch inference. */
  def entry(spark: SparkSession): DataFrame =
    MlOps.queries("ml_train_predict")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ EventOps.queries ++ MlOps.queries ++
      MultimodalOps.queries ++ CurationOps.queries ++ CorpusOps.queries ++
      SourceOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ EventOps.oracles ++ MlOps.oracles ++
      MultimodalOps.oracles ++ CurationOps.oracles ++ CorpusOps.oracles ++
      SourceOps.oracles
}
