package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution matching — fuzzy string joins with blocking
  * (SURVEY.md "beyond" tier). The reference reconciles records by exact
  * guid/name equality (odgovlt.py:216,248 get-by-name lookups); real-world
  * harvest sources misspell, so a production sync needs the approximate
  * form too.
  */
object MatchOps {
  import graft.Tables.{table => t}

  /** Candidate-pair edit-distance ceiling. */
  val MaxEditDistance = 4

  /** Fuzzy name matching with blocking: distinct part names, blocked on
    * their first token, candidate pairs within a block scored by
    * Levenshtein distance (the full-matrix edit distance — identical
    * definition in Spark and DuckDB), kept when within
    * [[MaxEditDistance]].
    *
    * Scale design, in order of leverage:
    *  1. distinct() FIRST — the match runs over the name VOCABULARY, not
    *     the corpus (at 100 TB the distinct-name table is orders of
    *     magnitude smaller than the fact table);
    *  2. the block key turns the quadratic all-pairs into an equi-join —
    *     candidates only form inside a block, so cost is Σ |block|², not
    *     |names|²;
    *  3. `a < b` halves the pair space and canonicalizes output;
    *  4. a hot block (skewed key) is the residual risk — the standard
    *     fixes compose: AQE skew-join splitting, or salting the block key
    *     with a length bucket (blk, len(name) div 4) to subdivide.
    */
  def fuzzyNameMatch(s: SparkSession, dir: String): DataFrame = {
    val blocked = t(s, dir, "part")
      .select(col("p_name")).distinct()
      .select(col("p_name"), split(col("p_name"), " ").getItem(0).as("blk"))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .select(col("a.blk").as("blk"), col("a.p_name").as("name_a"),
        col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      .filter(col("dist") <= MaxEditDistance)
      .orderBy("blk", "name_a", "name_b")
  }
}
