package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The ONE definition of word-shingling shared by the dedup family and
 * text fingerprinting — the index arithmetic (`greatest(size - (n-1), 1)`
 * guaranteeing at least one gram for short docs) is non-trivial and must
 * stay byte-identical between the Spark expression and its DuckDB oracle
 * rendering; keeping four hand-synced copies across two files is how the
 * variants silently drift apart.
 */
private[ops] object Shingles {

  /** Array of n-word grams of `text` (space-tokenized; short docs yield
    * exactly one gram covering the whole text). */
  def grams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** The DuckDB rendering of [[grams]] — identical boundary logic
    * (range's exclusive upper bound absorbs the +1). */
  def gramsSql(textExpr: String, n: Int): String =
    s"list_transform(range(1, greatest(len(string_split($textExpr,' ')) - ${n - 2}, 2)), " +
      s"i -> array_to_string((string_split($textExpr,' '))[i:i+${n - 1}], ' '))"
}
