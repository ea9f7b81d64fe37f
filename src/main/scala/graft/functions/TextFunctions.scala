package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text primitives shared by the text/dedup operators.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (split / transform / aggregate / md5) — no UDFs, so the hot path stays
  * inside whole-stage codegen. `md5` is the only hash used on oracle-checked
  * paths (identical hex output in Spark and DuckDB); `xxhash64` is reserved
  * for library-internal keys.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word k-shingles as space-joined strings (empty if < k words). */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      array_distinct(transform(
        sequence(lit(1), size(ws) - lit(k - 1)),
        i => concat_ws(" ", slice(ws, i, lit(k))))))
    .otherwise(array().cast("array<string>"))

  /** Salted min-wise hash of a shingle set: lexicographic min of
    * md5("<salt>|" + shingle). A family of string-valued min-wise hashes —
    * portable across engines because md5 hex and byte-wise string order are.
    */
  def minhash(sh: Column, salt: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$salt|"), s))))

  /** Normalized document text: lowercase, collapsed whitespace, trimmed. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Tokens of the normalized text — the dedup-side tokenization, so that
    * case/whitespace noise never defeats near-dup detection. */
  def normWords(text: Column): Column = split(normalized(text), " ")

  /** NFC-normalized text; `stripAccents` additionally folds combining
    * marks away ([[NormalizeText]]). */
  def normalizeText(text: Column, stripAccents: Boolean = false): Column =
    org.apache.spark.sql.graft.Bridge.column(
      NormalizeText(org.apache.spark.sql.graft.Bridge.expression(text), stripAccents))

  /** BPE subword tokens of a text column under a learned merge table —
    * the fused [[BpeTokens]] expression; `size(bpeTokens(...))` is the
    * real token count for training-data budgets. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      BpeTokens(org.apache.spark.sql.graft.Bridge.expression(text), merges))
}
