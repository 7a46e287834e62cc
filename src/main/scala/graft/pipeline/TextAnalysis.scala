package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language id, fingerprinting. All arithmetic is
  * integer-exact so DuckDB oracles reproduce results bit-for-bit; all
  * operators are per-row (narrow, no shuffle) — they scale linearly and
  * push straight through whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace token count. Blank text is 0 tokens — split of an empty
    * string yields one "" token, which would count as 1.
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+"))).cast("int")

  /** `(doc_id, n_tokens)`. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .orderBy("doc_id")

  /** BPE-style pre-tokenization pattern (the GPT-2 family shape, kept to
    * portable RE2/Java syntax): contraction suffixes, letter runs, digit
    * runs, non-alphanumeric punctuation runs. A real BPE vocab then splits
    * these further; the pre-token count is the standard cheap proxy for
    * token budget at corpus scale.
    */
  val bpePattern: String = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s']+"

  /** `(doc_id, n_bpe)`: BPE-ish pre-token count via regexp_count — per-row,
    * codegen'd, no shuffle.
    */
  def bpeTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(bpePattern)).cast("int").as("n_bpe"))
      .orderBy("doc_id")

  /** Integer occurrence count of literal `kw` in `t` (no regex):
    * (len(t) - len(replace(t, kw, ''))) / len(kw) — exact in any engine.
    */
  def occurrences(t: Column, kw: String): Column =
    ((length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(kw), "")))
      / kw.length).cast("int")

  /** Mean token length in hundredths, integer-exact; 0 for blank docs. */
  private def meanTokLen100Expr(t: Column): Column = {
    val nToks = tokenCount(t)
    when(nToks === 0, lit(0)).otherwise(
      (length(regexp_replace(t, "\\s", "")).cast("long") * 100L / nToks)).cast("int")
  }

  /** The quality keep/drop flag as ONE per-row expression — the same
    * thresholds [[quality]] reports, exposed at expression level so a
    * composed pipeline (e.g. [[graft.queries.PipelineQueries.pipelinePrep]])
    * can evaluate it inside a single scan projection instead of joining
    * against a second pass over the corpus.
    */
  def keepExpr(t: Column): Column = {
    val nToks = tokenCount(t)
    val nAlpha = length(regexp_replace(lower(t), "[^a-z]", "")).cast("int")
    (nToks >= 5 && nToks <= 100000 &&
      meanTokLen100Expr(t) >= 200 && meanTokLen100Expr(t) <= 1200 &&
      nAlpha * 2 >= length(t).cast("int")).cast("int")
  }

  /** Quality metrics, all integers: char count, token count, alpha-char
    * count, digit count, mean token length (x100, integer division), and
    * a keep/drop flag from simple thresholds (the [[keepExpr]] predicate).
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nChars = length(t).cast("int")
    val nToks = tokenCount(t)
    val nAlpha = length(regexp_replace(lower(t), "[^a-z]", "")).cast("int")
    val nDigit = length(regexp_replace(t, "[^0-9]", "")).cast("int")
    docs.select(col("doc_id"), nChars.as("n_chars"), nToks.as("n_tokens"),
        nAlpha.as("n_alpha"), nDigit.as("n_digit"),
        meanTokLen100Expr(t).as("mean_tok_len_100"), keepExpr(t).as("keep"))
      .orderBy("doc_id")
  }

  /** Stopword tables for the n-gram language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " a ", " of ", " to "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " y "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des "),
  )

  /** The language-ID argmax as ONE per-row expression (same scores and
    * tie order as [[langId]]); expression-level so composed pipelines can
    * fold it into a single scan projection. Catalyst's common-subexpression
    * elimination shares the repeated score sub-trees in codegen.
    */
  def langPredExpr(text: Column): Column = {
    // double every whitespace run so adjacent stopwords don't share a
    // delimiter space: non-overlap counting of ' the the ' would see one
    // match because the first consumed the middle space
    val padded = concat(lit(" "),
      regexp_replace(lower(text), "\\s+", "  "), lit(" "))
    val score = stopwords.map { case (lang, kws) =>
      lang -> kws.map(k => occurrences(padded, k)).reduce(_ + _)
    }
    val best = Seq("en", "es", "de", "fr").map(score)
      .reduce((a, b) => greatest(a, b))
    when(best === 0, lit("unknown"))
      .when(score("en") === best, "en").when(score("es") === best, "es")
      .when(score("de") === best, "de").otherwise("fr")
  }

  /** Language ID: integer stopword-occurrence score per language over the
    * space-padded lowercased text; argmax with deterministic tie order
    * (en > es > de > fr > unknown at score 0).
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langPredExpr(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with
    * exact counts (deterministic tie-break by token). The standard
    * corpus-stats pass before vocab/BPE training: one explode + one
    * hash-shuffle group-by + a top-k — at 100 TB the group-by is the
    * only wide stage, and the top-k moves k rows, not the vocabulary.
    */
  def vocabulary(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Winnowed rolling-hash fingerprints (the MOSS scheme, Schleimer et
    * al. 2003): hash every token k-gram, then keep the minimum hash of
    * each sliding window of `w` consecutive k-grams (ties to the
    * rightmost, i.e. latest position). Guarantees: any shared run of
    * w+k-1 tokens between two documents shares at least one fingerprint,
    * and ~1/w of the k-gram hashes survive — a position-robust partial-
    * overlap signature at a fraction of the shingle volume.
    *
    * The k-gram hash is the md5 hex digest of the space-joined gram
    * (tokens are whitespace-free, so the join is unambiguous): any engine
    * computes it identically, and the winnow min is a plain lexicographic
    * min over lowercase-hex ASCII — bit-for-bit portable, unlike a
    * engine-private 64-bit hash. MOSS only needs *a* consistent hash
    * order, so the scheme is unchanged.
    *
    * `(doc_id, fp)` distinct. All window work (lead for k-grams, min over
    * a row frame for winnowing) is codegen'd; one doc_id shuffle total.
    */
  def winnowedFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1)
    // gram construction shared with the dedup family (Dedup.gramTable):
    // one tokenization contract for shingles and winnow alike
    val grams = Dedup.gramTable(docs, k)
      .select(col("doc_id"), col("idx"),
        md5(to_binary(col("g"), lit("utf-8"))).as("h"))
    // winnow: min hash over each w-window of consecutive k-gram positions
    val frame = Window.partitionBy("doc_id").orderBy("idx")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .select(col("doc_id"), min(col("h")).over(frame).as("fp"),
        count(lit(1)).over(frame).as("span"))
      .filter(col("span") === w) // only complete windows select
      .select("doc_id", "fp").distinct()
  }

  /** Content-fingerprint expression: md5 of the whitespace-normalized
    * lowercase text — a deterministic, engine-portable document identity
    * for dedup joins. Shared with the streaming ingestion dedup
    * ([[graft.streaming.DocStreams]]).
    */
  def fingerprintExpr(text: Column): Column =
    md5(to_binary(regexp_replace(trim(lower(text)), "\\s+", " "), lit("utf-8")))

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintExpr(col("text")).as("fp"))
      .orderBy("doc_id")
}
