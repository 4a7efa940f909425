package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis / deduplication primitives for large-scale training-data
  * pipelines: tokenization, shingling, MinHash+LSH, SimHash, winnowing
  * fingerprints. Everything is pure Column composition (whole-stage
  * codegen'd, no UDFs) so the operators distribute and scale: per-document
  * work is embarrassingly parallel; the only shuffles are the explicit
  * groupBy/join steps in the pair-generation queries.
  *
  * Hashing is anchored on sha2 so every derived value is reproducible in
  * any engine (the DuckDB correctness oracle recomputes it bit-for-bit).
  */
object TextOps {

  /** Modulus for MinHash permutations: 2^31 - 1 (Mersenne prime). Products
    * `a * (h % P)` stay under 2^62, so all arithmetic fits signed 64-bit in
    * both Spark and the oracle — no overflow, no bigint promotion.
    */
  val HashPrime: Long = 2147483647L

  /** MinHash permutation coefficients — LCG-style, derived from the seed
    * index so both engines can regenerate them from `i` alone.
    */
  def permA(i: Column): Column = pmod(lit(1103515245L) * (i + 1) + 12345L, lit(HashPrime))
  def permB(i: Column): Column = pmod(lit(134775813L) * (i + 1) + 1L, lit(HashPrime))

  /** 60-bit positive hash: first 15 hex chars of sha2-256, parsed base-16.
    * (15 nibbles = 60 bits, always non-negative in a signed 64-bit long.)
    */
  def h60(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Word n-gram shingles joined with single spaces; empty array when the
    * document has fewer than `n` tokens (guards `sequence`'s descending
    * default step).
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Character n-gram shingles of a string. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - n + 1),
        i => text.substr(i, lit(n))))

  /** Base MinHash values: `h60(shingle) % P` per shingle. Hash once, then
    * apply the k cheap integer permutations — k sha2 passes per shingle
    * would dominate the scan cost at 100 TB.
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(h60(s), lit(HashPrime)))

  /** MinHash signature of length `k` over pre-hashed shingles: element `i`
    * is `min((a_i*h + b_i) % P)`. Null entries when the shingle set is
    * empty.
    */
  def minhashSignature(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val (a, b) = (permA(i), permB(i))
      array_min(transform(hashes, h => pmod(a * h + b, lit(HashPrime))))
    })

  /** LSH band digests: the signature split into `bands` bands of `r` rows,
    * each band digested to one sha2 string. Two documents land in the same
    * LSH bucket iff some band digest matches.
    */
  def bandDigests(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      sha2(concat_ws("-", transform(slice(sig, j * r + 1, lit(r)), x => x.cast("string"))), 256))

  /** 60-bit SimHash over a token array (frequency-weighted: repeated tokens
    * contribute repeatedly). No explode, no shuffle: each token contributes
    * ±1 per bit position; positive sums set the bit. Uses the native
    * codegen'd expression (graft.functions.SimHash60F) — integer
    * arithmetic, bit-identical to the fold form below.
    */
  def simhash60(toks: Column): Column =
    graft.functions.SimHash60F.simhash60(transform(toks, t => h60(t)))

  /** Composable fold form of simhash60 (interpreted HOFs; kept for the
    * equivalence spec and engines without the native function).
    */
  def simhash60Fold(toks: Column): Column = {
    val bitSigns = (h: Column) => array((0 until 60).map { b =>
      when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
    }: _*)
    val sums = aggregate(
      transform(toks, t => h60(t)),
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, bitSigns(h), (a, s) => a + s))
    val powers = array((0 until 60).map(b => lit(1L << b)): _*)
    aggregate(zip_with(sums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** Winnowing document fingerprints (Schleimer et al.'s local fingerprint
    * selection): hash every `gramLen`-char shingle to 32 bits, take the
    * minimum of each sliding window of `window` consecutive grams, and keep
    * the distinct minima per document. Returns one row per doc:
    * (id, n_fingerprints, fp_digest) where fp_digest is sha2 over the
    * sorted fingerprint values.
    *
    * The window-min runs partitioned by document (one shuffle by doc id);
    * at cluster scale this is the natural partitioning since documents are
    * independent.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         gramLen: Int = 8, window: Int = 4): DataFrame = {
    val grams = charShingles(col(textCol), gramLen)
    val exploded = df
      .select(col(idCol), posexplode(transform(grams, g => pmod(h60(g), lit(4294967296L)))))
      .toDF(idCol, "pos", "gh")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    val maxPos = Window.partitionBy(col(idCol))
    exploded
      .withColumn("win_min", min(col("gh")).over(w))
      .withColumn("max_pos", max(col("pos")).over(maxPos))
      .where(col("pos") <= col("max_pos") - (window - 1))
      .select(col(idCol), col("win_min"))
      .distinct()
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_fingerprints"),
        sha2(concat_ws("-",
          transform(array_sort(collect_list(col("win_min"))), x => x.cast("string"))), 256)
          .as("fp_digest"))
  }
}
