package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnShim

/** Column API + SQL registration for the text-pipeline expressions. */
object tx {
  private def col(e: Expression): Column = ColumnShim.column(e)
  private def ex(c: Column): Expression = ColumnShim.expression(c)

  def minhash(text: Column, numHashes: Column, shingleSize: Column): Column =
    col(MinHashSig(ex(text), ex(numHashes), ex(shingleSize)))
  def lshBands(sig: Column, rowsPerBand: Column): Column = col(LshBands(ex(sig), ex(rowsPerBand)))
  def simhash(text: Column): Column = col(SimHash64(ex(text)))
  def fingerprint(text: Column, window: Column): Column = col(Fingerprint(ex(text), ex(window)))
  def langGuess(text: Column): Column = col(LangGuess(ex(text)))
  def qualityScore(text: Column): Column = col(QualityScore(ex(text)))
  def tokenCount(text: Column): Column = col(TokenCount(ex(text)))
  def ngramJaccard(a: Column, b: Column, n: Column): Column =
    col(NgramJaccard(ex(a), ex(b), ex(n)))
  def shingleHashes(text: Column, n: Column): Column =
    col(ShingleHashes(ex(text), ex(n)))
  def sortedJaccard(a: Column, b: Column): Column =
    col(SortedJaccard(ex(a), ex(b)))
  def hamming(a: Column, b: Column): Column = col(Hamming64(ex(a), ex(b)))
  def dmsToDeg(s: Column): Column = col(DmsToDeg(ex(s)))
  def degToDms(deg: Column, isLat: Column): Column = col(DegToDms(ex(deg), ex(isLat)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash", es => MinHashSig(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("lsh_bands", es => LshBands(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("fingerprint", es => Fingerprint(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("lang_guess", es => LangGuess(es.head), "built-in")
    reg.createOrReplaceTempFunction("quality_score", es => QualityScore(es.head), "built-in")
    reg.createOrReplaceTempFunction("token_count", es => TokenCount(es.head), "built-in")
    reg.createOrReplaceTempFunction("ngram_jaccard", es => NgramJaccard(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes", es => ShingleHashes(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("sorted_jaccard", es => SortedJaccard(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming", es => Hamming64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dms_to_deg", es => DmsToDeg(es.head), "built-in")
    reg.createOrReplaceTempFunction("deg_to_dms", es => DegToDms(es(0), es(1)), "built-in")
  }
}
