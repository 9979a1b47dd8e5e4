package graft

import graft.functions.{tx, TextRT}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Text-pipeline kernels and dedup operators vs scala-side oracles. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH candidate recall: near-identical docs collide, disjoint docs don't") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val near = base.replace("tonight", "today") // high jaccard
    val far = "completely unrelated text about database systems and query optimization with columnar storage"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("minhash jaccard estimate tracks exact n-gram jaccard") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa nu xi"
    val sigA = TextRT.minHash(a, 128, 3)
    val sigB = TextRT.minHash(b, 128, 3)
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 128
    val exact = TextRT.ngramJaccard(a, b, 3)
    assert(math.abs(est - exact) < 0.2, s"est $est vs exact $exact")
  }

  test("simhash: hamming small for near-dups, large for unrelated") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest"
    val near = base + " tonight"
    val far = "columnar execution engines vectorize hash joins over partitioned parquet files"
    assert(TextRT.hammingDist(TextRT.simHash(base), TextRT.simHash(near)) <= 6)
    assert(TextRT.hammingDist(TextRT.simHash(base), TextRT.simHash(far)) > 10)
  }

  test("simhashPairs finds planted near-duplicates via block-bucket join") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest"
    val docs = Seq(
      (1L, base), (2L, base + " tonight"),
      (3L, "completely different text about spark and scala development practices"),
      (4L, "another unrelated document mentioning geospatial indexes and z order curves"))
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact dedup groups + survivors") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "aaa"))
      .toDF("doc_id", "text")
    val groups = Dedup.exact(df, col("text").cast("binary"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(groups.length === 3)
    val aaa = groups.find(_._2 == 1L).get
    assert(aaa._3 === 3L)
    val survivors = Dedup.exactSurvivors(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 2L, 4L))
  }

  test("ngram jaccard: identity 1.0, disjoint 0.0, symmetric") {
    val a = "one two three four five six"
    val b = "seven eight nine ten eleven twelve"
    assert(TextRT.ngramJaccard(a, a, 3) === 1.0)
    assert(TextRT.ngramJaccard(a, b, 3) === 0.0)
    val c = "one two three four seven eight nine"
    assert(TextRT.ngramJaccard(a, c, 2) === TextRT.ngramJaccard(c, a, 2))
  }

  test("sortedJaccard over shingleHashes == ngramJaccard, kernel and expression") {
    val texts = Seq(
      "one two three four five six",
      "one two three four seven eight nine",
      "seven eight nine ten eleven twelve",
      "", "single", "x y",
      "the quick brown fox jumps over the lazy dog the quick brown fox")
    for (a <- texts; b <- texts; n <- Seq(2, 3)) {
      val merged = TextRT.sortedJaccard(TextRT.shingleHashes(a, n), TextRT.shingleHashes(b, n))
      assert(merged === TextRT.ngramJaccard(a, b, n), s"'$a' vs '$b' n=$n")
    }
    // sortedness + distinctness of the precomputed arrays
    val sh = TextRT.shingleHashes(texts.last, 2)
    assert(sh.toSeq === sh.toSeq.sorted && sh.toSet.size === sh.length)
    // expression path (codegen) matches the kernel, incl. via SQL registration
    val pairs = texts.combinations(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val got = pairs.select(
      tx.sortedJaccard(tx.shingleHashes($"a", lit(3)), tx.shingleHashes($"b", lit(3))).as("m"),
      tx.ngramJaccard($"a", $"b", lit(3)).as("e")).collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    val sql = spark.sql(
      "SELECT sorted_jaccard(shingle_hashes('a b c d', 2), shingle_hashes('a b x d', 2))").head()
    assert(sql.getDouble(0) === TextRT.ngramJaccard("a b c d", "a b x d", 2))
  }

  test("langGuess identifies stopword-rich samples; expression == kernel") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it is happy with the sun for a while"),
      ("de", "der hund ist nicht auf das sofa und die katze ist mit der maus"),
      ("fr", "le chat est dans la maison et les oiseaux sont pour la plupart dans le jardin"),
      ("es", "el perro es grande y la casa es bonita con el sol en la montana"))
    samples.foreach { case (lang, text) => assert(TextRT.langGuess(text) === lang, text) }
    val got = samples.toDF("lang", "text")
      .select($"lang", tx.langGuess($"text").as("p")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("quality/tokenCount/fingerprint: bounds + determinism + expression parity") {
    val texts = Seq("", "short", "a reasonable english sentence with several normal words in it",
      "!!!???***", "x" * 1000)
    texts.foreach { t =>
      val q = TextRT.qualityScore(t)
      assert(q >= 0.0 && q <= 1.0)
    }
    assert(TextRT.tokenCount("hello, world! 42") === 5) // hello , world ! 42
    assert(TextRT.tokenCount("") === 0)
    val df = texts.toDF("text").select(
      tx.qualityScore($"text"), tx.tokenCount($"text"), tx.fingerprint($"text", lit(16)),
      tx.simhash($"text"))
    val rows = df.collect()
    texts.zip(rows).foreach { case (t, r) =>
      assert(r.getDouble(0) === TextRT.qualityScore(t))
      assert(r.getInt(1) === TextRT.tokenCount(t))
      assert(r.getLong(2) === TextRT.fingerprint(t, 16))
      assert(r.getLong(3) === TextRT.simHash(t))
    }
  }

  test("sql registration surface works end to end") {
    val r = spark.sql(
      """SELECT token_count('one two three'), lang_guess('the of and to in it'),
        |hamming(CAST(5 AS BIGINT), CAST(6 AS BIGINT)),
        |ngram_jaccard('a b c d', 'a b c d', 2)""".stripMargin).head()
    assert(r.getInt(0) === 3)
    assert(r.getString(1) === "en")
    assert(r.getInt(2) === 2)
    assert(r.getDouble(3) === 1.0)
  }

  test("clustering converges on a 300-diameter chain (pointer jumping)") {
    // plain min-label propagation moves the min ONE hop per round, so a
    // component deeper than maxIter (20) rounds would mislabel; pointer
    // jumping reaches ~2^rounds — this chain needs it
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.size === 301)
    assert(cl.values.toSet === Set(0L), "every vertex labels to the chain min")
  }

  test("near-dup clustering: connected components + survivors") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    val docs = (1L to 25L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Dedup.nearDupSurvivors(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // representatives + untouched rows
    assert(kept === ((1L to 25L).toSet -- Set(2L, 3L, 4L, 11L, 21L, 22L)))
  }
}
