package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece greedy encoding (Wu et al. 2016; the BERT tokenizer's
  * inference rule) — the third tokenizer family next to BPE
  * ([[TextOps.bpeEncodeStats]]) and unigram-LM ([[UnigramLM]]):
  * longest-match-first segmentation against a position-aware vocab
  * (word-initial pieces vs `##`-continuation pieces), with the
  * whole-word-[UNK] fallback when no piece matches at some position.
  *
  * Vocab (deterministic, oracle-replayable — a likelihood-trained BERT
  * vocab is not): from the TRAIN slice's word-frequency table, every
  * in-bounds substring span scored by occurrence frequency per position
  * class (initial = span starts at 0, continuation otherwise); the
  * vocab is the full train ALPHABET (all length-1 pieces, the
  * WordPiece trainer convention that keeps every train-seen character
  * encodable) plus the [[TopPieces]] most frequent multi-char pieces
  * under the total order (freq DESC, initial-class DESC, piece ASC).
  *
  * Greedy encode: an unrolled scan over ≤ [[UnigramLM.MaxWord]]
  * positions (self-sized by [[UnigramLM.effMaxWord]] — every layer
  * advances ≥ 1 char). The per-layer lookup stores the piece LENGTH as
  * the map value and coalesces lookups from length [[MaxPiece]] down
  * to 1: near the word end, a longer-length `substr` truncates to the
  * remainder and therefore finds the same (shorter) piece with its
  * true length, so the coalesce is exactly longest-match-first with no
  * boundary special-casing.
  *
  * Scale shape (100 TB): the TRAIN corpus pays one word-frequency
  * shuffle; the piece table is alphabet-bounded (≤ |Σ|^MaxPiece
  * distinct substrings regardless of corpus size), so top-K selection
  * is a TakeOrdered over a bounded table and the model crosses into
  * the plan as two `typedlit` map literals (the broadcast-the-model
  * shape). The ENCODE corpus segments each DISTINCT word once and
  * joins the per-word stats back onto the token stream — one corpus
  * shuffle on the word key, doc rollup combining map-side.
  */
object WordPiece {

  /** Maximum piece length — shared with [[UnigramLM.MaxPiece]] so the
    * span enumeration ([[UnigramLM.spanPairsFor]]) is reused. */
  val MaxPiece: Int = UnigramLM.MaxPiece
  /** Multi-char vocab budget (the alphabet rides along for free). */
  val TopPieces = 160

  /** Position-classed piece frequencies from a (word, cnt) frame:
    * (is_init, piece, l, f) — every in-bounds span, word-count
    * weighted, overlapping occurrences counted. Alphabet-bounded
    * output. */
  def pieceFreq(wf: DataFrame, maxW: Int): DataFrame = {
    val spans = UnigramLM.spanPairsFor(maxW).map { case (j, i) =>
      struct(lit(if (j == 0) 1 else 0).as("is_init"),
             lit(i - j).as("l"),
             expr(s"substr(word, ${j + 1}, ${i - j})").as("piece"))
    }
    wf.select(col("cnt"), explode(array(spans: _*)).as("s"))
      .filter(length(col("s.piece")) === col("s.l")) // drop clamped spans
      .groupBy(col("s.is_init").as("is_init"), col("s.piece").as("piece"),
               col("s.l").as("l"))
      .agg(sum(col("cnt")).as("f"))
  }

  /** The (initial-map, continuation-map) piece→length vocab: full
    * alphabet + [[TopPieces]] multi-char pieces by (f DESC, is_init
    * DESC, piece ASC) — a total order, so the K-boundary cut is
    * deterministic on both engines. Vocab-bound driver collect. */
  def vocabMaps(pf: DataFrame): (Map[String, Int], Map[String, Int]) = {
    val singles = pf.filter(col("l") === 1)
    val top = pf.filter(col("l") >= 2)
      .orderBy(col("f").desc, col("is_init").desc, col("piece").asc)
      .limit(TopPieces)
    val rows = singles.unionAll(top)
      .select(col("is_init"), col("piece"), col("l"))
      .collect()
    def toMap(init: Int) = rows.filter(_.getInt(0) == init)
      .map(r => r.getString(1) -> r.getInt(2)).toMap
    (toMap(1), toMap(0))
  }

  /** Greedy longest-match segmentation of the distinct-word frame:
    * returns (word, n_pieces, is_unk) — n_pieces = 1 for an [UNK]
    * word (the whole-word fallback). Unrolled `maxW` layers; each
    * layer advances the scan position by the longest vocab match or
    * trips the UNK flag. */
  def greedySegments(wf: DataFrame, initVocab: Map[String, Int],
                     contVocab: Map[String, Int], maxW: Int): DataFrame = {
    // ONE Literal node each (the round-9 CreateMap analysis gotcha)
    val mi = typedlit(initVocab)
    val mc = typedlit(contVocab)
    var d = wf
      .withColumn("L", length(col("word")).cast("int"))
      .withColumn("pos0", lit(0))
      .withColumn("np0", lit(0L))
      .withColumn("unk0", lit(false))
    for (t <- 1 to maxW) {
      val p = s"pos${t - 1}"
      def look(m: Column, l: Int): Column =
        try_element_at(m, expr(s"substr(word, $p + 1, $l)"))
      def longest(m: Column): Column =
        coalesce((MaxPiece to 1 by -1).map(l => look(m, l)): _*)
      d = d.withColumn(s"adv$t",
        when(!col(s"unk${t - 1}") && col(p) < col("L"),
          when(col(p) === 0, longest(mi)).otherwise(longest(mc))))
      d = d
        .withColumn(s"pos$t",
          when(col(s"adv$t").isNotNull, col(p) + col(s"adv$t"))
            .otherwise(col(p)))
        .withColumn(s"np$t",
          when(col(s"adv$t").isNotNull, col(s"np${t - 1}") + 1L)
            .otherwise(col(s"np${t - 1}")))
        .withColumn(s"unk$t",
          col(s"unk${t - 1}") ||
            (col(p) < col("L") && col(s"adv$t").isNull))
    }
    d.select(col("word"),
      when(col(s"unk$maxW"), lit(1L)).otherwise(col(s"np$maxW"))
        .as("n_pieces"),
      col(s"unk$maxW").as("is_unk"))
  }

  /** Train-on-even / encode-on-odd WordPiece pass over a document
    * frame: per encode-slice doc the word count, greedy piece count,
    * UNK-word count, char count, and pieces-per-1000-chars. The UNK
    * path genuinely fires when an encode-slice word carries a
    * character the train slice never saw. */
  def encodeStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val train = df.filter(pmod(col(idCol), lit(2)) === 0)
    val enc = df.filter(pmod(col(idCol), lit(2)) === 1)
    val wfTrain = PlanCache.reuse(UnigramLM.wordFreq(train, textCol))
    val (mi, mc) = vocabMaps(pieceFreq(wfTrain, UnigramLM.effMaxWord(wfTrain)))
    val wfEnc = PlanCache.reuse(UnigramLM.wordFreq(enc, textCol))
    val seg = greedySegments(wfEnc, mi, mc, UnigramLM.effMaxWord(wfEnc))
    val tok = graft.sources.Tables.spread(enc)
      .select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("word"))
    tok.join(seg, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
           sum(col("n_pieces")).as("n_pieces"),
           sum(when(col("is_unk"), 1L).otherwise(0L)).as("n_unk_words"),
           sum(length(col("word")).cast("long")).as("n_chars"))
      .withColumn("pieces_permille",
        when(col("n_chars") > 0, expr("n_pieces * 1000 DIV n_chars"))
          .otherwise(lit(0L)))
  }

  // ---------------------------------------------------------- oracle SQL

  /** DuckDB twin of [[encodeStats]]: the alphabet+top-K vocab CTEs,
    * then the greedy scan advanced TWO chained CTE layers per step (a
    * join layer for the four length-class lookups, an advance layer
    * whose pos/np/unk updates reference the `adv` alias — a small
    * constant-size expression, safe under DuckDB's alias-duplication
    * binder; the round-9 no-subquery-in-alias rule respected). The
    * static unroll runs the full [[UnigramLM.MaxWord]] — dead layers
    * bind linearly. */
  def encodeSql(docsRel: String = "documents", textCol: String = "text"):
      String = {
    val maxW = UnigramLM.MaxWord
    val spansValues = UnigramLM.spanPairs
      .map { case (j, i) => s"($j, $i)" }.mkString(", ")
    val steps = (1 to maxW).map { t =>
      val p = s"pos${t - 1}"
      val looks = (MaxPiece to 1 by -1).map { l =>
        s"""LEFT JOIN vocab v$l
           |    ON v$l.is_init = CASE WHEN $p = 0 THEN 1 ELSE 0 END
           |   AND v$l.piece = substr(word, $p + 1, $l)""".stripMargin
      }.mkString("\n  ")
      val sel = (MaxPiece to 1 by -1).map(l => s"v$l.l AS a$l").mkString(", ")
      val advExpr = s"CASE WHEN NOT unk${t - 1} AND $p < L THEN " +
        s"COALESCE(${(MaxPiece to 1 by -1).map(l => s"a$l").mkString(", ")})" +
        s" END"
      s"""j$t AS (
         |  SELECT g${t - 1}.*, $sel FROM g${t - 1}
         |  $looks),
         |g$t AS (
         |  SELECT word, L,
         |    CASE WHEN $advExpr IS NOT NULL THEN $p + ($advExpr)
         |         ELSE $p END AS pos$t,
         |    CASE WHEN $advExpr IS NOT NULL THEN np${t - 1} + 1
         |         ELSE np${t - 1} END AS np$t,
         |    unk${t - 1} OR ($p < L AND ($advExpr) IS NULL) AS unk$t
         |  FROM j$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH wft AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split($textCol, ' ')) AS word
       |        FROM $docsRel WHERE doc_id % 2 = 0)
       |  GROUP BY 1),
       |pieces AS MATERIALIZED (
       |  SELECT CASE WHEN j = 0 THEN 1 ELSE 0 END AS is_init,
       |         substr(word, j + 1, i - j) AS piece, i - j AS l,
       |         CAST(SUM(cnt) AS BIGINT) AS f
       |  FROM wft CROSS JOIN (VALUES $spansValues) AS spn(j, i)
       |  WHERE length(substr(word, j + 1, i - j)) = i - j
       |  GROUP BY 1, 2, 3),
       |vocab AS MATERIALIZED (
       |  SELECT is_init, piece, l FROM pieces WHERE l = 1
       |  UNION ALL
       |  SELECT is_init, piece, l FROM (
       |    SELECT *, ROW_NUMBER() OVER
       |      (ORDER BY f DESC, is_init DESC, piece ASC) AS rk
       |    FROM pieces WHERE l >= 2)
       |  WHERE rk <= $TopPieces),
       |g0 AS MATERIALIZED (
       |  SELECT word, CAST(length(word) AS INTEGER) AS L,
       |         0 AS pos0, CAST(0 AS BIGINT) AS np0, FALSE AS unk0
       |  FROM (SELECT DISTINCT word FROM
       |        (SELECT unnest(string_split($textCol, ' ')) AS word
       |         FROM $docsRel WHERE doc_id % 2 = 1))),
       |$steps,
       |seg AS MATERIALIZED (
       |  SELECT word,
       |         CASE WHEN unk$maxW THEN 1 ELSE np$maxW END AS n_pieces,
       |         unk$maxW AS is_unk
       |  FROM g$maxW),
       |tok AS (SELECT doc_id, unnest(string_split($textCol, ' ')) AS word
       |        FROM $docsRel WHERE doc_id % 2 = 1)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(seg.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(CASE WHEN seg.is_unk THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unk_words,
       |  CAST(SUM(length(tok.word)) AS BIGINT) AS n_chars,
       |  CAST(CASE WHEN SUM(length(tok.word)) > 0
       |       THEN SUM(seg.n_pieces) * 1000 // SUM(length(tok.word))
       |       ELSE 0 END AS BIGINT) AS pieces_permille
       |FROM tok JOIN seg ON tok.word = seg.word
       |GROUP BY doc_id""".stripMargin
  }
}
