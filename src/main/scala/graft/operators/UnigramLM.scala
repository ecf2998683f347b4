package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the EM-prune
  * companion of the BPE trainer ([[TextOps.bpeMerges]]), in HARD-EM
  * (Viterbi) form so every quantity is an exact integer and the DuckDB
  * oracle replays training bit-for-bit (Kudo 2018, "Subword
  * Regularization", §3.2 — production trainers run soft EM; the
  * Viterbi E-step is the deterministic variant the same paper uses for
  * segmentation, and `--model_type=unigram` pruning is loss-based
  * either way).
  *
  * Training:
  *  1. '''Seed''': every substring of length ≤ [[MaxPiece]] of every
  *     distinct word, scored by its occurrence frequency (word-count
  *     weighted, overlapping occurrences counted); piece log-prob on
  *     the 1e-6 integer grid: lp6 = qln(freq) − qln(Σfreq).
  *  2. '''E-step''' (× [[Rounds]]): Viterbi-segment every DISTINCT
  *     word under the current piece scores — an unrolled DP over
  *     ≤ [[MaxWord]] positions whose per-cell argmin rides the
  *     composite-BIGINT trick (score·16 + backpointer, one `least`),
  *     ties to the smaller predecessor. Piece usage counts are the
  *     path pieces weighted by word count.
  *  3. '''M-step''': pieces with zero usage are pruned (the hard-EM
  *     form of SentencePiece's loss-contribution prune); survivors are
  *     re-scored lp6 = qln(c) − qln(Σc). Feasibility is invariant:
  *     every word's own round-r path survives into round r+1's vocab.
  *
  * Scale shape (100 TB): the ONLY corpus-scale job is the
  * word-frequency aggregation (one shuffle, map-side combine — the
  * same observation [[TextOps.bpeMerges]] builds on); the DP runs once
  * per DISTINCT word, weighted. The trained model crosses rounds as a
  * driver-literal map (vocab-bound collect, the BPE merge-table
  * precedent) — the exact "broadcast the model, not the corpus" shape
  * of a production tokenizer-training job. Words longer than
  * [[MaxWord]] fail LOUDLY (`raise_error`) instead of silently
  * truncating the DP (production: raise [[MaxWord]]; SentencePiece
  * equivalently caps and splits pre-tokens).
  *
  * Determinism: quantized logs are computed with the SAME `Math.log`
  * the in-plan expression would use (driver JVM ≡ executor JVM), and
  * DuckDB's `ln` agrees on the 1e-6 grid (the sanctioned
  * transcendental rule, CLAUDE.md); everything downstream is exact
  * BIGINT arithmetic, so the oracle chain ([[chainSql]]) reproduces
  * the engine bit-for-bit.
  */
object UnigramLM {

  /** DP positions per word — words longer than this raise. Raised
    * 10 → 16 (VERDICT r9 #4): the ceiling is a compile-time unroll
    * bound, and 16 is the largest value the 4-bit backpointer slot
    * supports (j ≤ MaxWord−1 = 15 < [[Slot]]); widening further means
    * Slot = 32 and re-deriving the [[Inf]] width budget
    * (MaxWord·Inf·Slot = 16·10¹⁵·16 ≈ 2.6·10¹⁷ ≪ 2⁶³ today). Plan
    * width stays linear in MaxWord — the DP advances one column per
    * stacked projection on both engines. */
  val MaxWord = 16
  /** Maximum piece length (SentencePiece `max_sentencepiece_length`,
    * set below the fixture word length so training exercises real
    * sub-word sharing rather than degenerating to whole words). */
  val MaxPiece = 4
  /** Hard-EM rounds after seeding. */
  val Rounds = 2
  /** Backpointer slot width: 4 bits hold positions 0..15 ≥ MaxWord. */
  val Slot = 16L
  /** Unreachable-cell cost; MaxWord·Inf·Slot stays far below 2⁶³. */
  val Inf = 1000000000000000L

  /** (predecessor j, position i) span pairs of a `maxW`-position DP. */
  def spanPairsFor(maxW: Int): Seq[(Int, Int)] =
    for { i <- 1 to maxW; j <- math.max(0, i - MaxPiece) until i }
      yield (j, i)

  /** Span pairs at the full [[MaxWord]] bound — what the static oracle
    * chain unrolls. */
  val spanPairs: Seq[(Int, Int)] = spanPairsFor(MaxWord)

  /** Observed DP bound: the longest DISTINCT word, capped by
    * [[MaxWord]] — the engine-side unroll SELF-SIZES from the data
    * (the iterative-partitioner precedent: size from an observed
    * count, cap at the compile-time bound). DP cells past the longest
    * word are provably dead — backtrack starts at e₁ = |word| — so
    * truncating them changes nothing, while every dropped layer saves
    * real driver-side plan machinery (the r9→r10 MaxWord raise 10→16
    * measured 2.1× on the whole row when unrolled unconditionally,
    * on a fixture whose longest word is 10). The ORACLE keeps the
    * full static [[MaxWord]] unroll — its extra cells are equally
    * dead, and DuckDB binds them linearly. One 1-row aggregate on the
    * cached word frame. */
  def effMaxWord(wf: DataFrame): Int = {
    val r = wf.agg(max(length(col("word")))).head()
    if (r.isNullAt(0)) 1
    else math.min(MaxWord, math.max(1, r.getInt(0)))
  }

  private def qlnCol(c: Column): Column =
    round(log(c.cast("double")) * lit(1e6)).cast("long")

  /** Driver twin of [[qlnCol]] — same Math.log, same HALF_UP round. */
  def qln(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)

  /** Distinct-word frequency table (word, cnt) — the one corpus-scale
    * job — with the loud MaxWord guard. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    graft.sources.Tables.spread(df)
      .select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("word",
        when(length(col("word")) <= MaxWord, col("word"))
          .otherwise(raise_error(concat(
            lit(s"UnigramLM: word longer than MaxWord=$MaxWord: "),
            col("word"))).cast("string")))

  /** Seed piece frequencies: every in-bounds substring span of every
    * distinct word, word-count weighted, overlapping occurrences
    * counted. */
  def seedFreq(wf: DataFrame, maxW: Int = MaxWord): DataFrame = {
    val spans = spanPairsFor(maxW).map { case (j, i) =>
      struct(lit(i - j).as("l"),
             expr(s"substr(word, ${j + 1}, ${i - j})").as("piece"))
    }
    wf.select(col("cnt"), explode(array(spans: _*)).as("s"))
      .filter(length(col("s.piece")) === col("s.l")) // drop clamped spans
      .groupBy(col("s.piece").as("piece"))
      .agg(sum(col("cnt")).as("f"))
  }

  /** lp6 map from a collected (piece, count) table: qln(c) − qln(Σc).
    * Vocab-bound driver work — the model artifact that ships to the
    * next E-step as literals. */
  def lpMap(counts: Seq[(String, Long)]): Map[String, Long] = {
    val t = qln(counts.map(_._2).sum)
    counts.map { case (p, c) => p -> (qln(c) - t) }.toMap
  }

  /** Viterbi DP + backtrack over the distinct-word frame under the
    * given piece scores: returns the word frame extended with the
    * path-piece columns `p1..pMaxWord` (null beyond the path). The DP
    * is generated as stacked projections (CollapseProject keeps
    * multiply-referenced cells split, so the expression tree stays
    * linear in the unroll bound). `maxW` is the layer count —
    * callers pass [[effMaxWord]]'s observed bound so dead layers are
    * never built. Shared by the train E-step ([[viterbiCounts]]) and
    * the encode pass ([[encodeStats]]). */
  def viterbiPaths(wf: DataFrame, vocab: Map[String, Long],
                   maxW: Int = MaxWord): DataFrame = {
    // ONE Literal node of MapType (a CreateMap of 2·|vocab| child
    // literals would be duplicated into every span lookup and push
    // Catalyst analysis into minutes at a few hundred pieces)
    val m = typedlit(vocab)
    var d = wf
      .withColumn("L", length(col("word")).cast("int"))
      .withColumn("b0", lit(0L))
    for (i <- 1 to maxW) {
      val branches = (math.max(0, i - MaxPiece) until i).map { j =>
        (expr(s"b$j DIV $Slot") +
          coalesce(-try_element_at(m,
            expr(s"substr(word, ${j + 1}, ${i - j})")), lit(Inf))) *
          lit(Slot) + lit(j.toLong)
      }
      d = d.withColumn(s"b$i",
        if (branches.size == 1) branches.head else least(branches: _*))
    }
    // backtrack: e₁ = word length, sₖ = backpointer(eₖ), piece ₖ =
    // word[sₖ, eₖ); a zero endpoint means the path ended earlier
    def bp(e: Column): Column =
      (1 to maxW).foldLeft(lit(0L)) { (acc, p) =>
        when(e === p, col(s"b$p") % lit(Slot)).otherwise(acc)
      }.cast("int")
    d = d.withColumn("e1", col("L"))
    for (k <- 1 to maxW) {
      d = d
        .withColumn(s"s$k",
          when(col(s"e$k") >= 1, bp(col(s"e$k"))).otherwise(lit(0)))
        .withColumn(s"p$k",
          when(col(s"e$k") >= 1, expr(s"substr(word, s$k + 1, e$k - s$k)")))
      if (k < maxW) d = d.withColumn(s"e${k + 1}", col(s"s$k"))
    }
    d
  }

  /** One Viterbi E-step: per-piece usage counts (word-count weighted)
    * under the given piece scores. */
  def viterbiCounts(wf: DataFrame, vocab: Map[String, Long],
                    maxW: Int = MaxWord): DataFrame =
    viterbiPaths(wf, vocab, maxW)
      .select(col("cnt"),
        explode(array((1 to maxW).map(k => col(s"p$k")): _*)).as("piece"))
      .filter(col("piece").isNotNull)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))

  /** Full training run: seed → [[Rounds]] × (E-step, prune+re-score).
    * Returns the final round's usage table
    * (piece, piece_len, n_uses) — all integers. */
  def train(df: DataFrame, textCol: String): DataFrame = {
    val wf = PlanCache.reuse(wordFreq(df, textCol))
    val maxW = effMaxWord(wf)
    def collect2(d: DataFrame): Seq[(String, Long)] =
      d.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    var vocab = lpMap(collect2(seedFreq(wf, maxW)))
    var counts: DataFrame = null
    for (r <- 1 to Rounds) {
      counts = viterbiCounts(wf, vocab, maxW)
      if (r < Rounds) vocab = lpMap(collect2(counts))
    }
    counts.select(col("piece"),
      length(col("piece")).cast("long").as("piece_len"),
      col("c").as("n_uses"))
  }

  /** ENCODE pass — the train→apply symmetry the BPE family has
    * ([[TextOps.bpeEncodeStats]]): train the model (seed +
    * [[Rounds]] hard-EM rounds, final survivors re-scored), then
    * Viterbi-segment the corpus under the trained scores and report
    * per-document piece statistics: word count, piece count, char
    * count, and pieces-per-1000-chars (the compression ratio,
    * integer permille).
    *
    * Scale shape (100 TB): training is [[train]]'s shape (one
    * word-frequency shuffle; vocab-bound collects). The apply half
    * segments each DISTINCT word once (the same dictionary-encoding
    * observation as BPE encode) and joins the per-word piece count
    * back onto the token stream — one corpus shuffle on the word key
    * with map-side-combinable rollup to the doc key after. The model
    * crosses into the plan as ONE `typedlit` map literal, never a
    * corpus-side structure. */
  def encodeStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wf = PlanCache.reuse(wordFreq(df, textCol))
    val maxW = effMaxWord(wf)
    def collect2(d: DataFrame): Seq[(String, Long)] =
      d.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    var vocab = lpMap(collect2(seedFreq(wf, maxW)))
    // one extra collect vs train(): the FINAL round's usage counts are
    // re-scored into the encode model (oracle twin: the v[Rounds] CTE)
    for (_ <- 1 to Rounds)
      vocab = lpMap(collect2(viterbiCounts(wf, vocab, maxW)))
    val npc = (1 to maxW)
      .map(k => when(col(s"p$k").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    val np = viterbiPaths(wf, vocab, maxW)
      .select(col("word"), npc.cast("long").as("np"))
    val tok = graft.sources.Tables.spread(df)
      .select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("word"))
    tok.join(np, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
           sum(col("np")).as("n_pieces"),
           sum(length(col("word")).cast("long")).as("n_chars"))
      // ANSI: DIV by a zero-char doc (all-empty tokens) must not throw
      .withColumn("pieces_permille",
        when(col("n_chars") > 0, expr("n_pieces * 1000 DIV n_chars"))
          .otherwise(lit(0L)))
  }

  // ---------------------------------------------------------- oracle SQL

  /** DuckDB twin of [[train]], fully unrolled: span costs land in
    * columns via one spans × vocab join + pivot per round, then the
    * DP and backtrack advance ONE column per chained CTE layer —
    * DuckDB's binder expands lateral/alias references by expression
    * DUPLICATION, so a same-SELECT alias chain with the DP's ×4
    * branching goes exponential (measured: a single-projection form
    * never finishes binding); across subquery layers the references
    * stay plain columns and binding is linear. Multiply-referenced
    * CTEs are MATERIALIZED; single-use layers are left inlinable. */
  def chainSql(docsRel: String = "documents", textCol: String = "text",
               encode: Boolean = false): String = {
    val spansValues = spanPairs
      .map { case (j, i) => s"($j, $i)" }.mkString(", ")
    def qlnSql(x: String): String =
      s"CAST(round(ln(CAST($x AS DOUBLE)) * 1000000) AS BIGINT)"

    def roundSql(r: Int, vocabCte: String): String = {
      val pivotCols = spanPairs.map { case (j, i) =>
        s"MAX(CASE WHEN j = $j AND i = $i THEN lp6 END) AS lp_${j}_$i"
      }.mkString(",\n      ")
      def bpCase(p: String) =
        s"CASE $p ${(1 to MaxWord)
          .map(q => s"WHEN $q THEN b$q % $Slot").mkString(" ")} ELSE 0 END"
      val layers = scala.collection.mutable.ArrayBuffer.empty[String]
      layers += s"SELECT *, length(word) AS e1, CAST(0 AS BIGINT) AS b0" +
        s" FROM pv$r"
      def prev = s"d${r}_${layers.size - 1}"
      for (i <- 1 to MaxWord) {
        val branches = (math.max(0, i - MaxPiece) until i).map { j =>
          s"((b$j // $Slot) + COALESCE(-lp_${j}_$i, $Inf)) * $Slot + $j"
        }
        val e = if (branches.size == 1) branches.head
                else s"least(${branches.mkString(", ")})"
        layers += s"SELECT *, $e AS b$i FROM $prev"
      }
      for (k <- 1 to MaxWord) {
        layers += s"SELECT *, CASE WHEN e$k >= 1 THEN ${bpCase(s"e$k")}" +
          s" ELSE 0 END AS s$k FROM $prev"
        val nxt = if (k < MaxWord) s", s$k AS e${k + 1}" else ""
        layers += s"SELECT *, CASE WHEN e$k >= 1 THEN" +
          s" substr(word, s$k + 1, e$k - s$k) END AS p$k$nxt FROM $prev"
      }
      val layerCtes = layers.zipWithIndex
        .map { case (q, idx) => s"d${r}_$idx AS ($q)" }.mkString(",\n")
      val pieces = (1 to MaxWord).map(k => s"p$k").mkString(", ")
      s"""jn$r AS (
         |  SELECT wf.word, wf.cnt, spn.j, spn.i, v.lp6
         |  FROM wf CROSS JOIN (VALUES $spansValues) AS spn(j, i)
         |  LEFT JOIN $vocabCte v
         |    ON v.piece = substr(wf.word, spn.j + 1, spn.i - spn.j)),
         |pv$r AS MATERIALIZED (
         |  SELECT word, cnt,
         |      $pivotCols
         |  FROM jn$r GROUP BY 1, 2),
         |$layerCtes,
         |cnt$r AS MATERIALIZED (
         |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest([$pieces]) AS piece
         |        FROM d${r}_${layers.size - 1})
         |  WHERE piece IS NOT NULL GROUP BY 1),
         |v$r AS MATERIALIZED (
         |  SELECT piece, ${qlnSql("c")}
         |    - (SELECT ${qlnSql("SUM(c)")} FROM cnt$r) AS lp6
         |  FROM cnt$r)""".stripMargin
    }
    def withBody(lastRound: Int): String = {
      val rounds = (1 to lastRound)
        .map(r => roundSql(r, if (r == 1) "v0" else s"v${r - 1}"))
        .mkString(",\n")
      s"""WITH wf AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split($textCol, ' ')) AS word
         |        FROM $docsRel)
         |  GROUP BY 1),
         |seedf AS MATERIALIZED (
         |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS f
         |  FROM (SELECT cnt, substr(word, j + 1, i - j) AS piece, i - j AS l
         |        FROM wf CROSS JOIN (VALUES $spansValues) AS spn(j, i))
         |  WHERE length(piece) = l GROUP BY 1),
         |v0 AS MATERIALIZED (
         |  SELECT piece, ${qlnSql("f")}
         |    - (SELECT ${qlnSql("SUM(f)")} FROM seedf) AS lp6
         |  FROM seedf),
         |$rounds""".stripMargin
    }
    if (!encode)
      s"""${withBody(Rounds)}
         |SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,
         |  c AS n_uses
         |FROM cnt$Rounds""".stripMargin
    else {
      // the ENCODE round: one more DP unroll against the FINAL
      // re-scored vocab v[Rounds] (roundSql emits it every round), then
      // per-word piece counts joined back onto the token stream
      val er = Rounds + 1
      val npExpr = (1 to MaxWord)
        .map(k => s"CASE WHEN p$k IS NOT NULL THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""${withBody(er)},
         |np AS (SELECT word, CAST($npExpr AS BIGINT) AS np
         |       FROM d${er}_${3 * MaxWord}),
         |tok AS (SELECT doc_id, unnest(string_split($textCol, ' ')) AS word
         |        FROM $docsRel)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(np.np) AS BIGINT) AS n_pieces,
         |  CAST(SUM(length(tok.word)) AS BIGINT) AS n_chars,
         |  CAST(CASE WHEN SUM(length(tok.word)) > 0
         |       THEN SUM(np.np) * 1000 // SUM(length(tok.word))
         |       ELSE 0 END AS BIGINT) AS pieces_permille
         |FROM tok JOIN np ON tok.word = np.word
         |GROUP BY doc_id""".stripMargin
    }
  }

  /** DuckDB twin of [[encodeStats]] — the [[chainSql]] training chain
    * plus one encode-round DP and the doc-grain rollup. */
  def encodeSql(docsRel: String = "documents", textCol: String = "text"):
      String = chainSql(docsRel, textCol, encode = true)
}
