package graft.queries

import graft.pipeline.{Classify, Csv, Dedup, GraphRank, Jsonl, Multimodal, PartitionedAnn, Retrieval, Sampling, Sharding, Similarity, TextAnalysis, Validation}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verified corpus for the training-data pipeline operators
  * (dedup, similarity search, text analysis, multimodal) — the
  * beyond-the-reference surface. Same determinism rules as
  * [[StarQueries]]; every md5-based operator is bit-reproducible, so
  * even MinHash/SimHash signatures oracle-match DuckDB exactly.
  */
object PipelineQueries {
  import StarQueries.t

  // --- deduplication --------------------------------------------

  /** Exact dedup ranking: md5 groups, keeper = lowest doc_id. */
  def ddExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactRank(t(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("text_hash"), col("dup_rank"))
      .orderBy(col("doc_id"))

  private val ddExactSql =
    """SELECT doc_id, md5(text) AS text_hash,
       ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
         AS dup_rank
       FROM documents ORDER BY doc_id"""

  /** Canonical-fingerprint duplicate groups. */
  def ddFingerprint(s: SparkSession, dir: String): DataFrame =
    Dedup.fingerprintGroups(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("fp"))

  private val ddFingerprintSql =
    """SELECT md5(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp,
       COUNT(*) AS group_size, MIN(doc_id) AS keeper
       FROM documents GROUP BY fp ORDER BY fp"""

  /** [[ddFingerprint]] with Unicode NFC composed into the chain
    * ([[Dedup.fingerprintGroupsNfc]], the CCNet normalization): the
    * oracle runs DuckDB's own nfc_normalize, so the gate proves the
    * native [[graft.functions.NfcNormalize]] expression
    * engine-neutral on the corpus (a FunctionsSpec fixture pins the
    * composed≡decomposed behavior ASCII data cannot exercise). */
  def ddFingerprintNfc(s: SparkSession, dir: String): DataFrame =
    Dedup.fingerprintGroupsNfc(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("fp"))

  private val ddFingerprintNfcSql =
    """SELECT md5(nfc_normalize(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp,
       COUNT(*) AS group_size, MIN(doc_id) AS keeper
       FROM documents GROUP BY fp ORDER BY fp"""

  /** MinHash(8) + LSH(4 bands) candidate pairs over word 3-shingles. */
  def ddMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashCandidates(
      t(s, dir, "documents").filter(col("doc_id") < 300), "text", "doc_id")
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** The MinHash band CTE chain (toks → shingles → 8-hash signature →
    * 4 LSH bands), shared verbatim by every oracle that replays the
    * banding: the three signature-form queries (relational, aggregate,
    * scalar), the sketch-then-verify jaccard, and the e2e dedup
    * resolution. One definition keeps the five provably in sync. */
  private def minhashBandsCte(bound: Int): String =
    s"""stoks AS (
         SELECT doc_id, unnest(tk) AS tok, unnest(range(len(tk))) AS pos
         FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\W+'),
                             x -> x <> '') AS tk
               FROM documents WHERE doc_id < $bound)),
       sh AS (
         SELECT doc_id,
           tok || ' ' || LEAD(tok,1) OVER w || ' ' || LEAD(tok,2) OVER w
             AS shingle
         FROM stoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       sig AS (
         SELECT doc_id,
           MIN(md5('0|' || shingle)) AS h0, MIN(md5('1|' || shingle)) AS h1,
           MIN(md5('2|' || shingle)) AS h2, MIN(md5('3|' || shingle)) AS h3,
           MIN(md5('4|' || shingle)) AS h4, MIN(md5('5|' || shingle)) AS h5,
           MIN(md5('6|' || shingle)) AS h6, MIN(md5('7|' || shingle)) AS h7
         FROM sh WHERE shingle IS NOT NULL GROUP BY doc_id),
       bands AS (
         SELECT doc_id, 0 AS band, md5(h0 || h1) AS band_hash FROM sig
         UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM sig
         UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM sig
         UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM sig)"""

  private val ddMinhashSql =
    s"""WITH ${minhashBandsCte(300)}
       SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM bands a JOIN bands b
         ON a.band = b.band AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id
       ORDER BY doc_a, doc_b"""

  /** [[ddMinhash]]'s candidate pairs from the INCREMENTALLY-
    * maintained band store ([[graft.streaming.LshStream]]): the same
    * doc_id < 300 corpus streamed in three batches through
    * processBatch (within-batch band self-join + cross-batch join
    * against the accumulated store — every pair lands in exactly one
    * batch partition), pairs read back from the accumulated `pairs/`
    * tree — against the SAME band-CTE oracle SQL verbatim
    * ([[ddMinhashSql]]), proving stream == batch for the one index
    * maintainer that previously had only a spec-level gate (round-19
    * directive #4; no re-arrivals here, so the supersede tier is
    * inert and the batch form's oracle applies unchanged). */
  def ddMinhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = layoutDir(dir, "documents", "lsh_incr_h8b4")
    layoutLock(root).synchronized {
      val m = new java.io.File(root, "_DELTAS_DONE")
      if (!m.exists()) {
        rmTree(new java.io.File(root))
        val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
        Seq(0L, 1L, 2L).foreach { i =>
          graft.streaming.LshStream.processBatch(
            docs.filter(col("doc_id") % 3 === i), i,
            s"$root/pairs", s"$root/bands", "text", "doc_id",
            numHashes = 8, bands = 4)
        }
        m.createNewFile(): Unit
      }
    }
    graft.streaming.LshStream.pairs(s, root)
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash signatures as 4×16-bit parts. */
  def ddSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashParts(
      t(s, dir, "documents").filter(col("doc_id") < 200), "text", "doc_id")
      .orderBy(col("doc_id"), col("part"))

  /** The SimHash vote chain (distinct tokens → md5 nibbles → bit
    * votes → 4×16-bit signature parts), shared by the relational and
    * native-expression signature oracles and the candidate-pair
    * oracle. */
  private def simhashPartsCte(bound: Int): String =
    s"""vtoks AS (
         SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\W+'),
                              x -> x <> '')) AS tok
         FROM documents WHERE doc_id < $bound),
       h AS (SELECT doc_id, md5(tok) AS hh FROM vtoks),
       nib AS (
         SELECT doc_id, hh, ni,
           instr('0123456789abcdef', substr(hh, CAST(ni AS INT), 1)) - 1
             AS nv
         FROM h CROSS JOIN range(1, 17) r1(ni)),
       bits AS (
         SELECT doc_id, (ni-1)*4 + b AS bitpos,
           ((nv >> CAST(b AS INT)) & 1) AS bit
         FROM nib CROSS JOIN range(0, 4) r2(b)),
       votes AS (
         SELECT doc_id, bitpos,
           CASE WHEN SUM(2*bit - 1) > 0 THEN 1 ELSE 0 END AS sbit
         FROM bits GROUP BY doc_id, bitpos),
       parts AS (
         SELECT doc_id, CAST(bitpos // 16 AS INT) AS part,
           CAST(SUM(sbit * (1::BIGINT << CAST(bitpos % 16 AS INT)))
             AS BIGINT) AS sig
         FROM votes GROUP BY doc_id, part)"""

  private lazy val ddSimhashSql =
    s"""WITH ${simhashPartsCte(200)}
       SELECT doc_id, part, sig FROM parts ORDER BY doc_id, part"""

  /** SimHash candidate pairs (Manku pigeonhole banding on the 4×16-bit
    * parts): keys sharing any exact signature part. The oracle extends
    * the dd_simhash vote pipeline with the banding self-join. */
  def ddSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashCandidates(
      t(s, dir, "documents").filter(col("doc_id") < 200), "text", "doc_id")
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))

  private lazy val ddSimhashPairsSql =
    s"""WITH ${simhashPartsCte(200)}
       SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM parts a JOIN parts b
         ON a.part = b.part AND a.sig = b.sig AND a.doc_id < b.doc_id
       ORDER BY doc_a, doc_b"""

  /** Token-set Jaccard near-dup pairs (inverted-index join). */
  def ddJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(
      t(s, dir, "documents").filter(col("doc_id") < 150), "text", "doc_id",
      threshold = 0.5)
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val ddJaccardSql =
    """WITH toks AS (
         SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\W+'),
                              x -> x <> '')) AS tok
         FROM documents WHERE doc_id < 150),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
       SELECT doc_a, doc_b,
         CAST(ROUND(CAST(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS jaccard
       FROM inter
       JOIN sizes sa ON sa.doc_id = doc_a
       JOIN sizes sb ON sb.doc_id = doc_b
       WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
       ORDER BY doc_a, doc_b"""

  /** Sketch-then-verify Jaccard: exact similarity computed only on the
    * MinHash+LSH candidate pairs — the scale form of dd_jaccard. Same
    * bound as dd_minhash_lsh (so every banding candidate is verified)
    * with a low verify threshold, so the gate exercises the whole
    * candidate set; every surviving pair carries its exact token-set
    * jaccard. */
  def ddJaccardVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.sketchVerifiedJaccard(
      t(s, dir, "documents").filter(col("doc_id") < 300), "text", "doc_id",
      threshold = 0.1)
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  private lazy val ddJaccardVerifiedSql =
    s"""WITH ${minhashBandsCte(300)},
       cands AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id),
       toks AS (
         SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\W+'),
                              x -> x <> '')) AS tok
         FROM documents WHERE doc_id < 300),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
       inter AS (
         SELECT c.doc_a, c.doc_b, COUNT(*) AS i
         FROM cands c
           JOIN toks a ON a.doc_id = c.doc_a
           JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
         GROUP BY c.doc_a, c.doc_b)
       SELECT doc_a, doc_b,
         CAST(ROUND(CAST(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS jaccard
       FROM inter
       JOIN sizes sa ON sa.doc_id = doc_a
       JOIN sizes sb ON sb.doc_id = doc_b
       WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.1
       ORDER BY doc_a, doc_b"""

  /** Embedding-cosine near-dup pairs. */
  def ddCosine(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(
      t(s, dir, "embeddings").filter(col("vec_id") < 120), "embedding",
      "vec_id", threshold = 0.3)
      .select(col("key_a").as("vec_a"), col("key_b").as("vec_b"),
        col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))

  private val ddCosineSql =
    """WITH v AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings WHERE vec_id < 120),
       pairs AS (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(a.embedding) AS x,
                         unnest(b.embedding) AS y) z) / (a.nrm * b.nrm)
             AS cos
         FROM v a JOIN v b ON a.vec_id < b.vec_id)
       SELECT vec_a, vec_b,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM pairs
       WHERE cos >= 0.3 ORDER BY vec_a, vec_b"""

  /** The scale-safe form of [[ddCosine]]: SRP-bucketed pair
    * generation (equi-join on the bucket id, never a cross join),
    * same output schema and threshold. The oracle embeds the same
    * fixed-seed hyperplane as a literal, proving the bucketing
    * engine-neutral — together with dd_cosine this hash-verifies both
    * the exact and the bucketed pair paths. */
  def ddCosineBucketed(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsBucketed(
      t(s, dir, "embeddings").filter(col("vec_id") < 120), "embedding",
      "vec_id", threshold = 0.3, planes = 1, dim = 64)
      .select(col("key_a").as("vec_a"), col("key_b").as("vec_b"),
        col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))

  private lazy val ddCosineBucketedSql = {
    val plane = Similarity.hyperplanes(1, 64).head
      .map(d => java.lang.Double.toString(d)).mkString("[", ", ", "]")
    s"""WITH v AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm,
           CASE WHEN (SELECT SUM(CAST(x AS DOUBLE) * y)
                      FROM (SELECT unnest(embedding) AS x,
                                   unnest($plane) AS y) z) >= 0
                THEN 1 ELSE 0 END AS bucket
         FROM embeddings WHERE vec_id < 120),
       pairs AS (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(a.embedding) AS x,
                         unnest(b.embedding) AS y) z) / (a.nrm * b.nrm)
             AS cos
         FROM v a JOIN v b
           ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       SELECT vec_a, vec_b,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM pairs
       WHERE cos >= 0.3 ORDER BY vec_a, vec_b"""
  }

  /** SimHash via the custom codegen'd Catalyst expression
    * ([[graft.functions.SimHash64]]): one scalar call per document
    * replaces the 64-way explode + two shuffles of [[ddSimhash]] —
    * verified against the *same* oracle SQL, proving the native
    * expression bit-equivalent to the relational pipeline. */
  def ddSimhashExpr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "documents").filter(col("doc_id") < 200)
      // match the relational pipeline and oracle: token-less or null
      // documents contribute no signature rows
      .filter(col("text").isNotNull &&
        size(TextAnalysis.tokens(col("text"))) > 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash64(col("text")).as("sh"))
      .select(col("doc_id"), posexplode(array((0 until 4).map(i =>
        expr(s"shiftrightunsigned(sh, ${16 * i}) & 65535")): _*))
        .as(Seq("part", "sig")))
      .orderBy(col("doc_id"), col("part"))
  }

  /** MinHash signatures via the custom `TypedImperativeAggregate`
    * ([[graft.functions.MinHashAgg]]): one sketch aggregate instead of
    * 8 parallel min() columns — same LSH banding and the same oracle
    * as [[ddMinhash]]. */
  def ddMinhashExpr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
    val sigs = Dedup.shingles(docs, "text", "doc_id")
      .groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions.minhash_agg(col("shingle"), 8)
        .as("sig"))
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        md5(concat(element_at(col("sig"), b * 2 + 1),
          element_at(col("sig"), b * 2 + 2)))): _*))
        .as(Seq("band", "band_hash")))
    val a = bands.select(col("doc_id").as("doc_a"), col("band"),
      col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"),
      col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash candidates via the scan-local scalar signature
    * ([[graft.functions.MinHashSigs]]): signatures come straight off
    * the document scan (no shingle explode, no window, no signature
    * groupBy — the only shuffle left is the band candidate join).
    * Same oracle as [[ddMinhash]], proving the scalar kernel
    * equivalent to the fully relational pipeline. */
  def ddMinhashScalar(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sigs = t(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhash_sigs(col("text"), 8)
          .as("sig"))
      .filter(col("sig").isNotNull)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        md5(concat(element_at(col("sig"), b * 2 + 1),
          element_at(col("sig"), b * 2 + 2)))): _*))
        .as(Seq("band", "band_hash")))
    val a = bands.select(col("doc_id").as("doc_a"), col("band"),
      col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"),
      col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Contrastive triplet mining ([[Similarity.contrastiveTriplets]]):
    * for each of the first 200 vectors, its hardest same-cluster
    * positive (cos ≥ 0.2) and hardest same-cluster negative
    * (cos < 0.1) under the deterministic √n codebook. The oracle
    * replays assignment, within-cluster pairing, and both ranked
    * picks. */
  def ddTriplets(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    Similarity.contrastiveTriplets(
      e.filter(col("vec_id") < 200), e, "embedding", "vec_id",
      centroids, posT = 0.2, negT = 0.1)
      .orderBy(col("anchor"))
  }

  /** The at-rest twin ([[Similarity.contrastiveTripletsAtRest]]):
    * identical triplets mined from a full-corpus `cent_id=`
    * partitioned layout — assignment read from the directories, only
    * the anchors' clusters scanned. Gated against the SAME oracle
    * verbatim ([[ddTriplets]] mines over the whole embeddings table,
    * so this layout covers it all — unlike the query-corpus split the
    * ann_* layouts use). */
  def ddTripletsAtRest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val out = annLayoutDir(dir, "ivf_sqrt50_all")
    ensureLayout(out)(PartitionedAnn.writeIvfPartitioned(
      e, "embedding", "vec_id", centroids, out))
    Similarity.contrastiveTripletsAtRest(s, out,
      e.filter(col("vec_id") < 200), "embedding", "vec_id", centroids,
      posT = 0.2, negT = 0.1)
      .orderBy(col("anchor"))
  }

  private lazy val ddTripletsSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM n WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT nn.vec_id, cent.cent_id, ROW_NUMBER() OVER
             (PARTITION BY nn.vec_id ORDER BY
               ((SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
                 FROM (SELECT unnest(nn.embedding) AS x,
                              unnest(cent.cemb) AS y) z)
                / (nn.nrm * cent.cnrm)) DESC, cent.cent_id) AS crk
           FROM n nn CROSS JOIN cent) WHERE crk = 1),
       prs AS (
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(na.embedding) AS x,
                         unnest(nb.embedding) AS y) z)
             / (na.nrm * nb.nrm) AS cos
         FROM assigned a
           JOIN assigned b ON a.cent_id = b.cent_id
             AND a.vec_id <> b.vec_id
           JOIN n na ON na.vec_id = a.vec_id
           JOIN n nb ON nb.vec_id = b.vec_id
         WHERE a.vec_id < 200),
       pos AS (
         SELECT a_id, b_id AS positive, cos AS pos_cos FROM (
           SELECT a_id, b_id, cos, ROW_NUMBER() OVER
             (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rk
           FROM prs WHERE cos >= CAST(0.2 AS DOUBLE)) WHERE rk = 1),
       neg AS (
         SELECT a_id, b_id AS negative, cos AS neg_cos FROM (
           SELECT a_id, b_id, cos, ROW_NUMBER() OVER
             (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rk
           FROM prs WHERE cos < CAST(0.1 AS DOUBLE)) WHERE rk = 1)
       SELECT p.a_id AS anchor, p.positive,
         CAST(ROUND(CAST(p.pos_cos AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS pos_cos,
         g.negative,
         CAST(ROUND(CAST(g.neg_cos AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS neg_cos
       FROM pos p JOIN neg g ON g.a_id = p.a_id
       ORDER BY anchor"""

  /** Decontamination scan: non-src0 documents sharing any 5-gram with
    * the held-out src0 subset. */
  def ddContamination(s: SparkSession, dir: String): DataFrame =
    Dedup.contaminationHits(t(s, dir, "documents"), "text", "doc_id",
      isTest = col("source") === "src0", n = 5)
      .orderBy(col("doc_id"))

  /** Decontamination against the at-rest corpus gram index
    * ([[Dedup.writeGramIndex]] / [[Dedup.contaminationHitsAtRest]]):
    * the corpus' distinct (doc, 5-gram) rows are written
    * gram_bucket-partitioned ONCE, and a run probes only the
    * benchmark grams' buckets — same output, same oracle SQL
    * verbatim as dd_contamination, so one replay proves the layout
    * lossless. The steady-state run stops paying the corpus gram
    * explode (the heaviest non-ANN cost at sf10). */
  def ddContaminationAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val out = layoutDir(dir, "documents", "gram5_b64")
    ensureLayout(out)(Dedup.writeGramIndex(docs, "text", "doc_id",
      out, n = 5, buckets = 64))
    Dedup.contaminationHitsAtRest(s, out,
      docs.filter(col("source") === "src0"), "text", "doc_id", n = 5,
      buckets = 64)
      .orderBy(col("doc_id"))
  }

  /** Decontamination against the INCREMENTALLY-maintained gram index
    * ([[graft.streaming.GramStream]]): base over a third of the
    * corpus, two streamed delta batches for the rest, probe over
    * base ∪ deltas — the SAME inline oracle SQL verbatim. */
  def ddContaminationIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "gram5_incr_b64")
    gramIncrementalLayout(s, dir, root, "_DELTAS_DONE")(())
    graft.streaming.GramStream.contaminationHitsIncremental(s, root,
      docs.filter(col("source") === "src0"), "text", "doc_id", n = 5,
      buckets = 64)
      .orderBy(col("doc_id"))
  }

  /** [[ddContaminationIncremental]]'s layout folded by
    * [[graft.streaming.GramStream.compact]], then probed — still the
    * inline oracle verbatim: compaction preserved every (doc, gram)
    * evidence row. */
  def ddContaminationCompacted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "gram5_cpt_b64")
    gramIncrementalLayout(s, dir, root, "_COMPACTED")(
      graft.streaming.GramStream.compact(s, root))
    graft.streaming.GramStream.contaminationHitsIncremental(s, root,
      docs.filter(col("source") === "src0"), "text", "doc_id", n = 5,
      buckets = 64)
      .orderBy(col("doc_id"))
  }

  private def gramIncrementalLayout(s: SparkSession, dir: String,
      root: String, marker: String)(maintain: => Unit): Unit = {
    val docs = t(s, dir, "documents")
    val m = new java.io.File(root, marker)
    if (!m.exists()) {
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 3 === 0),
        "text", "doc_id", s"$root/base", n = 5, buckets = 64)
      graft.streaming.GramStream.appendBatch(
        docs.filter(col("doc_id") % 3 === 1), 1L, root, "text",
        "doc_id", n = 5, buckets = 64)
      graft.streaming.GramStream.appendBatch(
        docs.filter(col("doc_id") % 3 === 2), 2L, root, "text",
        "doc_id", n = 5, buckets = 64)
      maintain
      m.createNewFile(): Unit
    }
  }

  /** The Bloom-prefiltered decontamination path
    * ([[Dedup.contaminationBloomHits]]): the sketch drops non-matching
    * corpus grams scan-side and the exact verify removes every false
    * positive, so the output — and therefore the oracle — is
    * IDENTICAL to dd_contamination. Running both against the same SQL
    * proves the prefilter lossless. */
  def ddContaminationBloom(s: SparkSession, dir: String): DataFrame =
    Dedup.contaminationBloomHits(t(s, dir, "documents"), "text",
      "doc_id", isTest = col("source") === "src0", n = 5)
      .orderBy(col("doc_id"))

  private val ddContaminationSql =
    """WITH toks AS (
         SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents
         WHERE len(list_filter(string_split_regex(lower(text), '\W+'),
                 x -> x <> '')) >= 5),
       grams AS (
         SELECT doc_id, source,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' ||
           tk[i+4] || ' ' || tk[i+5] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 4)) AS r(i)),
       test_grams AS (
         SELECT DISTINCT gram FROM grams WHERE source = 'src0')
       SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
       FROM grams g JOIN test_grams t ON g.gram = t.gram
       WHERE g.source <> 'src0'
       GROUP BY g.doc_id ORDER BY g.doc_id"""

  /** Benchmark contamination-rate report — the eval-hygiene artifact
    * every training run publishes (what fraction of each benchmark
    * slice leaks into the training corpus): dd_contamination's gram
    * machinery with the join DIRECTION flipped (per-BENCHMARK-doc
    * hits against the distinct train gram set — `broadcastTestSide
    * = false` because the "test side" here is the corpus, which must
    * never broadcast), rolled up per language: docs, contaminated
    * docs, shared-gram volume, 6-dp rate. O(langs) output rows;
    * benchmark docs shorter than the gram width count as clean on
    * both engines. */
  def ppContaminationReport(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val hits = Dedup.contaminationHits(d, "text", "doc_id",
      isTest = col("source") =!= "src0", n = 5,
      broadcastTestSide = false)
    d.filter(col("source") === "src0")
      .select(col("doc_id"), col("lang"))
      .join(hits, Seq("doc_id"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_shared").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(coalesce(col("n_shared"), lit(0L))).as("n_shared_grams"))
      .select(col("lang"), col("n_docs"), col("n_contaminated"),
        col("n_shared_grams"),
        round((col("n_contaminated").cast("double") /
          col("n_docs").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(20, 10)), 6)
          .cast("double").as("rate"))
      .orderBy(col("lang"))
  }

  private val ppContaminationReportSql =
    """WITH toks AS (
         SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents
         WHERE len(list_filter(string_split_regex(lower(text), '\W+'),
                 x -> x <> '')) >= 5),
       grams AS (
         SELECT doc_id, source,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' ||
           tk[i+4] || ' ' || tk[i+5] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 4)) AS r(i)),
       train_grams AS (
         SELECT DISTINCT gram FROM grams WHERE source <> 'src0'),
       hits AS (
         SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
         FROM grams g JOIN train_grams t ON g.gram = t.gram
         WHERE g.source = 'src0'
         GROUP BY g.doc_id)
       SELECT d.lang, COUNT(*) AS n_docs,
         COUNT(h.doc_id) AS n_contaminated,
         CAST(COALESCE(SUM(h.n_shared), 0) AS BIGINT)
           AS n_shared_grams,
         CAST(ROUND(CAST(CAST(COUNT(h.doc_id) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE) AS DECIMAL(20,10)), 6)
           AS DOUBLE) AS rate
       FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       WHERE d.source = 'src0'
       GROUP BY d.lang ORDER BY d.lang"""

  /** Dedup resolution over the cosine-pair graph: connected components
    * via GraphX (min-id labeling), one keeper per cluster. The oracle
    * replays the clustering as a recursive min-label CTE. */
  def ddComponents(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 120)
    val pairs = Similarity.cosinePairs(emb, "embedding", "vec_id",
      threshold = 0.3)
    Dedup.componentClusters(emb.select(col("vec_id")), "vec_id",
      pairs, "key_a", "key_b")
      .withColumn("is_keeper", col("vec_id") === col("component"))
      .orderBy(col("vec_id"))
  }

  /** The recursive min-label component CTE chain over the cosine-pair
    * graph (embeddings < 120) — shared by the components oracle and
    * the quality-survivor oracle. */
  private val ccCtes =
    """WITH RECURSIVE n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings WHERE vec_id < 120),
       pairs AS (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
                FROM (SELECT unnest(a.embedding) AS x,
                             unnest(b.embedding) AS y) z)
           / (a.nrm * b.nrm) >= 0.3),
       edges AS (SELECT va AS src, vb AS dst FROM pairs
                 UNION ALL SELECT vb, va FROM pairs),
       reach(node, root) AS (
         SELECT vec_id, vec_id FROM n
         UNION
         SELECT e.dst, r.root FROM reach r JOIN edges e
           ON e.src = r.node)"""

  private val ddComponentsSql =
    s"""$ccCtes
       SELECT node AS vec_id, MIN(root) AS component,
         node = MIN(root) AS is_keeper
       FROM reach GROUP BY node ORDER BY vec_id"""

  /** Quality-aware survivor selection ([[Dedup.keepBest]]): the same
    * cosine-pair clusters, but the keeper is the member with the
    * highest score — document length here, the simplest real survivor
    * policy (keep the longest copy) — ties broken by smallest id. The
    * oracle replays the component CTE chain plus the scoring join and
    * the row_number pick. */
  def ddKeepBest(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 120)
    val pairs = Similarity.cosinePairs(emb, "embedding", "vec_id",
      threshold = 0.3)
    val scores = t(s, dir, "documents")
      .select(col("doc_id").as("vec_id"),
        col("n_chars").cast("long").as("score"))
    Dedup.keepBest(emb.select(col("vec_id")), "vec_id", pairs,
      "key_a", "key_b", scores, "score")
      .orderBy(col("vec_id"))
  }

  private val ddKeepBestSql =
    s"""$ccCtes,
       comp AS (
         SELECT node AS vec_id, MIN(root) AS component
         FROM reach GROUP BY node),
       scored AS (
         SELECT c.vec_id, c.component,
           CAST(d.n_chars AS BIGINT) AS score
         FROM comp c JOIN documents d ON d.doc_id = c.vec_id)
       SELECT vec_id, component, score,
         (ROW_NUMBER() OVER (PARTITION BY component
            ORDER BY score DESC, vec_id)) = 1 AS is_keeper
       FROM scored ORDER BY vec_id"""

  /** PageRank centrality over the SAME cosine-pair graph as
    * [[ddComponents]] ([[GraphRank.pageRank]], 5 iterations, d=0.85):
    * the canonical-document signal — within a dup cluster the most
    * central member ranks highest. The oracle unrolls all five power
    * iterations in SQL with the identical decimal-routed contribution
    * sums, proving the iterative operator engine-neutral end to
    * end. */
  /** Triangle counting + local clustering coefficient
    * ([[GraphRank.triangleStats]]) over the co-purchase graph (parts
    * co-occurring in an order — the classic market-basket graph).
    * Degree-ordered orientation bounds the wedge join at O(m^1.5);
    * the pair explode per order is C(lines, 2) with a small bounded
    * k. Output is O(|V|) rows. */
  def grTriangles(s: SparkSession, dir: String): DataFrame = {
    val pp = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = pp.alias("a").join(pp.alias("b"),
      col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
    GraphRank.triangleStats(pairs, "pa", "pb")
  }

  private val grTrianglesSql =
    """WITH pp AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         FROM pp a JOIN pp b
           ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey),
       deg AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
         FROM (SELECT u AS node FROM e
               UNION ALL SELECT v AS node FROM e)
         GROUP BY node),
       tri AS (
         SELECT e1.u AS a, e1.v AS b, e2.v AS c
         FROM e e1 JOIN e e2 ON e2.u = e1.v
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
       tn AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
         FROM (SELECT a AS node FROM tri
               UNION ALL SELECT b AS node FROM tri
               UNION ALL SELECT c AS node FROM tri)
         GROUP BY node)
       SELECT d.node, d.degree,
         COALESCE(tn.n_triangles, 0) AS n_triangles,
         CAST(ROUND(CAST(CASE WHEN d.degree >= 2 THEN
           CAST(2 * COALESCE(tn.n_triangles, 0) AS DOUBLE) /
           CAST(d.degree * (d.degree - 1) AS DOUBLE)
           ELSE CAST(0 AS DOUBLE) END AS DECIMAL(28,10)), 6)
           AS DOUBLE) AS lcc
       FROM deg d LEFT JOIN tn USING (node)
       ORDER BY d.node"""

  /** DOULION-style approximate triangle count
    * ([[GraphRank.triangleCountApprox]], p = 128/256 = 0.5) over the
    * SAME co-purchase graph as [[grTriangles]] — the scale path for
    * the one genuinely super-linear exact gate (triangle MASS grows
    * ~sf^1.16 on the densifying graph, so the exact count is
    * infeasible at 100×100 TB; the md5-gated sample keeps a fixed
    * fraction of edges and the wedge work shrinks ~p³). The sampling
    * predicate is the q32 deterministic-hash idiom, so the DuckDB
    * oracle replays the ESTIMATE bit-for-bit; PipelineSpec separately
    * pins the estimate within tolerance of the exact count (the
    * q28/q42 contract split: hash-exactness by oracle, statistical
    * contract by spec). The exact form stays gated as the documented
    * baseline ([[inlineBaseline]]). */
  def grTrianglesApprox(s: SparkSession, dir: String): DataFrame = {
    val pp = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = pp.alias("a").join(pp.alias("b"),
      col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
    GraphRank.triangleCountApprox(pairs, "pa", "pb", keep = 128)
  }

  private val grTrianglesApproxSql =
    """WITH pp AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         FROM pp a JOIN pp b
           ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey),
       k AS (
         SELECT u, v FROM e
         WHERE substr(md5(CAST(u AS VARCHAR) || '|' ||
           CAST(v AS VARCHAR)), 1, 2) < '80'),
       tri AS (
         SELECT e1.u AS a, e1.v AS b, e2.v AS c
         FROM k e1 JOIN k e2 ON e2.u = e1.v
              JOIN k e3 ON e3.u = e1.u AND e3.v = e2.v),
       ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
       ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled FROM k),
       nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tri_sampled FROM tri)
       SELECT n_edges, n_sampled, tri_sampled,
         CAST(ROUND(CAST(CAST(tri_sampled AS DOUBLE) /
           CAST(0.125 AS DOUBLE) AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS est_triangles
       FROM ne CROSS JOIN ns CROSS JOIN nt"""

  def ddPagerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 120)
    val pairs = Similarity.cosinePairs(emb, "embedding", "vec_id",
      threshold = 0.3)
    GraphRank.pageRank(pairs, "key_a", "key_b", iters = 5,
      damping = 0.85)
      .select(col("id").as("vec_id"), col("pr"))
      .orderBy(col("vec_id"))
  }

  private lazy val ddPagerankSql = {
    val steps = (1 to 5).map { i =>
      s"""c$i AS (
           SELECT e.dst, CAST(r.rank / r.outdeg AS DECIMAL(28,15)) AS c
           FROM edges e JOIN r${i - 1} r ON r.id = e.src),
         r$i AS (
           SELECT c.dst AS id, d.outdeg,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE) * CAST(SUM(c.c) AS DOUBLE) AS rank
           FROM c$i c JOIN deg d ON d.src = c.dst CROSS JOIN nn
           GROUP BY c.dst, d.outdeg, nn.n)"""
    }.mkString(",\n       ")
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings WHERE vec_id < 120),
       pairs AS (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
                FROM (SELECT unnest(a.embedding) AS x,
                             unnest(b.embedding) AS y) z)
           / (a.nrm * b.nrm) >= 0.3),
       edges AS (SELECT va AS src, vb AS dst FROM pairs
                 UNION ALL SELECT vb, va FROM pairs),
       deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
       r0 AS (SELECT src AS id, outdeg, CAST(1.0 AS DOUBLE) / nn.n AS rank
              FROM deg CROSS JOIN nn),
       $steps
       SELECT id AS vec_id,
         CAST(ROUND(CAST(rank AS DECIMAL(28,10)), 6) AS DOUBLE) AS pr
       FROM r5 ORDER BY vec_id"""
  }

  // --- similarity search ----------------------------------------

  /** Exact top-5 cosine neighbors for the first 10 vectors against the
    * rest of the corpus. */
  def annBruteTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** kNN-classifier eval over the labeled embeddings
    * ([[Similarity.knnConfusion]]): the first 50 vectors classified
    * by majority vote of their 5 exact nearest labeled neighbors from
    * the rest; output is the confusion matrix. The oracle replays
    * neighbor search, the deterministic vote tie-break, and the
    * matrix counts. */
  def annKnnEval(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 50)
    val c = e.filter(col("vec_id") >= 50)
    val topk = Similarity.bruteForceTopK(q, c, "embedding", "vec_id",
      k = 5)
    Similarity.knnConfusion(topk, q, c, "label", "vec_id")
      .orderBy(col("true_label"), col("pred_label"))
  }

  private val annKnnEvalSql =
    """WITH n AS (
         SELECT vec_id, embedding, label,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 50),
       c AS (SELECT * FROM n WHERE vec_id >= 50),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS vote,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM q CROSS JOIN c),
       topk AS (
         SELECT q_id, c_id, vote,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored QUALIFY rank <= 5),
       votes AS (
         SELECT q_id, vote, COUNT(*) AS n_votes, MIN(rank) AS best
         FROM topk GROUP BY q_id, vote),
       pred AS (
         SELECT q_id, vote AS pred_label FROM (
           SELECT q_id, vote, n_votes, best,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY n_votes DESC, best, vote) AS vrank
           FROM votes) WHERE vrank = 1)
       SELECT q.label AS true_label, p.pred_label, COUNT(*) AS n
       FROM pred p JOIN q ON q.vec_id = p.q_id
       GROUP BY q.label, p.pred_label
       ORDER BY true_label, pred_label"""

  /** Int8-quantized brute-force top-k ([[Similarity.int8TopK]]): the
    * 4×-compressed at-rest form of the embedding corpus, scored in
    * exact integer arithmetic (per-vector scales cancel out of
    * cosine). The oracle replays quantization (floor(x·127/max|x| +
    * 0.5)), integer norms, and integer dots — every intermediate is
    * exact in both engines, so this is the one ANN variant with zero
    * float-accumulation caveats. */
  def annInt8TopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.int8TopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  private val annInt8Sql =
    """WITH n AS (
         SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       s AS (
         SELECT vec_id, v,
           (SELECT MAX(abs(x)) FROM unnest(v) t(x)) AS ma
         FROM n),
       qz AS (
         SELECT vec_id,
           list_transform(v,
             x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT)) AS q
         FROM s WHERE ma > 0),
       qn AS (
         SELECT vec_id, q,
           (SELECT SUM(x * x) FROM unnest(q) t(x)) AS nrm2
         FROM qz),
       qq AS (SELECT * FROM qn WHERE vec_id < 10),
       cc AS (SELECT * FROM qn WHERE vec_id >= 10),
       scored AS (
         SELECT qq.vec_id AS q_id, cc.vec_id AS c_id,
           CAST((SELECT SUM(x * y)
                 FROM (SELECT unnest(qq.q) AS x,
                              unnest(cc.q) AS y) z) AS DOUBLE) /
             (sqrt(CAST(qq.nrm2 AS DOUBLE)) *
              sqrt(CAST(cc.nrm2 AS DOUBLE))) AS icos
         FROM qq CROSS JOIN cc),
       ranked AS (
         SELECT q_id, c_id, icos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY icos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(icos AS DECIMAL(28,10)), 3) AS DOUBLE) AS icos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  private val annBruteSql =
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM q CROSS JOIN c),
       ranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Approximate top-k via sign-random-projection bucketing (one
    * hyperplane): queries score only same-bucket corpus vectors. The
    * oracle embeds the same fixed-seed hyperplane as a literal list,
    * proving the bucketing itself engine-neutral. */
  def annLshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5, planes = 1, dim = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annLshSql = {
    val plane = Similarity.hyperplanes(1, 64).head
      .map(d => java.lang.Double.toString(d)).mkString("[", ", ", "]")
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm,
           CASE WHEN (SELECT SUM(CAST(x AS DOUBLE) * y)
                      FROM (SELECT unnest(embedding) AS x,
                                   unnest($plane) AS y) z) >= 0
                THEN 1 ELSE 0 END AS bucket
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM q JOIN c ON q.bucket = c.bucket),
       ranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** Multi-probe LSH top-k: 2 hyperplanes (4 buckets), each query
    * probes its own bucket plus both 1-bit-flip neighbors — recall
    * recovered without shrinking the plane count. The oracle embeds
    * both fixed-seed hyperplanes and replays the probe-set membership
    * with xor(). */
  def annLshMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopKMultiProbe(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5, planes = 2, dim = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annLshMultiProbeSql = {
    val hp = Similarity.hyperplanes(2, 64)
    def lst(p: Array[Double]) =
      p.map(d => java.lang.Double.toString(d)).mkString("[", ", ", "]")
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm,
           (CASE WHEN (SELECT SUM(CAST(x AS DOUBLE) * y)
                       FROM (SELECT unnest(embedding) AS x,
                                    unnest(${lst(hp(0))}) AS y) z0) >= 0
                 THEN 1 ELSE 0 END) +
           (CASE WHEN (SELECT SUM(CAST(x AS DOUBLE) * y)
                       FROM (SELECT unnest(embedding) AS x,
                                    unnest(${lst(hp(1))}) AS y) z1) >= 0
                 THEN 2 ELSE 0 END) AS bucket
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM q JOIN c
           ON c.bucket IN (q.bucket, xor(q.bucket, 1), xor(q.bucket, 2))),
       ranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** Scale-aware IVF codebook rule shared by the ivf/semdedup queries:
    * the deterministic mod-50 key subset, capped at the first
    * 50*ceil(sqrt(n)) keys so the codebook grows as sqrt(corpus).
    * A pure mod rule degrades assignment to O(n^2/50) — 10x data
    * means 10x centroids x 10x vectors = 100x work (measured: 15 s
    * ann_ivf_topk at sf1 vs 1.2 s at sf0.1) — while sqrt sizing keeps
    * both assignment and within-cluster pairing at the classic IVF
    * O(n^1.5). Below ~2,500 vectors the cap exceeds the mod-50 key
    * range entirely, so sf0.01/sf0.1 results are bit-identical with
    * or without it. The count is one parquet-metadata job; the oracle
    * expresses the identical rule as a scalar subquery
    * ([[codebookCapSql]]). */
  private def codebookPred(e: DataFrame): Column = {
    val cap = 50L * math.ceil(math.sqrt(e.count().toDouble)).toLong
    col("vec_id") % 50 === 0 && col("vec_id") < cap
  }

  private val codebookCapSql =
    "50 * (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) FROM embeddings)"

  /** IVF approximate top-k: corpus vectors assigned to their nearest
    * centroid (the deterministic sqrt-sized [[codebookPred]] subset),
    * queries probe their 2 nearest centroids and score
    * only those clusters. The oracle replays the whole index build in
    * SQL, proving assignment, probing, and scoring engine-neutral. */
  def annIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.ivfTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5,
      centroidPred = codebookPred(e), nprobe = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annIvfSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM c WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       cscore AS (
         SELECT c.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(c.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (c.nrm * cent.cnrm)
             AS ccos
         FROM c CROSS JOIN cent),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM cscore) WHERE crk = 1),
       qscore AS (
         SELECT q.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (q.nrm * cent.cnrm)
             AS ccos
         FROM q CROSS JOIN cent),
       probed AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM qscore) WHERE crk <= 2),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM probed p
           JOIN assigned a ON a.cent_id = p.cent_id
           JOIN q ON q.vec_id = p.vec_id
           JOIN c ON c.vec_id = a.vec_id),
       ranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Binary (sign-bit) Hamming top-k ([[Similarity.binaryTopK]]):
    * the 64-dim corpus packed to two 32-bit words per vector, scored
    * by xor-popcount. The oracle counts sign disagreements off the
    * RAW vectors — the hash match proves the packed path computes
    * the definition exactly. */
  def annBinaryTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.binaryTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5, dim = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  private val annBinaryTopKSql =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 10),
       c AS (SELECT vec_id, embedding FROM embeddings
             WHERE vec_id >= 10),
       sc AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT COUNT(*) FROM
             (SELECT unnest(q.embedding) AS x,
                     unnest(c.embedding) AS y) z
            WHERE (x >= 0) <> (y >= 0)) AS hamming
         FROM q CROSS JOIN c),
       rk AS (
         SELECT q_id, c_id, hamming,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY hamming, c_id) AS rank
         FROM sc)
       SELECT q_id, rank, c_id, CAST(hamming AS BIGINT) AS hamming
       FROM rk WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Binary ANN against the packed-words-at-rest layout
    * ([[PartitionedAnn.writeBinaryPartitioned]] /
    * [[binaryTopKPartitioned]]): 8 bytes per vector on disk,
    * partitioned by the first four sign bits, same-bucket probing.
    * The oracle replays the restriction AND the distance off the RAW
    * vectors (first-4-signs equality + sign-disagreement count), so
    * the hash match proves packing, bucketing, pruning and popcount
    * in one replay. */
  def annBinaryPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val out = annLayoutDir(dir, "bin_w2_b4")
    ensureLayout(out)(PartitionedAnn.writeBinaryPartitioned(
      e.filter(col("vec_id") >= 10), "embedding", "vec_id", out,
      dim = 64, bucketBits = 4))
    PartitionedAnn.binaryTopKPartitioned(s, out,
      e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
      dim = 64, bucketBits = 4)
      .orderBy(col("q_id"), col("rank"))
  }

  private val annBinaryPartitionedSql =
    """WITH b AS (
         SELECT vec_id, embedding,
           (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
         FROM embeddings),
       q AS (SELECT * FROM b WHERE vec_id < 10),
       c AS (SELECT * FROM b WHERE vec_id >= 10),
       sc AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT COUNT(*) FROM
             (SELECT unnest(q.embedding) AS x,
                     unnest(c.embedding) AS y) z
            WHERE (x >= 0) <> (y >= 0)) AS hamming
         FROM q JOIN c ON q.bucket = c.bucket),
       rk AS (
         SELECT q_id, c_id, hamming,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY hamming, c_id) AS rank
         FROM sc)
       SELECT q_id, rank, c_id, CAST(hamming AS BIGINT) AS hamming
       FROM rk WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Matryoshka truncation eval ([[Similarity.truncationRecall]]):
    * recall@5 of prefix-8/16/32-dim brute search against the full
    * 64-dim ranking. The oracle replays all four searches (sliced
    * dots, sliced norms, ranking, overlap counting) end to end. */
  def annMrlEval(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.truncationRecall(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 5, dims = Seq(8, 16, 32))
  }

  private lazy val annMrlEvalSql = {
    def sliceDot(a: String, b: String, d: String): String =
      s"""(SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
           FROM (SELECT unnest(list_slice($a, 1, $d)) AS x,
                        unnest(list_slice($b, 1, $d)) AS y) z)"""
    def rankCte(d: Int): String = {
      val dd = d.toString
      s""",
       sc$d AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           ${sliceDot("q.embedding", "c.embedding", dd)} /
             (sqrt(${sliceDot("q.embedding", "q.embedding", dd)}) *
              sqrt(${sliceDot("c.embedding", "c.embedding", dd)})) AS cos
         FROM q CROSS JOIN c),
       rk$d AS (
         SELECT q_id, c_id FROM (
           SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank FROM sc$d)
         WHERE rank <= 5)"""
    }
    val dims = Seq(8, 16, 32)
    val union = dims.map(d =>
      s"SELECT $d AS dim, q_id, c_id FROM rk$d")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id < 10),
       c AS (SELECT vec_id, embedding FROM embeddings
             WHERE vec_id >= 10)${(dims :+ 64).map(rankCte).mkString}
       , hits AS ($union)
       SELECT h.dim,
         CAST(SUM(CASE WHEN f.q_id IS NULL THEN 0 ELSE 1 END)
           AS BIGINT) AS n_hits,
         COUNT(*) AS n_total,
         CAST(ROUND(CAST(
           CAST(SUM(CASE WHEN f.q_id IS NULL THEN 0 ELSE 1 END)
             AS DOUBLE) / COUNT(*) AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS recall
       FROM hits h LEFT JOIN rk64 f
         ON f.q_id = h.q_id AND f.c_id = h.c_id
       GROUP BY h.dim ORDER BY h.dim"""
  }

  /** Product-quantization ADC top-k ([[Similarity.pqTopK]]): the
    * corpus compressed to 8 one-byte-range codes per 64-float vector
    * (the same deterministic √n-capped codebook as the IVF tier, cut
    * into 8 subspaces), queries scored via asymmetric lookup tables —
    * no float corpus vector read at query time. The oracle replays the
    * ENTIRE structure in SQL — subvector slicing, per-subspace L2
    * argmin encoding, LUT partial dots, decimal-routed ADC sums —
    * proving the compression pipeline engine-neutral end to end. */
  def annPqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    Similarity.pqTopK(
      e.filter(col("vec_id") < 10), corpus, "embedding", "vec_id",
      k = 5, codebook = corpus.filter(codebookPred(e)), numSub = 8,
      subDim = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annPqSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT vec_id, embedding FROM n WHERE vec_id >= 10),
       cb AS (SELECT vec_id AS code_id, embedding AS cemb FROM n
              WHERE vec_id >= 10 AND vec_id % 50 = 0
                AND vec_id < $codebookCapSql),
       ms AS (SELECT CAST(unnest(range(8)) AS INTEGER) AS m),
       cw AS (
         SELECT ms.m, cb.code_id,
           list_slice(cb.cemb, ms.m*8 + 1, ms.m*8 + 8) AS w
         FROM cb CROSS JOIN ms),
       cwn AS (
         SELECT m, code_id, w,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
            FROM (SELECT unnest(w) AS x) u) AS cwn2
         FROM cw),
       csub AS (
         SELECT c.vec_id, ms.m,
           list_slice(c.embedding, ms.m*8 + 1, ms.m*8 + 8) AS s
         FROM c CROSS JOIN ms),
       cdist AS (
         SELECT cs.vec_id, cs.m, cwn.code_id, cwn.cwn2,
           ((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
             FROM (SELECT unnest(cs.s) AS x) u)
            - 2 * (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
                   FROM (SELECT unnest(cs.s) AS x,
                                unnest(cwn.w) AS y) z))
            + cwn.cwn2 AS d
         FROM csub cs JOIN cwn ON cwn.m = cs.m),
       codes AS (
         SELECT vec_id, m, code_id, cwn2 FROM (
           SELECT vec_id, m, code_id, cwn2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m
               ORDER BY d, code_id) AS rk
           FROM cdist) WHERE rk = 1),
       lut AS (
         SELECT q.vec_id AS q_id, q.nrm AS q_nrm, cwn.m, cwn.code_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(list_slice(q.embedding, cwn.m*8 + 1,
                                           cwn.m*8 + 8)) AS x,
                         unnest(cwn.w) AS y) z) AS pdot
         FROM q CROSS JOIN cwn),
       scored AS (
         SELECT l.q_id, l.q_nrm, k.vec_id AS c_id,
           CAST(SUM(CAST(l.pdot AS DECIMAL(28,15))) AS DOUBLE) AS adc,
           CAST(SUM(CAST(k.cwn2 AS DECIMAL(28,15))) AS DOUBLE) AS cn2
         FROM codes k JOIN lut l
           ON l.m = k.m AND l.code_id = k.code_id
         GROUP BY l.q_id, l.q_nrm, k.vec_id),
       ranked AS (
         SELECT q_id, c_id, adc / (q_nrm * sqrt(cn2)) AS cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY adc / (q_nrm * sqrt(cn2)) DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Two-stage PQ search with exact re-ranking
    * ([[Similarity.pqTopKRefined]] — the FAISS "refine" recipe): the
    * ADC pass over the 8-int codes keeps the top 20 candidates per
    * query, then ONLY those 20·|Q| vectors are read back at float
    * precision and re-scored with the exact cosine. The oracle
    * replays both stages — the full ADC ranking to depth 20 and the
    * exact-cosine re-rank — proving the candidate handoff
    * deterministic end to end. */
  def annPqRefined(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    Similarity.pqTopKRefined(
      e.filter(col("vec_id") < 10), corpus, "embedding", "vec_id",
      k = 5, refine = 20, codebook = corpus.filter(codebookPred(e)),
      numSub = 8, subDim = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annPqRefinedSql = {
    // annPqSql minus its final SELECT: the shared coarse-stage CTEs.
    val coarseCtes = annPqSql.substring(0, annPqSql.indexOf("SELECT q_id, rank"))
    s"""$coarseCtes ,
       coarse AS (SELECT q_id, c_id FROM ranked WHERE rank <= 20),
       rescored AS (
         SELECT r.q_id, r.c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(cv.embedding) AS y) z) / (q.nrm * cv.nrm)
             AS cos
         FROM coarse r
           JOIN q ON q.vec_id = r.q_id
           JOIN n cv ON cv.vec_id = r.c_id),
       reranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM rescored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM reranked WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** Cache for partitioned-at-rest ANN layouts: written once per
    * (sf dir, layout) and reused across Verify/Bench/test invocations
    * in the same container — the "write the index once" half of the
    * partitioned-ANN contract. The key encodes the layout parameters
    * AND the source table's (length, mtime) fingerprint, so both a
    * parameter change and a regenerated embeddings table invalidate
    * the cache by construction. (Concurrent cold-cache writers can
    * still race on the same directory — acceptable for a single-user
    * gate cache, the production story being an explicitly-managed
    * layout path.) */
  private[graft] def annLayoutDir(dir: String, layout: String): String =
    layoutDir(dir, "embeddings", layout)

  private[graft] def layoutDir(dir: String, srcTable: String,
      layout: String): String = {
    val src = new java.io.File(s"$dir/$srcTable.parquet")
    val stamp = s"$dir|$srcTable|${src.length()}|${src.lastModified()}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(stamp.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_ann_$key/$layout"
  }

  private def rmTree(f: java.io.File): Unit = if (f.exists()) {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  /** Per-root build lock for the gate-layout cache. Verify overlaps
    * queries on a small thread pool, and several gates share one
    * cached layout root (the refreshed IVF root, the NB counts
    * store, the BM25 index, …): two threads racing the same
    * cold-cache build each see no sentinel and write into the same
    * directories concurrently — one lists `base/` while the other's
    * write is mid-flight and trips over the committer's vanishing
    * `_temporary` task dirs. Builds serialize per root; the sentinel
    * re-check inside the lock makes the loser skip. */
  private val layoutLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def layoutLock(root: String): Object =
    layoutLocks.computeIfAbsent(root, _ => new Object)

  /** Build-once gate cache: the layout is authoritative only under
    * its `_SUCCESS` sentinel in `out`. A missing sentinel means a
    * cold cache OR a build interrupted mid-closure — and a
    * multi-step closure (several guarded batch appends under ONE
    * sentinel) must never replay OVER its own partial output: the
    * replayed first batch id would sit below the on-disk max and the
    * fresh-id / fold-watermark guards would (correctly, for a real
    * stream) reject it as a fresh-checkpoint restart, wedging the
    * cache forever. A cold sentinel therefore wipes `wipe` — the
    * layout root the closure writes under, defaulting to the
    * sentinel dir itself — and rebuilds from scratch. */
  private def ensureLayout(out: String)(write: => Unit): Unit =
    ensureLayout(out, out)(write)

  /** Max committed `batch=` id under a count store's `counts/` — the
    * fold watermark a DERIVED layout (e.g. a cached KN chain) stamps
    * into its own layout NAME, so appending a batch to the source
    * store changes the derived layout's identity and forces a
    * re-derivation (ensureLayout trusts sentinels; a stale derived
    * cache would otherwise be served forever). −1 = no committed
    * batch yet. */
  private def maxCommittedBatch(root: String): Long =
    // normalize first (round-14 rule): a file:-scheme root fed to
    // java.io.File is a RELATIVE ./file:/x path, which would list
    // nothing, stamp the derived chain layout _w-1, and serve a stale
    // chain forever
    Option(new java.io.File(
        graft.streaming.IvfStream.localPath(root), "counts")
      .listFiles()).toSeq.flatten
      .map(_.getName).collect {
        case n if n.startsWith("batch=") => n.drop(6).toLong
      }.foldLeft(-1L)(math.max)

  private def ensureLayout(out: String, wipe: String)(
      write: => Unit): Unit =
    layoutLock(wipe).synchronized {
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        rmTree(new java.io.File(wipe))
        write
      }
    }

  /** LSH top-k against the SRP-partitioned-at-rest corpus layout —
    * identical math to [[annLshTopK]] but with 4 planes (16 buckets)
    * so the partition pruning is real: the corpus is written
    * `bucket=N/` once and the query batch's buckets become a literal
    * partition filter (PlanSpec pins the PartitionFilters; SCALE.md
    * the measured file counts). */
  def annLshPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val out = annLayoutDir(dir, "srp_p4_d64")
    ensureLayout(out)(PartitionedAnn.writeSrpBucketed(
      e.filter(col("vec_id") >= 10), "embedding", "vec_id", out,
      planes = 4, dim = 64))
    PartitionedAnn.lshTopKPartitioned(s, out, e.filter(col("vec_id") < 10),
      "embedding", "vec_id", k = 5, planes = 4, dim = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  /** The SRP sign-bucket of `embedding` as a DuckDB expression — the
    * SQL twin of [[Similarity.srpBucket]] over the same fixed-seed
    * hyperplanes, shared by every oracle that replays a bucketed
    * layout. */
  private def srpBucketSqlExpr(planes: Int, dim: Int): String =
    Similarity.hyperplanes(planes, dim).zipWithIndex.map {
      case (p, i) =>
        val lits = p.map(d => java.lang.Double.toString(d))
          .mkString("[", ", ", "]")
        s"""(CASE WHEN (SELECT SUM(CAST(x AS DOUBLE) * y)
                        FROM (SELECT unnest(embedding) AS x,
                                     unnest($lits) AS y) z) >= 0
                  THEN ${1 << i} ELSE 0 END)"""
    }.mkString(" + ")

  private lazy val annLshPartitionedSql = {
    val bucketExpr = srpBucketSqlExpr(4, 64)
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm,
           ($bucketExpr) AS bucket
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM q JOIN c ON q.bucket = c.bucket),
       ranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** IVF top-k against the cent_id-partitioned-at-rest corpus layout —
    * same centroids/nprobe as [[annIvfTopK]] (so the same oracle
    * verifies both), but assignment happens once at write time and the
    * probe pass prunes `cent_id=` partitions via a literal filter. */
  def annIvfPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val out = annLayoutDir(dir, "ivf_sqrt50")
    ensureLayout(out)(PartitionedAnn.writeIvfPartitioned(
      corpus, "embedding", "vec_id", centroids, out))
    PartitionedAnn.ivfTopKPartitioned(s, out, e.filter(col("vec_id") < 10),
      "embedding", "vec_id", k = 5, centroids, nprobe = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF+PQ against the at-rest layout — the FAISS-IVFADC shape
    * ([[PartitionedAnn.writeIvfPqPartitioned]]): the deterministic
    * √n-capped subset plays both index roles (IVF centroids and PQ
    * codebook), queries probe their 2 nearest clusters, and the
    * probed candidates are scored by ADC lookup over the stored
    * 8-int code arrays. The oracle replays BOTH index builds and the
    * cluster-restricted ADC scoring end to end in SQL. */
  def annPqIvfPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val cw = Similarity.pqCodewords(corpus.filter(codebookPred(e)),
      "embedding", "vec_id", numSub = 8, subDim = 8)
      .localCheckpoint()
    val out = annLayoutDir(dir, "ivfpq_sqrt50_m8")
    ensureLayout(out)(PartitionedAnn.writeIvfPqPartitioned(
      corpus, "embedding", "vec_id", centroids, cw, out,
      numSub = 8, subDim = 8))
    PartitionedAnn.ivfPqTopKPartitioned(s, out,
      e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
      centroids, cw, nprobe = 2, subDim = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF+PQ against an INCREMENTALLY-built layout: a base build over
    * a third of the corpus plus two streamed delta appends
    * ([[graft.streaming.IvfStream.appendBatchPq]] — the code path
    * `IvfStream.run` drives per micro-batch). Assignment and PQ
    * encoding are both per-vector deterministic under the FIXED
    * centroids/codewords, so the streamed layout holds bit-identical
    * codes to a full rebuild — gated against the SAME full-rebuild
    * oracle verbatim. */
  def annPqIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val cw = Similarity.pqCodewords(corpus.filter(codebookPred(e)),
      "embedding", "vec_id", numSub = 8, subDim = 8)
      .localCheckpoint()
    val root = annLayoutDir(dir, "ivfpq_incr_sqrt50_m8")
    ensureLayout(s"$root/base")(PartitionedAnn.writeIvfPqPartitioned(
      corpus.filter(col("vec_id") % 3 === 0), "embedding", "vec_id",
      centroids, cw, s"$root/base", numSub = 8, subDim = 8))
    ensureLayout(s"$root/delta/batch=1")(
      graft.streaming.IvfStream.appendBatchPq(
        corpus.filter(col("vec_id") % 3 === 1), 1L, root, centroids,
        cw, "embedding", "vec_id", numSub = 8, subDim = 8))
    ensureLayout(s"$root/delta/batch=2")(
      graft.streaming.IvfStream.appendBatchPq(
        corpus.filter(col("vec_id") % 3 === 2), 2L, root, centroids,
        cw, "embedding", "vec_id", numSub = 8, subDim = 8))
    PartitionedAnn.ivfPqTopKFrames(s,
        graft.streaming.IvfStream.layoutPq(s, root),
        e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
        centroids, cw, nprobe = 2, subDim = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annPqIvfSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM c WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       cscore AS (
         SELECT c.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(c.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (c.nrm * cent.cnrm)
             AS ccos
         FROM c CROSS JOIN cent),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM cscore) WHERE crk = 1),
       qscore AS (
         SELECT q.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (q.nrm * cent.cnrm)
             AS ccos
         FROM q CROSS JOIN cent),
       probed AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM qscore) WHERE crk <= 2),
       ms AS (SELECT CAST(unnest(range(8)) AS INTEGER) AS m),
       cw AS (
         SELECT ms.m, cent.cent_id AS code_id,
           list_slice(cent.cemb, ms.m*8 + 1, ms.m*8 + 8) AS w
         FROM cent CROSS JOIN ms),
       cwn AS (
         SELECT m, code_id, w,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
            FROM (SELECT unnest(w) AS x) u) AS cwn2
         FROM cw),
       csub AS (
         SELECT c.vec_id, ms.m,
           list_slice(c.embedding, ms.m*8 + 1, ms.m*8 + 8) AS s
         FROM c CROSS JOIN ms),
       cdist AS (
         SELECT cs.vec_id, cs.m, cwn.code_id, cwn.cwn2,
           ((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
             FROM (SELECT unnest(cs.s) AS x) u)
            - 2 * (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
                   FROM (SELECT unnest(cs.s) AS x,
                                unnest(cwn.w) AS y) z))
            + cwn.cwn2 AS d
         FROM csub cs JOIN cwn ON cwn.m = cs.m),
       codes AS (
         SELECT vec_id, m, code_id, cwn2 FROM (
           SELECT vec_id, m, code_id, cwn2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m
               ORDER BY d, code_id) AS rk
           FROM cdist) WHERE rk = 1),
       lut AS (
         SELECT q.vec_id AS q_id, q.nrm AS q_nrm, cwn.m, cwn.code_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(list_slice(q.embedding, cwn.m*8 + 1,
                                           cwn.m*8 + 8)) AS x,
                         unnest(cwn.w) AS y) z) AS pdot
         FROM q CROSS JOIN cwn),
       scored AS (
         SELECT l.q_id, l.q_nrm, k.vec_id AS c_id,
           CAST(SUM(CAST(l.pdot AS DECIMAL(28,15))) AS DOUBLE) AS adc,
           CAST(SUM(CAST(k.cwn2 AS DECIMAL(28,15))) AS DOUBLE) AS cn2
         FROM codes k
           JOIN assigned a ON a.vec_id = k.vec_id
           JOIN probed p ON p.cent_id = a.cent_id
           JOIN lut l ON l.q_id = p.vec_id
             AND l.m = k.m AND l.code_id = k.code_id
         GROUP BY l.q_id, l.q_nrm, k.vec_id),
       ranked AS (
         SELECT q_id, c_id, adc / (q_nrm * sqrt(cn2)) AS cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY adc / (q_nrm * sqrt(cn2)) DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Two-stage IVF+PQ with exact re-ranking over TWO at-rest layouts
    * ([[PartitionedAnn.ivfPqTopKRefined]]): the coarse stage probes
    * the codes-only IVFADC layout (2 clusters, ADC lookup, no float
    * read) to depth 20, the refine stage reads those candidates' float
    * vectors back from the `cent_id=`-partitioned float layout —
    * pruned by the probe set AND the broadcast candidate keys — and
    * re-scores with the exact cosine. Both layouts are the ones the
    * sibling gates already write; the oracle replays the
    * cluster-restricted ADC ranking and the exact re-rank end to
    * end. */
  def annPqIvfRefined(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val cw = Similarity.pqCodewords(corpus.filter(codebookPred(e)),
      "embedding", "vec_id", numSub = 8, subDim = 8)
      .localCheckpoint()
    val codesOut = annLayoutDir(dir, "ivfpq_sqrt50_m8")
    ensureLayout(codesOut)(PartitionedAnn.writeIvfPqPartitioned(
      corpus, "embedding", "vec_id", centroids, cw, codesOut,
      numSub = 8, subDim = 8))
    val floatOut = annLayoutDir(dir, "ivf_sqrt50")
    ensureLayout(floatOut)(PartitionedAnn.writeIvfPartitioned(
      corpus, "embedding", "vec_id", centroids, floatOut))
    PartitionedAnn.ivfPqTopKRefined(s, codesOut, floatOut,
      e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
      refine = 20, centroids, cw, nprobe = 2, subDim = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annPqIvfRefinedSql = {
    // annPqIvfSql minus its final SELECT: the cluster-restricted
    // coarse-stage CTEs (probing, encoding, ADC ranking).
    val coarseCtes =
      annPqIvfSql.substring(0, annPqIvfSql.indexOf("SELECT q_id, rank"))
    s"""$coarseCtes ,
       coarse AS (SELECT q_id, c_id FROM ranked WHERE rank <= 20),
       rescored AS (
         SELECT r.q_id, r.c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(cv.embedding) AS y) z) / (q.nrm * cv.nrm)
             AS cos
         FROM coarse r
           JOIN q ON q.vec_id = r.q_id
           JOIN n cv ON cv.vec_id = r.c_id),
       reranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM rescored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
       FROM reranked WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** IVF top-k against an INCREMENTALLY-built at-rest layout: a base
    * build over a third of the corpus plus two streamed delta appends
    * ([[graft.streaming.IvfStream.appendBatch]] — the exact code path
    * `IvfStream.run` drives per micro-batch) covering the rest.
    * Same corpus/centroids/nprobe as [[annIvfPartitioned]], and gated
    * against the SAME oracle verbatim: assignment under a fixed
    * codebook is deterministic, so the incremental layout must be
    * row-for-row what a full rebuild writes — the hash match is the
    * losslessness proof (the dd_contamination_bloom pattern). */
  def annIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val root = annLayoutDir(dir, "ivf_incr_sqrt50")
    ensureLayout(s"$root/base")(PartitionedAnn.writeIvfPartitioned(
      corpus.filter(col("vec_id") % 3 === 0), "embedding", "vec_id",
      centroids, s"$root/base"))
    ensureLayout(s"$root/delta/batch=1")(
      graft.streaming.IvfStream.appendBatch(
        corpus.filter(col("vec_id") % 3 === 1), 1L, root, centroids,
        "embedding", "vec_id"))
    ensureLayout(s"$root/delta/batch=2")(
      graft.streaming.IvfStream.appendBatch(
        corpus.filter(col("vec_id") % 3 === 2), 2L, root, centroids,
        "embedding", "vec_id"))
    PartitionedAnn.ivfTopKFrames(s,
        graft.streaming.IvfStream.layout(s, root),
        e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
        centroids, nprobe = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Build base + two deltas exactly like [[annIvfIncremental]], in
    * `root`, guarded by `marker` so a warm cache skips the build (the
    * maintenance gates mutate the tree, so base/_SUCCESS alone cannot
    * key the cache). Runs `maintain` once after the build. */
  private def incrementalIvfThen(s: SparkSession, dir: String,
      root: String, marker: String)(
      maintain: => Unit): Unit = layoutLock(root).synchronized {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val m = new java.io.File(root, marker)
    if (!m.exists()) {
      rmTree(new java.io.File(root))
      PartitionedAnn.writeIvfPartitioned(
        corpus.filter(col("vec_id") % 3 === 0), "embedding", "vec_id",
        centroids, s"$root/base")
      graft.streaming.IvfStream.appendBatch(
        corpus.filter(col("vec_id") % 3 === 1), 1L, root, centroids,
        "embedding", "vec_id")
      graft.streaming.IvfStream.appendBatch(
        corpus.filter(col("vec_id") % 3 === 2), 2L, root, centroids,
        "embedding", "vec_id")
      maintain
      m.createNewFile(): Unit
    }
  }

  /** [[annIvfIncremental]]'s layout folded by [[IvfStream.compact]],
    * then probed with the SAME centroids/nprobe — and the SAME
    * full-rebuild oracle verbatim ([[annIvfSql]]): one replay proves
    * compaction preserved every vector and assignment (offline
    * maintenance is now driver-gated, not just spec-gated). */
  def annIvfCompacted(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val root = annLayoutDir(dir, "ivf_cpt_sqrt50")
    incrementalIvfThen(s, dir, root, "_COMPACTED")(
      graft.streaming.IvfStream.compact(s, root))
    PartitionedAnn.ivfTopKFrames(s,
        graft.streaming.IvfStream.layout(s, root),
        e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
        centroids, nprobe = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  /** [[annIvfIncremental]]'s layout re-clustered by
    * [[IvfStream.refreshCodebook]] (spherical k-means, k=8), then
    * probed through the persisted new codebook with nprobe=k — ALL
    * clusters, which makes IVF exact regardless of the codebook — so
    * the result must equal brute-force cosine top-k over the same
    * corpus and the gate replays [[annBruteSql]] verbatim. That
    * proves the refresh swap lossless end-to-end (every vector
    * present exactly once under the new partitioning) without
    * needing a (non-bit-replayable) k-means oracle; the refreshed
    * PRUNING path is pinned by the codebook-refresh StreamingSpec. */
  def annIvfRefreshed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val root = refreshedIvfRoot(s, dir)
    val newCents = s.read.parquet(s"$root/base/_codebook")
    PartitionedAnn.ivfTopKFrames(s,
        graft.streaming.IvfStream.layout(s, root),
        e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
        newCents, nprobe = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  /** The refreshed incremental root shared by [[annIvfRefreshed]]
    * and [[annInt8IvfRefreshed]]. rfr2: the codebook lives INSIDE
    * the layout (base/_codebook, swap-atomic with the partitioning)
    * — the name invalidates pre-move cached roots. */
  private def refreshedIvfRoot(s: SparkSession, dir: String): String = {
    val root = annLayoutDir(dir, "ivf_rfr2_sqrt50")
    incrementalIvfThen(s, dir, root, "_REFRESHED")(
      graft.streaming.IvfStream.refreshCodebook(s, root, k = 8,
        iters = 3): Unit)
    root
  }

  /** The int8 half of the codebook-refresh contract — the scaladoc's
    * "int8/PQ forms re-derive from a refreshed float corpus through
    * their own writers", now gated: the refreshed float layout is
    * re-quantized by [[PartitionedAnn.writeIvfPartitionedInt8]] under
    * the refreshed codebook, and the probe with nprobe = all clusters
    * is EXACT integer scoring over the whole corpus — so the result
    * must equal int8 brute force and the gate replays [[annInt8Sql]]
    * verbatim (per-vector max-abs quantization is corpus- and
    * codebook-independent, so re-derivation after a refresh loses
    * nothing). */
  def annInt8IvfRefreshed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val root = refreshedIvfRoot(s, dir)
    val newCents = s.read.parquet(s"$root/base/_codebook")
    val out8 = annLayoutDir(dir, "ivf_rfr2_int8_sqrt50")
    ensureLayout(out8)(PartitionedAnn.writeIvfPartitionedInt8(
      graft.streaming.IvfStream.layout(s, root)
        .select(col("c_id").as("vec_id"), col("c_vec").as("embedding")),
      "embedding", "vec_id", newCents, out8))
    PartitionedAnn.ivfTopKPartitionedInt8(s, out8,
      e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
      newCents, nprobe = 8)
      .orderBy(col("q_id"), col("rank"))
  }

  /** The fully-compounded 100 TB ANN form: SRP-partitioned at rest
    * (file-listing-time pruning) AND int8-quantized pages (measured
    * 3.5× smaller) AND exact-integer scoring
    * ([[PartitionedAnn.writeSrpBucketedInt8]]). The oracle replays
    * bucket assignment on the float vectors, quantization, and the
    * integer bucket-join scoring — proving the layout lossless
    * end-to-end. */
  def annInt8Partitioned(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val out = annLayoutDir(dir, "srp_int8_p4_d64")
    ensureLayout(out)(PartitionedAnn.writeSrpBucketedInt8(
      e.filter(col("vec_id") >= 10), "embedding", "vec_id", out,
      planes = 4, dim = 64))
    PartitionedAnn.lshTopKPartitionedInt8(s, out,
      e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
      planes = 4, dim = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annInt8PartitionedSql = {
    val bucketExpr = srpBucketSqlExpr(4, 64)
    s"""WITH base AS (
         SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           ($bucketExpr) AS bucket
         FROM embeddings),
       s AS (
         SELECT vec_id, v, bucket,
           (SELECT MAX(abs(x)) FROM unnest(v) t(x)) AS ma
         FROM base),
       qz AS (
         SELECT vec_id, bucket,
           list_transform(v,
             x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT)) AS q
         FROM s WHERE ma > 0),
       qn AS (
         SELECT vec_id, bucket, q,
           (SELECT SUM(x * x) FROM unnest(q) t(x)) AS nrm2
         FROM qz),
       qq AS (SELECT * FROM qn WHERE vec_id < 10),
       cc AS (SELECT * FROM qn WHERE vec_id >= 10),
       scored AS (
         SELECT qq.vec_id AS q_id, cc.vec_id AS c_id,
           CAST((SELECT SUM(x * y)
                 FROM (SELECT unnest(qq.q) AS x,
                              unnest(cc.q) AS y) z) AS DOUBLE) /
             (sqrt(CAST(qq.nrm2 AS DOUBLE)) *
              sqrt(CAST(cc.nrm2 AS DOUBLE))) AS icos
         FROM qq JOIN cc ON qq.bucket = cc.bucket),
       ranked AS (
         SELECT q_id, c_id, icos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY icos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(icos AS DECIMAL(28,10)), 3) AS DOUBLE) AS icos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** The IVF half of the compounded at-rest form
    * ([[PartitionedAnn.writeIvfPartitionedInt8]]): float centroid
    * probing → cent_id partition pruning → exact-integer scoring off
    * tinyint pages. Same codebook as ann_ivf_topk; the oracle replays
    * assignment and probing in float and the candidate scoring in
    * integers. */
  def annInt8IvfPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val out = annLayoutDir(dir, "ivf_int8_sqrt50")
    ensureLayout(out)(PartitionedAnn.writeIvfPartitionedInt8(
      corpus, "embedding", "vec_id", centroids, out))
    PartitionedAnn.ivfTopKPartitionedInt8(s, out,
      e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
      centroids, nprobe = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  /** [[annInt8IvfPartitioned]]'s layout built INCREMENTALLY — base
    * over a third of the corpus plus two int8 delta appends
    * ([[graft.streaming.IvfStream.appendBatchInt8]]). Per-vector
    * max-abs quantization is corpus-independent and assignment runs
    * under the fixed float codebook, so the streamed pages are
    * bit-identical to a full rebuild's — proven by sharing that
    * form's oracle verbatim. */
  def annInt8IvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val root = annLayoutDir(dir, "ivf_int8_incr_sqrt50")
    ensureLayout(s"$root/base")(PartitionedAnn.writeIvfPartitionedInt8(
      corpus.filter(col("vec_id") % 3 === 0), "embedding", "vec_id",
      centroids, s"$root/base"))
    ensureLayout(s"$root/delta/batch=1")(
      graft.streaming.IvfStream.appendBatchInt8(
        corpus.filter(col("vec_id") % 3 === 1), 1L, root, centroids,
        "embedding", "vec_id"))
    ensureLayout(s"$root/delta/batch=2")(
      graft.streaming.IvfStream.appendBatchInt8(
        corpus.filter(col("vec_id") % 3 === 2), 2L, root, centroids,
        "embedding", "vec_id"))
    PartitionedAnn.ivfTopKFramesInt8(s,
        graft.streaming.IvfStream.layoutInt8(s, root),
        e.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5,
        centroids, nprobe = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val annInt8IvfPartitionedSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       s AS (
         SELECT vec_id, embedding, v, nrm,
           (SELECT MAX(abs(x)) FROM unnest(v) t(x)) AS ma
         FROM n),
       qz AS (
         SELECT vec_id, embedding, nrm,
           list_transform(v,
             x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT)) AS qv
         FROM s WHERE ma > 0),
       qn AS (
         SELECT vec_id, embedding, nrm, qv,
           (SELECT SUM(x * x) FROM unnest(qv) t(x)) AS nrm2
         FROM qz),
       q AS (SELECT * FROM qn WHERE vec_id < 10),
       c AS (SELECT * FROM qn WHERE vec_id >= 10),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM c WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       cscore AS (
         SELECT c.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(c.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (c.nrm * cent.cnrm)
             AS ccos
         FROM c CROSS JOIN cent),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM cscore) WHERE crk = 1),
       qscore AS (
         SELECT q.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (q.nrm * cent.cnrm)
             AS ccos
         FROM q CROSS JOIN cent),
       probed AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM qscore) WHERE crk <= 2),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           CAST((SELECT SUM(x * y)
                 FROM (SELECT unnest(q.qv) AS x,
                              unnest(c.qv) AS y) z) AS DOUBLE) /
             (sqrt(CAST(q.nrm2 AS DOUBLE)) *
              sqrt(CAST(c.nrm2 AS DOUBLE))) AS icos
         FROM probed p
           JOIN assigned a ON a.cent_id = p.cent_id
           JOIN q ON q.vec_id = p.vec_id
           JOIN c ON c.vec_id = a.vec_id),
       ranked AS (
         SELECT q_id, c_id, icos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY icos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, rank, c_id,
         CAST(ROUND(CAST(icos AS DECIMAL(28,10)), 3) AS DOUBLE) AS icos
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** JSONL interchange round-trip ([[Jsonl]]): documents → JSON Lines
    * → read back schema-first → per-language profile (row count, char
    * mass, distinct text-hash cardinality). The oracle computes the
    * SAME profile from the parquet original, so a hash match proves
    * the round-trip byte-lossless — the contract that makes JSONL
    * safe as the pipeline's interchange format. The written layout is
    * cached like the ANN layouts (same mtime-fingerprinted key). */
  def ppJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val out = layoutDir(dir, "documents", "jsonl_docs")
    ensureLayout(out)(Jsonl.write(docs, out))
    Jsonl.read(s, out, docs.schema, failFast = true)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("char_mass"),
        countDistinct(md5(col("text"))).as("distinct_texts"))
      .orderBy(col("lang"))
  }

  private val ppJsonlRoundtripSql =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS char_mass,
         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_texts
       FROM documents GROUP BY lang ORDER BY lang"""

  /** CSV interchange round-trip ([[Csv]]): the same profile contract
    * as [[ppJsonlRoundtrip]] — documents → headered RFC-4180 CSV →
    * schema-first read-back → per-language profile, gated against the
    * IDENTICAL oracle (the profile of the parquet original). A hash
    * match proves the quoted/escaped text survives byte-for-byte. */
  def ppCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val out = layoutDir(dir, "documents", "csv_docs")
    ensureLayout(out)(Csv.write(docs, out))
    Csv.read(s, out, docs.schema, failFast = true)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("char_mass"),
        countDistinct(md5(col("text"))).as("distinct_texts"))
      .orderBy(col("lang"))
  }

  /** Composite retrieval pipeline: ANN top-3 per query joined back to
    * the documents table (vec_id == doc_id in the synthetic corpus)
    * with a quality filter — the retrieve-then-enrich shape a
    * training-data pipeline runs after dedup/quality scoring. */
  def ppRetrieval(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val hits = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 3)
    val docs = t(s, dir, "documents")
      .filter(col("n_chars") > 100)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    hits.join(docs, hits("c_id") === docs("doc_id"))
      .select(col("q_id"), col("rank"), col("c_id"), col("cos"),
        col("lang"), col("n_chars"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val ppRetrievalSql =
    """WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       q AS (SELECT * FROM n WHERE vec_id < 10),
       c AS (SELECT * FROM n WHERE vec_id >= 10),
       scored AS (
         SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.embedding) AS x,
                         unnest(c.embedding) AS y) z) / (q.nrm * c.nrm)
             AS cos
         FROM q CROSS JOIN c),
       ranked AS (
         SELECT q_id, c_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, c_id) AS rank
         FROM scored),
       hits AS (
         SELECT q_id, rank, c_id,
           CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 3) AS DOUBLE) AS cos
         FROM ranked WHERE rank <= 3)
       SELECT h.q_id, h.rank, h.c_id, h.cos, d.lang, d.n_chars
       FROM hits h JOIN documents d
         ON h.c_id = d.doc_id AND d.n_chars > 100
       ORDER BY h.q_id, h.rank"""

  /** BM25 lexical search ([[Retrieval.bm25TopK]]): three literal
    * query strings ranked over the documents corpus, k1=1.2 b=0.75,
    * Lucene idf. The oracle replays tokenization, the scan-local
    * postings build, per-term document frequencies, the fixed-order
    * per-term weight arithmetic, and the decimal-routed cross-term
    * sum — the complete scoring pipeline, engine-neutral. */
  def ppBm25Search(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (0L, "spark join window"),
      (1L, "fast table scan"),
      (2L, "stream batch query filter")).toDF("q_id", "q_text")
    Retrieval.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
      qs, "q_id", "q_text", k = 10)
      .orderBy(col("q_id"), col("rank"))
  }

  private val ppBm25SearchSql =
    """WITH qs AS (
         SELECT * FROM (VALUES
           (0, 'spark join window'),
           (1, 'fast table scan'),
           (2, 'stream batch query filter')) v(q_id, q_text)),
       qt AS (
         SELECT DISTINCT q_id, term FROM (
           SELECT q_id,
             unnest(list_filter(string_split_regex(lower(q_text), '\W+'),
               t -> t <> '')) AS term
           FROM qs)),
       tok AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             t -> t <> '') AS tk
         FROM documents),
       post AS (
         SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM tok)
         GROUP BY doc_id, term),
       dls AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tok),
       stats AS (
         SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           AVG(len(tk)) AS avgdl
         FROM tok),
       dfs AS (
         SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
         WHERE term IN (SELECT term FROM qt) GROUP BY term),
       scored AS (
         SELECT qt.q_id, p.doc_id,
           CAST(SUM(CAST(
             ln(CAST(1.0 AS DOUBLE) +
                (s.n_docs - d.df + CAST(0.5 AS DOUBLE)) /
                (d.df + CAST(0.5 AS DOUBLE)))
             * p.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
             / (p.tf + CAST(1.2 AS DOUBLE) *
                (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
                 CAST(0.75 AS DOUBLE) * l.dl / s.avgdl))
           AS DECIMAL(28,15))) AS DOUBLE) AS score
         FROM post p
           JOIN qt ON qt.term = p.term
           JOIN dfs d ON d.term = p.term
           JOIN dls l ON l.doc_id = p.doc_id
           CROSS JOIN stats s
         GROUP BY qt.q_id, p.doc_id),
       ranked AS (
         SELECT q_id, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id) AS rank
         FROM scored)
       SELECT q_id, rank, doc_id,
         CAST(ROUND(CAST(score AS DECIMAL(28,10)), 3) AS DOUBLE) AS score
       FROM ranked WHERE rank <= 10 ORDER BY q_id, rank"""

  /** BM25 hard-negative mining ([[Retrieval.hardNegatives]]): ten
    * pseudo-queries built from documents' own first five tokens (the
    * doc itself is the positive), top-3 non-positive BM25 hits mined
    * as hard negatives. The oracle re-derives the queries, replays
    * the full BM25 ranking and the positive-removal re-rank. */
  def ppHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val qs = d.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("doc_id").as("pos_id"),
        concat_ws(" ",
          slice(TextAnalysis.tokens(col("text")), 1, 5)).as("q_text"))
    Retrieval.hardNegatives(d, "text", "doc_id", qs, "q_id", "q_text",
      "pos_id", k = 10, nNeg = 3)
  }

  private lazy val ppHardNegativesSql = {
    val qsCte =
      """WITH qs AS (
         SELECT doc_id AS q_id, doc_id AS pos_id,
           array_to_string(list_filter(
             string_split_regex(lower(text), '\W+'),
             t -> t <> '')[1:5], ' ') AS q_text
         FROM documents WHERE doc_id < 10),"""
    // the shared BM25 body (qt .. ranked), minus the literal query
    // VALUES and the final SELECT
    val body = ppBm25SearchSql.substring(
      ppBm25SearchSql.indexOf("qt AS ("),
      ppBm25SearchSql.indexOf("SELECT q_id, rank"))
    val tail =
      """,
       negs AS (
         SELECT r.q_id, q.pos_id, r.doc_id AS neg_id, r.score,
           ROW_NUMBER() OVER (PARTITION BY r.q_id ORDER BY r.rank)
             AS neg_rank
         FROM ranked r JOIN qs q ON q.q_id = r.q_id
         WHERE r.rank <= 10 AND r.doc_id <> q.pos_id)
       SELECT q_id, pos_id, neg_id, neg_rank,
         CAST(ROUND(CAST(score AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS score
       FROM negs WHERE neg_rank <= 3 ORDER BY q_id, neg_rank"""
    qsCte + "\n       " + body + tail
  }

  /** [[ppBm25Search]] against the at-rest inverted index
    * ([[Retrieval.writeBm25Index]] / [[Retrieval.bm25TopKAtRest]]):
    * same queries, same k — and the SAME oracle SQL verbatim, so one
    * replay proves the probe path equals the inline path AND the
    * postings layout is lossless (the dd_semantic_at_rest proof
    * pattern). The index is written once per corpus fingerprint
    * ([[layoutDir]]); a probe reads only the query terms' buckets
    * (PlanSpec pins the PartitionFilters). */
  def ppBm25AtRest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (0L, "spark join window"),
      (1L, "fast table scan"),
      (2L, "stream batch query filter")).toDF("q_id", "q_text")
    val out = layoutDir(dir, "documents", "bm25_b64")
    ensureLayout(out)(Retrieval.writeBm25Index(
      t(s, dir, "documents"), "text", "doc_id", out, buckets = 64))
    Retrieval.bm25TopKAtRest(s, out, qs, "q_id", "q_text", k = 10,
      buckets = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  /** [[ppHardNegatives]] over the SHARED at-rest BM25 index
    * ([[Retrieval.hardNegativesAtRest]]) — mining reads only the
    * pseudo-queries' term buckets instead of rebuilding postings;
    * gated against [[ppHardNegativesSql]] VERBATIM (inline ≡ at-rest
    * plus layout losslessness in one replay). */
  def ppHardNegativesAtRest(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val qs = d.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("doc_id").as("pos_id"),
        concat_ws(" ",
          slice(TextAnalysis.tokens(col("text")), 1, 5)).as("q_text"))
    val out = layoutDir(dir, "documents", "bm25_b64")
    ensureLayout(out)(Retrieval.writeBm25Index(
      d, "text", "doc_id", out, buckets = 64))
    Retrieval.hardNegativesAtRest(s, out, qs, "q_id", "q_text",
      "pos_id", k = 10, nNeg = 3, buckets = 64)
  }

  /** Hybrid search: BM25 ([[Retrieval.bm25TopK]]) and exact cosine
    * ANN ([[Similarity.bruteForceTopK]]) top-20 lists for the SAME
    * three query documents (doc 0-2's text and embedding — the
    * documents and embeddings tables share the id space), fused by
    * reciprocal-rank fusion ([[Retrieval.rrfFuse]], kk=60). The
    * oracle replays both retrievers and the fusion arithmetic. */
  def ppHybridSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val e = t(s, dir, "embeddings")
    val qd = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"))
    val bm = Retrieval.bm25TopK(docs.filter(col("doc_id") >= 10),
      "text", "doc_id", qd, "q_id", "q_text", k = 20)
      .select(col("q_id"), col("rank"), col("doc_id"))
    val ann = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 3), e.filter(col("vec_id") >= 10),
      "embedding", "vec_id", k = 20)
      .select(col("q_id"), col("rank"), col("c_id").as("doc_id"))
    Retrieval.rrfFuse(bm, ann, kk = 60, k = 10)
      .orderBy(col("q_id"), col("rank"))
  }

  private val ppHybridSearchSql =
    """WITH qs AS (
         SELECT doc_id AS q_id, text AS q_text FROM documents
         WHERE doc_id < 3),
       qt AS (
         SELECT DISTINCT q_id, term FROM (
           SELECT q_id,
             unnest(list_filter(string_split_regex(lower(q_text), '\W+'),
               t -> t <> '')) AS term
           FROM qs)),
       tok AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             t -> t <> '') AS tk
         FROM documents WHERE doc_id >= 10),
       post AS (
         SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM tok)
         GROUP BY doc_id, term),
       dls AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tok),
       stats AS (
         SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           AVG(len(tk)) AS avgdl
         FROM tok),
       dfs AS (
         SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
         WHERE term IN (SELECT term FROM qt) GROUP BY term),
       bmscored AS (
         SELECT qt.q_id, p.doc_id,
           CAST(SUM(CAST(
             ln(CAST(1.0 AS DOUBLE) +
                (s.n_docs - d.df + CAST(0.5 AS DOUBLE)) /
                (d.df + CAST(0.5 AS DOUBLE)))
             * p.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
             / (p.tf + CAST(1.2 AS DOUBLE) *
                (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
                 CAST(0.75 AS DOUBLE) * l.dl / s.avgdl))
           AS DECIMAL(28,15))) AS DOUBLE) AS score
         FROM post p
           JOIN qt ON qt.term = p.term
           JOIN dfs d ON d.term = p.term
           JOIN dls l ON l.doc_id = p.doc_id
           CROSS JOIN stats s
         GROUP BY qt.q_id, p.doc_id),
       bmranked AS (
         SELECT q_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id) AS rank
         FROM bmscored QUALIFY rank <= 20),
       n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       vq AS (SELECT * FROM n WHERE vec_id < 3),
       vc AS (SELECT * FROM n WHERE vec_id >= 10),
       vscored AS (
         SELECT vq.vec_id AS q_id, vc.vec_id AS doc_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(vq.embedding) AS x,
                         unnest(vc.embedding) AS y) z) / (vq.nrm * vc.nrm)
             AS cos
         FROM vq CROSS JOIN vc),
       annranked AS (
         SELECT q_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, doc_id) AS rank
         FROM vscored QUALIFY rank <= 20),
       fused AS (
         SELECT COALESCE(b.q_id, a.q_id) AS q_id,
           COALESCE(b.doc_id, a.doc_id) AS doc_id,
           COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.rank),
                    CAST(0.0 AS DOUBLE)) +
           COALESCE(CAST(1.0 AS DOUBLE) / (60 + a.rank),
                    CAST(0.0 AS DOUBLE)) AS rrf
         FROM bmranked b FULL OUTER JOIN annranked a
           ON a.q_id = b.q_id AND a.doc_id = b.doc_id),
       franked AS (
         SELECT q_id, doc_id, rrf,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY rrf DESC, doc_id) AS rank
         FROM fused)
       SELECT q_id, rank, doc_id,
         CAST(ROUND(CAST(rrf AS DECIMAL(28,10)), 6) AS DOUBLE) AS rrf
       FROM franked WHERE rank <= 10 ORDER BY q_id, rank"""

  /** [[ppBm25Search]] against the INCREMENTALLY-maintained postings
    * index ([[graft.streaming.Bm25Stream]]): base indexed from a
    * third of the corpus, two streamed delta batches for the rest,
    * probe over base ∪ deltas with the exact generation-stats
    * combine — and the SAME inline oracle SQL verbatim, proving the
    * streamed index equals a full rebuild (the ann_ivf_incremental
    * proof pattern, lexical tier). */
  def ppBm25Incremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (0L, "spark join window"),
      (1L, "fast table scan"),
      (2L, "stream batch query filter")).toDF("q_id", "q_text")
    // _b64s: sidecar partitions now carry _ROWS size stamps (round
    // 19) — the layout-name bump forces pre-stamp caches to rebuild
    // (ensureLayout trusts sentinels; round-15 rule)
    val root = layoutDir(dir, "documents", "bm25_incr_b64s")
    bm25IncrementalLayout(s, dir, root, "_DELTAS_DONE")(())
    graft.streaming.Bm25Stream.bm25TopKIncremental(s, root, qs,
      "q_id", "q_text", k = 10, buckets = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  /** [[ppBm25Incremental]]'s layout folded by
    * [[graft.streaming.Bm25Stream.compact]], then probed — still the
    * inline oracle verbatim, proving compaction lossless for the
    * lexical tier (tf/dl/df evidence and the corpus scalars all
    * survive the fold). */
  def ppBm25Compacted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (0L, "spark join window"),
      (1L, "fast table scan"),
      (2L, "stream batch query filter")).toDF("q_id", "q_text")
    val root = layoutDir(dir, "documents", "bm25_cpt_b64s")
    bm25IncrementalLayout(s, dir, root, "_COMPACTED")(
      graft.streaming.Bm25Stream.compact(s, root))
    graft.streaming.Bm25Stream.bm25TopKIncremental(s, root, qs,
      "q_id", "q_text", k = 10, buckets = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Re-crawl/update support ([[graft.streaming.Bm25Stream]]'s
    * supersede sidecar): the FULL corpus is indexed as base, then one
    * streamed batch re-indexes every doc_id ≡ 0 mod 7 with updated
    * text (a deterministic suffix the oracle replays). The probe must
    * score ONLY the latest versions — stale postings anti-joined via
    * the sidecar, corpus scalars corrected by exact integer
    * subtraction — so the oracle is the inline BM25 replay over a
    * `latest` relation, with a fourth query targeting the suffix
    * terms so the update is visible in the ranking, not just the
    * stats. */
  def ppBm25Updated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (0L, "spark join window"),
      (1L, "fast table scan"),
      (2L, "stream batch query filter"),
      (3L, "graft refresh probe")).toDF("q_id", "q_text")
    val root = layoutDir(dir, "documents", "bm25_upd_b64s")
    val docs = t(s, dir, "documents")
    val m = new java.io.File(root, "_UPDATED")
    if (!m.exists()) {
      Retrieval.writeBm25Index(docs, "text", "doc_id", s"$root/base",
        buckets = 64)
      graft.streaming.Bm25Stream.appendBatch(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("text",
            concat(col("text"), lit(" graft refresh probe"))),
        1L, root, "text", "doc_id", buckets = 64)
      m.createNewFile(): Unit
    }
    graft.streaming.Bm25Stream.bm25TopKIncremental(s, root, qs,
      "q_id", "q_text", k = 10, buckets = 64)
      .orderBy(col("q_id"), col("rank"))
  }

  private val ppBm25UpdatedSql =
    """WITH latest AS (
         SELECT doc_id, CASE WHEN doc_id % 7 = 0
           THEN text || ' graft refresh probe' ELSE text END AS text
         FROM documents),
       qs AS (
         SELECT * FROM (VALUES
           (0, 'spark join window'),
           (1, 'fast table scan'),
           (2, 'stream batch query filter'),
           (3, 'graft refresh probe')) v(q_id, q_text)),
       qt AS (
         SELECT DISTINCT q_id, term FROM (
           SELECT q_id,
             unnest(list_filter(string_split_regex(lower(q_text), '\W+'),
               t -> t <> '')) AS term
           FROM qs)),
       tok AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             t -> t <> '') AS tk
         FROM latest),
       post AS (
         SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM tok)
         GROUP BY doc_id, term),
       dls AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tok),
       stats AS (
         SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           AVG(len(tk)) AS avgdl
         FROM tok),
       dfs AS (
         SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
         WHERE term IN (SELECT term FROM qt) GROUP BY term),
       scored AS (
         SELECT qt.q_id, p.doc_id,
           CAST(SUM(CAST(
             ln(CAST(1.0 AS DOUBLE) +
                (s.n_docs - d.df + CAST(0.5 AS DOUBLE)) /
                (d.df + CAST(0.5 AS DOUBLE)))
             * p.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
             / (p.tf + CAST(1.2 AS DOUBLE) *
                (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
                 CAST(0.75 AS DOUBLE) * l.dl / s.avgdl))
           AS DECIMAL(28,15))) AS DOUBLE) AS score
         FROM post p
           JOIN qt ON qt.term = p.term
           JOIN dfs d ON d.term = p.term
           JOIN dls l ON l.doc_id = p.doc_id
           CROSS JOIN stats s
         GROUP BY qt.q_id, p.doc_id),
       ranked AS (
         SELECT q_id, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id) AS rank
         FROM scored)
       SELECT q_id, rank, doc_id,
         CAST(ROUND(CAST(score AS DECIMAL(28,10)), 3) AS DOUBLE) AS score
       FROM ranked WHERE rank <= 10 ORDER BY q_id, rank"""

  /** Base (doc_id ≡ 0 mod 3) + two delta batches over the documents
    * table, guarded by `marker` (the maintenance gates mutate the
    * tree, so base/_SUCCESS alone cannot key the cache); `maintain`
    * runs once after the build. */
  private def bm25IncrementalLayout(s: SparkSession, dir: String,
      root: String, marker: String)(
      maintain: => Unit): Unit = layoutLock(root).synchronized {
    val docs = t(s, dir, "documents")
    val m = new java.io.File(root, marker)
    if (!m.exists()) {
      rmTree(new java.io.File(root))
      Retrieval.writeBm25Index(docs.filter(col("doc_id") % 3 === 0),
        "text", "doc_id", s"$root/base", buckets = 64)
      graft.streaming.Bm25Stream.appendBatch(
        docs.filter(col("doc_id") % 3 === 1), 1L, root, "text",
        "doc_id", buckets = 64)
      graft.streaming.Bm25Stream.appendBatch(
        docs.filter(col("doc_id") % 3 === 2), 2L, root, "text",
        "doc_id", buckets = 64)
      maintain
      m.createNewFile(): Unit
    }
  }

  /** Hybrid search in its 100 TB form: BOTH retriever legs probe
    * at-rest indexes — BM25 against a [[Retrieval.writeBm25Index]]
    * postings layout over the corpus documents, ANN against the
    * cent_id-partitioned IVF layout ([[annIvfPartitioned]]'s, reused —
    * same centroids/nprobe) — fused by the same RRF arithmetic as
    * [[ppHybridSearch]]. Each leg reads only its probed partitions
    * (PlanSpec pins PartitionFilters on BOTH scans). The ANN leg is
    * IVF-approximate rather than [[ppHybridSearch]]'s brute-force, so
    * the oracle replays the IVF index build (the [[annIvfTopK]]
    * replay, k=20) composed with the BM25 replay and the fusion. */
  def ppHybridAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val e = t(s, dir, "embeddings")
    val qd = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"))
    val bmOut = layoutDir(dir, "documents", "bm25_b64_ge10")
    ensureLayout(bmOut)(Retrieval.writeBm25Index(
      docs.filter(col("doc_id") >= 10), "text", "doc_id", bmOut,
      buckets = 64))
    val bm = Retrieval.bm25TopKAtRest(s, bmOut, qd, "q_id", "q_text",
      k = 20, buckets = 64)
      .select(col("q_id"), col("rank"), col("doc_id"))
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val ivfOut = annLayoutDir(dir, "ivf_sqrt50")
    ensureLayout(ivfOut)(PartitionedAnn.writeIvfPartitioned(
      corpus, "embedding", "vec_id", centroids, ivfOut))
    val ann = PartitionedAnn.ivfTopKPartitioned(s, ivfOut,
      e.filter(col("vec_id") < 3), "embedding", "vec_id", k = 20,
      centroids, nprobe = 2)
      .select(col("q_id"), col("rank"), col("c_id").as("doc_id"))
    Retrieval.rrfFuse(bm, ann, kk = 60, k = 10)
      .orderBy(col("q_id"), col("rank"))
  }

  private lazy val ppHybridAtRestSql =
    s"""WITH qs AS (
         SELECT doc_id AS q_id, text AS q_text FROM documents
         WHERE doc_id < 3),
       qt AS (
         SELECT DISTINCT q_id, term FROM (
           SELECT q_id,
             unnest(list_filter(string_split_regex(lower(q_text), '\\W+'),
               t -> t <> '')) AS term
           FROM qs)),
       tok AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             t -> t <> '') AS tk
         FROM documents WHERE doc_id >= 10),
       post AS (
         SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM tok)
         GROUP BY doc_id, term),
       dls AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tok),
       stats AS (
         SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           AVG(len(tk)) AS avgdl
         FROM tok),
       dfs AS (
         SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
         WHERE term IN (SELECT term FROM qt) GROUP BY term),
       bmscored AS (
         SELECT qt.q_id, p.doc_id,
           CAST(SUM(CAST(
             ln(CAST(1.0 AS DOUBLE) +
                (s.n_docs - d.df + CAST(0.5 AS DOUBLE)) /
                (d.df + CAST(0.5 AS DOUBLE)))
             * p.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
             / (p.tf + CAST(1.2 AS DOUBLE) *
                (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
                 CAST(0.75 AS DOUBLE) * l.dl / s.avgdl))
           AS DECIMAL(28,15))) AS DOUBLE) AS score
         FROM post p
           JOIN qt ON qt.term = p.term
           JOIN dfs d ON d.term = p.term
           JOIN dls l ON l.doc_id = p.doc_id
           CROSS JOIN stats s
         GROUP BY qt.q_id, p.doc_id),
       bmranked AS (
         SELECT q_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id) AS rank
         FROM bmscored QUALIFY rank <= 20),
       n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       vq AS (SELECT * FROM n WHERE vec_id < 3),
       vc AS (SELECT * FROM n WHERE vec_id >= 10),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM vc WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       cscore AS (
         SELECT vc.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(vc.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (vc.nrm * cent.cnrm)
             AS ccos
         FROM vc CROSS JOIN cent),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM cscore) WHERE crk = 1),
       qscore AS (
         SELECT vq.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(vq.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (vq.nrm * cent.cnrm)
             AS ccos
         FROM vq CROSS JOIN cent),
       probedc AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM qscore) WHERE crk <= 2),
       vscored AS (
         SELECT vq.vec_id AS q_id, vc.vec_id AS doc_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(vq.embedding) AS x,
                         unnest(vc.embedding) AS y) z) / (vq.nrm * vc.nrm)
             AS cos
         FROM probedc p
           JOIN assigned a ON a.cent_id = p.cent_id
           JOIN vq ON vq.vec_id = p.vec_id
           JOIN vc ON vc.vec_id = a.vec_id),
       annranked AS (
         SELECT q_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, doc_id) AS rank
         FROM vscored QUALIFY rank <= 20),
       fused AS (
         SELECT COALESCE(b.q_id, a.q_id) AS q_id,
           COALESCE(b.doc_id, a.doc_id) AS doc_id,
           COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.rank),
                    CAST(0.0 AS DOUBLE)) +
           COALESCE(CAST(1.0 AS DOUBLE) / (60 + a.rank),
                    CAST(0.0 AS DOUBLE)) AS rrf
         FROM bmranked b FULL OUTER JOIN annranked a
           ON a.q_id = b.q_id AND a.doc_id = b.doc_id),
       franked AS (
         SELECT q_id, doc_id, rrf,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY rrf DESC, doc_id) AS rank
         FROM fused)
       SELECT q_id, rank, doc_id,
         CAST(ROUND(CAST(rrf AS DECIMAL(28,10)), 6) AS DOUBLE) AS rrf
       FROM franked WHERE rank <= 10 ORDER BY q_id, rank"""

  /** DSIR importance weights ([[Sampling.dsirWeights]]): every
    * document scored by how English-target-like its bigram
    * distribution is (target model = `lang = 'en'` subset, raw model
    * = full corpus). The oracle replays both MLE models, the
    * 9-decimal ratio rounding, and the occurrence-weighted decimal
    * mean. */
  def ppDsirWeights(s: SparkSession, dir: String): DataFrame =
    Sampling.dsirWeights(t(s, dir, "documents"), "text", "doc_id",
      targetPred = col("lang") === "en", n = 2)
      .orderBy(col("doc_id"))

  /** DSIR weights off the persisted model store
    * ([[Sampling.writeDsirModel]] → [[Sampling.dsirWeightsFromStore]]):
    * train once at rest, apply with one corpus gram scan under the
    * store-stamped broadcast-gate hint — the recommended production
    * path (the inline form retrains both models per call). Shares
    * [[ppDsirWeightsSql]] verbatim: the store is trained on the same
    * corpus, so apply-from-store == inline retrain bit-for-bit, and
    * one oracle replay proves both the scorer and the layout
    * lossless. */
  def ppDsirWeightsAtRest(s: SparkSession, dir: String): DataFrame = {
    val out = layoutDir(dir, "documents", "dsir_model_n2_en")
    ensureLayout(out)(Sampling.writeDsirModel(
      t(s, dir, "documents"), "text",
      targetPred = col("lang") === "en", n = 2, outDir = out))
    Sampling.dsirWeightsFromStore(t(s, dir, "documents"), "text",
      "doc_id", out)
      .orderBy(col("doc_id"))
  }

  /** The DSIR weight computation as shared CTEs (`w` = the weights
    * relation) — one replay text serving the weights gate, the
    * at-rest twin, and the selection gate. */
  private val ppDsirCtes =
    """toks AS (
         SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT doc_id, lang, tk[i+1] || ' ' || tk[i+2] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       tc AS (SELECT gram, COUNT(*) AS c FROM g
              WHERE lang = 'en' GROUP BY gram),
       tn AS (SELECT CAST(SUM(c) AS DOUBLE) AS nt FROM tc),
       tm AS (SELECT gram,
                CAST(ROUND(CAST(CAST(c AS DOUBLE) / nt
                  AS DECIMAL(28,10)), 9) AS DECIMAL(18,9)) AS p9t
              FROM tc CROSS JOIN tn),
       rc AS (SELECT gram, COUNT(*) AS c FROM g GROUP BY gram),
       rn AS (SELECT CAST(SUM(c) AS DOUBLE) AS nr FROM rc),
       rm AS (SELECT gram,
                CAST(ROUND(CAST(CAST(c AS DOUBLE) / nr
                  AS DECIMAL(28,10)), 9) AS DECIMAL(18,9)) AS p9r
              FROM rc CROSS JOIN rn),
       occ AS (SELECT doc_id, gram, COUNT(*) AS occ FROM g
               GROUP BY doc_id, gram),
       sc AS (
         SELECT o.doc_id, SUM(o.occ) AS n_grams,
           SUM(CASE WHEN r.p9r > 0 THEN
                 CAST(ROUND(CAST(
                   CAST(COALESCE(t.p9t, CAST(0 AS DECIMAL(18,9)))
                     AS DOUBLE) / CAST(r.p9r AS DOUBLE)
                 AS DECIMAL(28,10)), 9) AS DECIMAL(18,9))
               ELSE CAST(0 AS DECIMAL(18,9)) END
             * CAST(o.occ AS DECIMAL(10,0))) AS r_sum
         FROM occ o
           LEFT JOIN tm t ON t.gram = o.gram
           JOIN rm r ON r.gram = o.gram
         GROUP BY o.doc_id),
       w AS (
         SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(ROUND(CAST(CAST(r_sum AS DOUBLE) / n_grams
             AS DECIMAL(28,10)), 3) AS DOUBLE) AS dsir_weight
         FROM sc)"""

  private val ppDsirWeightsSql =
    s"""WITH $ppDsirCtes
       SELECT doc_id, n_grams, dsir_weight FROM w ORDER BY doc_id"""

  private val ppDsirSelectSql =
    s"""WITH $ppDsirCtes
       SELECT CAST(ROW_NUMBER() OVER
           (ORDER BY dsir_weight DESC, doc_id) AS INT) AS rank,
         doc_id, dsir_weight
       FROM w ORDER BY rank LIMIT 100"""

  /** Deterministic importance resampling off the at-rest model
    * ([[Sampling.dsirSelect]]) — the end of the DSIR pipeline: the
    * top-100 most target-like documents, rank order reproducible
    * across engines (3-dp weights, key tie-break). */
  def ppDsirSelect(s: SparkSession, dir: String): DataFrame = {
    val out = layoutDir(dir, "documents", "dsir_model_n2_en")
    ensureLayout(out)(Sampling.writeDsirModel(
      t(s, dir, "documents"), "text",
      targetPred = col("lang") === "en", n = 2, outDir = out))
    Sampling.dsirSelect(
      Sampling.dsirWeightsFromStore(t(s, dir, "documents"), "text",
        "doc_id", out),
      "doc_id", n = 100)
  }

  /** Corpus profiling report ([[TextAnalysis.corpusProfile]]): per
    * source, doc/token counts and exact interpolated token-length
    * percentiles. The replay mirrors the engine's integer-exact
    * interpolation verbatim — `value·100 = a·100 + ((n−1)·pnum mod
    * 100)·(b−a)` over the per-group sorted counts, pure BIGINT
    * arithmetic, one final IEEE-exact `/100.0` — rather than
    * `quantile_cont`, whose double lerp can differ from any other
    * engine's by one ulp exactly at a rounding tie (the round-10
    * driver-gate flake). */
  def ppProfile(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusProfile(t(s, dir, "documents"), "text", "source")
      .orderBy(col("source"))

  private val ppProfileSql =
    """WITH t AS (
         SELECT source,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT) AS nt
         FROM documents),
       cnts AS (
         SELECT source, nt, COUNT(*) AS c FROM t GROUP BY source, nt),
       cum AS (
         SELECT source, nt, c,
           SUM(c) OVER (PARTITION BY source ORDER BY nt) AS cum
         FROM cnts),
       tot AS (
         SELECT source, SUM(c) AS n_docs, SUM(nt * c) AS n_tokens,
           MAX(nt) AS max_tokens
         FROM cnts GROUP BY source),
       j AS (
         SELECT cum.source, cum.nt, cum.cum,
           tot.n_docs, tot.n_tokens, tot.max_tokens,
           (tot.n_docs - 1) * 50 AS h50,
           (tot.n_docs - 1) * 90 AS h90,
           (tot.n_docs - 1) * 99 AS h99
         FROM cum JOIN tot ON tot.source = cum.source),
       agg AS (
         SELECT source,
           MAX(n_docs) AS n_docs, MAX(n_tokens) AS n_tokens,
           MAX(max_tokens) AS max_tokens,
           MIN(CASE WHEN cum >= h50 // 100 + 1 THEN nt END) AS a50,
           MIN(CASE WHEN cum >= LEAST(h50 // 100 + 1, n_docs - 1) + 1
                    THEN nt END) AS b50,
           MAX(h50 % 100) AS f50,
           MIN(CASE WHEN cum >= h90 // 100 + 1 THEN nt END) AS a90,
           MIN(CASE WHEN cum >= LEAST(h90 // 100 + 1, n_docs - 1) + 1
                    THEN nt END) AS b90,
           MAX(h90 % 100) AS f90,
           MIN(CASE WHEN cum >= h99 // 100 + 1 THEN nt END) AS a99,
           MIN(CASE WHEN cum >= LEAST(h99 // 100 + 1, n_docs - 1) + 1
                    THEN nt END) AS b99,
           MAX(h99 % 100) AS f99
         FROM j GROUP BY source)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(a50 * 100 + f50 * (b50 - a50) AS DOUBLE) / 100.0
           AS p50_tokens,
         CAST(a90 * 100 + f90 * (b90 - a90) AS DOUBLE) / 100.0
           AS p90_tokens,
         CAST(a99 * 100 + f99 * (b99 - a99) AS DOUBLE) / 100.0
           AS p99_tokens,
         max_tokens
       FROM agg ORDER BY source"""

  // --- text analysis --------------------------------------------

  /** Language-ID heuristic vs the labeled lang column. */
  def taLangid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted"))
      .orderBy(col("doc_id"))

  private val taLangidSql = {
    // score = total marker chars removed; langs evaluated in the same
    // (score, lang) lexicographic argmax as the Spark greatest(struct)
    def score(ms: Seq[String]): String = ms.map { m =>
      s"(length(p) - length(replace(p, '$m', '')))"
    }.mkString(" + ")
    val markers = TextAnalysis.langMarkers.toSeq.sortBy(_._1)
    val rows = markers.map { case (lang, ms) =>
      s"SELECT doc_id, '$lang' AS lang_cand, ${score(ms)} AS sc FROM padded"
    }.mkString(" UNION ALL ")
    s"""WITH padded AS (
          SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
        cand AS ($rows),
        best AS (
          SELECT doc_id, lang_cand, sc,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY sc DESC, lang_cand DESC) AS rn
          FROM cand)
        SELECT d.doc_id, d.lang,
          CASE WHEN b.sc > 0 THEN b.lang_cand ELSE 'und' END AS predicted
        FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
        ORDER BY d.doc_id"""
  }

  /** Quality metrics per document. */
  def taQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityMetrics(
      t(s, dir, "documents").filter(col("doc_id") < 200), "text")
      .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
        col("stopword_ratio"), col("punct_density"), col("quality_score"))
      .orderBy(col("doc_id"))

  private val taQualitySql =
    """WITH m AS (
         SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\W+'),
                           x -> x <> '')) AS n_tokens,
           len(list_filter(string_split_regex(lower(text), '\W+'),
               x -> list_contains(['the','a','and','of','to'], x)))
             AS n_stop,
           length(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g'))
             AS n_nonspace,
           length(regexp_replace(lower(text),
             '[a-z0-9 \t\n\x0B\f\r]', '', 'g')) AS n_punct,
           length(text) AS n_len
         FROM documents WHERE doc_id < 200)
       SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(ROUND(CAST(CASE WHEN n_tokens > 0
           THEN CAST(n_nonspace AS DOUBLE) / n_tokens ELSE 0.0 END
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS avg_token_len,
         CAST(ROUND(CAST(CASE WHEN n_tokens > 0
           THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS stopword_ratio,
         CAST(ROUND(CAST(CASE WHEN n_len > 0
           THEN CAST(n_punct AS DOUBLE) / n_len ELSE 0.0 END
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS punct_density,
         CAST(ROUND(CAST(GREATEST(0.0, LEAST(1.0, CASE WHEN n_tokens > 0
           THEN 0.5 + 0.5 * LEAST(1.0, n_tokens / 100.0) -
                (CASE WHEN n_len > 0
                 THEN CAST(n_punct AS DOUBLE) / n_len ELSE 0.0 END)
           ELSE 0.0 END)) AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS quality_score
       FROM m ORDER BY doc_id"""

  /** Dataset card — the per-(lang, source) statistical summary every
    * released training corpus ships (datasheets/data-statements
    * practice): document and token volume, how much of the slice is
    * corpus-wide redundant (non-keeper fingerprint duplicates — the
    * dedup attribution a curation report needs per source, not
    * globally), and the slice's quality mass (3-dp scores summed in
    * DECIMAL so the fold is order-independent on both engines). One
    * scan for metrics + one fingerprint groupBy + one group-keyed
    * aggregation — every piece map-side combinable; the card itself
    * is O(|lang|×|source|) rows no matter the corpus size. */
  def ppDataCard(s: SparkSession, dir: String): DataFrame = {
    // NULL text normalizes to '' up front so no row can fall out of
    // the card through a NULL fingerprint's never-matching join —
    // a dataset card that undercounts documents is worse than none
    val d = t(s, dir, "documents")
      .withColumn("text", coalesce(col("text"), lit("")))
    val q = TextAnalysis.qualityMetrics(d, "text")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val fp = d.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val dup = fp.join(
        fp.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper")),
        Seq("fp"))
      .select(col("doc_id"), (col("doc_id") =!= col("keeper"))
        .as("is_dup"))
    d.select(col("doc_id"), col("lang"), col("source"))
      .join(q, Seq("doc_id")).join(dup, Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("quality_score").cast("decimal(10,3)"))
          .cast("double").as("sum_quality"))
      .orderBy(col("lang"), col("source"))
  }

  private lazy val ppDataCardSql =
    """WITH src AS (
         SELECT doc_id, lang, source, COALESCE(text, '') AS text
         FROM documents),
       m AS (
         SELECT doc_id, lang, source,
           len(list_filter(string_split_regex(lower(text), '\W+'),
                           x -> x <> '')) AS n_tokens,
           length(regexp_replace(lower(text),
             '[a-z0-9 \t\n\x0B\f\r]', '', 'g')) AS n_punct,
           length(text) AS n_len
         FROM src),
       q AS (
         SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(GREATEST(0.0, LEAST(1.0,
             CASE WHEN n_tokens > 0
               THEN 0.5 + 0.5 * LEAST(1.0, n_tokens / 100.0) -
                    (CASE WHEN n_len > 0
                     THEN CAST(n_punct AS DOUBLE) / n_len ELSE 0.0 END)
               ELSE 0.0 END)) AS DECIMAL(28,10)), 3) AS DOUBLE)
             AS quality_score
         FROM m),
       fp AS (
         SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp
         FROM src),
       dup AS (
         SELECT f.doc_id, f.doc_id <> k.keeper AS is_dup
         FROM fp f JOIN (SELECT fp, MIN(doc_id) AS keeper
                         FROM fp GROUP BY fp) k ON f.fp = k.fp)
       SELECT q.lang, q.source, COUNT(*) AS n_docs,
         CAST(SUM(q.n_tokens) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) FILTER (WHERE d.is_dup) AS BIGINT) AS n_dup_docs,
         CAST(SUM(CAST(q.quality_score AS DECIMAL(10,3))) AS DOUBLE)
           AS sum_quality
       FROM q JOIN dup d ON q.doc_id = d.doc_id
       GROUP BY q.lang, q.source ORDER BY q.lang, q.source"""

  /** Weak-supervision labels ([[TextAnalysis.weakLabels]]): three
    * integer-exact labeling functions (length, stopword ratio,
    * repetition) voting keep/abstain/drop per document, with
    * coverage and conflict flags. The oracle replays every LF
    * threshold as the same integer cross-multiplications. */
  def ppWeakLabels(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.weakLabels(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  private val ppWeakLabelsSql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       gc AS (
         SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(DISTINCT gram) AS n_distinct
         FROM g GROUP BY doc_id),
       base AS (
         SELECT t.doc_id, len(t.tk) AS n_tok,
           len(list_filter(t.tk,
             x -> list_contains(['the','a','and','of','to'], x)))
             AS n_stop,
           COALESCE(gc.n_grams, 0) AS n_grams,
           COALESCE(gc.n_distinct, 0) AS n_distinct
         FROM toks t LEFT JOIN gc ON gc.doc_id = t.doc_id),
       lf AS (
         SELECT doc_id,
           CASE WHEN n_tok >= 60 THEN 1
                WHEN n_tok < 20 THEN -1 ELSE 0 END AS lf_len,
           CASE WHEN n_stop * 5 >= n_tok AND n_tok > 0 THEN 1
                WHEN n_stop = 0 AND n_tok > 0 THEN -1
                ELSE 0 END AS lf_stop,
           CASE WHEN n_grams > 0
                  AND (n_grams - n_distinct) * 5 <= n_grams THEN 1
                WHEN n_grams > 0
                  AND (n_grams - n_distinct) * 2 > n_grams THEN -1
                ELSE 0 END AS lf_rep
         FROM base)
       SELECT doc_id, lf_len, lf_stop, lf_rep,
         (CASE WHEN lf_len <> 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_stop <> 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_rep <> 0 THEN 1 ELSE 0 END) AS n_voting,
         (GREATEST(lf_len, lf_stop, lf_rep) = 1
          AND LEAST(lf_len, lf_stop, lf_rep) = -1) AS conflict,
         CASE WHEN lf_len + lf_stop + lf_rep > 0 THEN 'keep'
              WHEN lf_len + lf_stop + lf_rep < 0 THEN 'drop'
              ELSE 'abstain' END AS weak_label
       FROM lf ORDER BY doc_id"""

  /** Curriculum staging ([[Sampling.curriculumStages]]): every doc
    * assigned to a token-length quartile stage via broadcast exact
    * percentile thresholds — scan-local assignment, no global sort.
    * The oracle replays the identical thresholds and the
    * strictly-above boundary rule. */
  def ppCurriculum(s: SparkSession, dir: String): DataFrame =
    Sampling.curriculumStages(t(s, dir, "documents"), "text", "doc_id",
      nStages = 4)
      .orderBy(col("doc_id"))

  private val ppCurriculumSql =
    """WITH t AS (
         SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT) AS n_tokens
         FROM documents),
       th AS (
         SELECT quantile_cont(n_tokens, 0.25) AS t1,
           quantile_cont(n_tokens, 0.5) AS t2,
           quantile_cont(n_tokens, 0.75) AS t3
         FROM t)
       SELECT doc_id, n_tokens,
         1 + CAST(n_tokens > t1 AS INTEGER)
           + CAST(n_tokens > t2 AS INTEGER)
           + CAST(n_tokens > t3 AS INTEGER) AS stage
       FROM t CROSS JOIN th ORDER BY doc_id"""

  /** Token counting three ways: whitespace, regex word, BPE-ish. */
  def taTokens(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws_tokens"),
        size(TextAnalysis.tokens(col("text"))).cast("long")
          .as("word_tokens"),
        TextAnalysis.approxBpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  private val taTokensSql =
    """SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text),
                     '[ \t\n\x0B\f\r]+')) END AS BIGINT)
         AS ws_tokens,
       CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
                            x -> x <> '')) AS BIGINT) AS word_tokens,
       CAST(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]')) AS BIGINT)
         AS bpe_tokens
       FROM documents ORDER BY doc_id"""

  /** Gopher-style within-document repetition signal: duplicate 3-gram
    * fraction, computed entirely scan-local (array expressions on the
    * row — no explode, no shuffle). */
  def taRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(s, dir, "documents"), "text", n = 3)
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        col("dup_fraction"))
      .orderBy(col("doc_id"))

  private val taRepetitionSql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       agg AS (
         SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(DISTINCT gram) AS n_distinct
         FROM g GROUP BY doc_id)
       SELECT d.doc_id,
         CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
         CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
         CAST(ROUND(CAST(CASE WHEN COALESCE(a.n_grams, 0) > 0
           THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_grams
           ELSE 0.0 END AS DECIMAL(28,10)), 3) AS DOUBLE) AS dup_fraction
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       ORDER BY d.doc_id"""

  /** The repetition signal via the native codegen'd [[graft.functions
    * .GramStats]] expression: one streamed pass per row (hash-set
    * distinct inside the generated loop) replacing the gram-array +
    * array_distinct materialization of [[taRepetition]] — verified
    * against the SAME oracle, proving the kernel equivalent to the
    * relational form. Null texts yield 0 counts like the relational
    * path. */
  def taRepetitionExpr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.gram_stats(col("text"), 3).as("g"))
      .select(col("doc_id"),
        coalesce(col("g.n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("g.n_distinct"), lit(0L)).as("n_distinct"))
      .withColumn("dup_fraction",
        round(when(col("n_grams") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
          .otherwise(0.0)
          .cast(org.apache.spark.sql.types.DecimalType(28, 10)), 3)
          .cast("double"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-frequency heavy hitters via count-min sketch + lossless
    * exact verify ([[TextAnalysis.heavyHitters]]): every bigram whose
    * corpus count clears the φ·N bar (φ = 1/800). The sketch is a
    * scan-side prefilter that never underestimates, so the oracle is
    * the plain exact-count SQL — the hash match proves the sketch
    * path lossless (the dd_contamination_bloom pattern). */
  def taHeavyHitters(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyHitters(t(s, dir, "documents"), "text",
      n = 2, phiDenom = 800L)

  private val taHeavyHittersSql =
    """WITH toks AS (
         SELECT list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT tk[i+1] || ' ' || tk[i+2] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       tot AS (SELECT COUNT(*) AS ntot FROM g),
       c AS (SELECT gram, COUNT(*) AS n FROM g GROUP BY gram)
       SELECT gram, n FROM c
       WHERE n >= (SELECT (ntot + 799) // 800 FROM tot)
       ORDER BY n DESC, gram"""

  /** Heavy hitters with the sketch maintained INCREMENTALLY
    * ([[TextAnalysis.heavyHittersIncremental]]): three corpus slices
    * contribute per-slice cell relations, cell-wise summed before the
    * exact verify. Count-min cells are sums ⇒ the merged sketch is
    * bit-identical to the one-shot build — gated against
    * [[taHeavyHittersSql]] VERBATIM (the ann_ivf_incremental proof
    * pattern). */
  def taHeavyHittersIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TextAnalysis.heavyHittersIncremental(
      Seq(d.filter(col("doc_id") % 3 === 0),
        d.filter(col("doc_id") % 3 === 1),
        d.filter(col("doc_id") % 3 === 2)),
      d, "text", n = 2, phiDenom = 800L)
  }

  /** Deterministic shard writer + manifest ([[Sharding]]): documents
    * written as a `shard=`-partitioned layout, manifest computed from
    * the READ-BACK files. The oracle replays the assignment and every
    * manifest aggregate straight off the source table — the hash
    * match proves the written layout is exactly the source, row for
    * row and byte for byte (md5 fingerprints). */
  def ppShardManifest(s: SparkSession, dir: String): DataFrame = {
    val out = layoutDir(dir, "documents", "shards8")
    ensureLayout(out)(Sharding.writeSharded(
      t(s, dir, "documents"), "doc_id", out, nShards = 8))
    Sharding.manifest(s, out, "doc_id", "text")
  }

  private val ppShardManifestSql =
    """WITH tk AS (
         SELECT CAST(doc_id % 8 AS INTEGER) AS shard, doc_id, text,
           len(list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '')) AS nt
         FROM documents)
       SELECT shard, COUNT(*) AS n_docs,
         CAST(SUM(nt) AS BIGINT) AS n_tokens,
         MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5,
         CAST(SUM(doc_id) AS BIGINT) AS sum_key
       FROM tk GROUP BY shard ORDER BY shard"""

  /** Heavy hitters over the STREAMED at-rest sketch
    * ([[graft.streaming.CmsStream]]): three batch appends write their
    * own `cells/batch=` partitions (KBs each — the code path
    * `CmsStream.run` drives per micro-batch), and the probe merges
    * them cell-wise before the exact verify. Gated against
    * [[taHeavyHittersSql]] VERBATIM, like the sibling incremental
    * gate — the streamed sketch must be bit-identical to the
    * one-shot build. */
  def taHeavyHittersAtRest(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "cms_d3_w1024")
    ensureLayout(s"$root/cells/batch=0")(
      graft.streaming.CmsStream.appendBatch(
        d.filter(col("doc_id") % 3 === 0), 0L, root, "text",
        n = 2, depth = 3, width = 1024))
    ensureLayout(s"$root/cells/batch=1")(
      graft.streaming.CmsStream.appendBatch(
        d.filter(col("doc_id") % 3 === 1), 1L, root, "text",
        n = 2, depth = 3, width = 1024))
    ensureLayout(s"$root/cells/batch=2")(
      graft.streaming.CmsStream.appendBatch(
        d.filter(col("doc_id") % 3 === 2), 2L, root, "text",
        n = 2, depth = 3, width = 1024))
    TextAnalysis.heavyHittersFromCells(d, "text",
      graft.streaming.CmsStream.cells(s, root),
      n = 2, phiDenom = 800L, depth = 3, width = 1024)
  }

  /** PSI drift report ([[TextAnalysis.distributionDrift]]): n_chars
    * bucketed into ten 100-wide bins, source `src0` as the baseline
    * slice vs the rest. The oracle replays the bucketing, the
    * Laplace-smoothed fractions and the ln-term arithmetic. */
  def ppDriftPsi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.distributionDrift(t(s, dir, "documents"), "n_chars",
      col("source") === "src0", bucketWidth = 100L, nBuckets = 10)

  /** The PSI monitor INCREMENTALLY maintained
    * ([[graft.streaming.DriftStream]]): the baseline slice's bucket
    * counts persisted once, the rest of the corpus arriving as two
    * streamed batches — bucket counts are plain sums, so the streamed
    * report is bit-identical to the inline two-slice monitor, gated
    * against [[ppDriftPsiSql]] VERBATIM. */
  def ppDriftIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "drift_w100_b10")
    ensureLayout(root) {
      graft.streaming.DriftStream.writeBaseline(
        d.filter(col("source") === "src0"), "n_chars", root,
        bucketWidth = 100L, nBuckets = 10)
      // coalesce: NULL-source docs belong to the streamed (non-base)
      // slice — a bare =!= would drop them while the shared oracle
      // counts them as n_new
      graft.streaming.DriftStream.appendBatch(
        d.filter(coalesce(col("source"), lit("")) =!= "src0" &&
          col("doc_id") % 2 === 0),
        1L, root, "n_chars")
      graft.streaming.DriftStream.appendBatch(
        d.filter(coalesce(col("source"), lit("")) =!= "src0" &&
          col("doc_id") % 2 === 1),
        2L, root, "n_chars")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    graft.streaming.DriftStream.report(s, root)
  }

  private val ppDriftPsiSql =
    """WITH b AS (
         SELECT CAST(GREATEST(
             LEAST(FLOOR(CAST(n_chars AS DOUBLE) / 100), 9), 0)
             AS INTEGER) AS bucket,
           (source = 'src0') AS is_base
         FROM documents),
       c0 AS (
         SELECT bucket,
           CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT)
             AS n_base,
           CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT)
             AS n_new
         FROM b GROUP BY bucket),
       c AS (
         SELECT CAST(g.range AS INTEGER) AS bucket,
           COALESCE(c0.n_base, CAST(0 AS BIGINT)) AS n_base,
           COALESCE(c0.n_new, CAST(0 AS BIGINT)) AS n_new
         FROM range(0, 10) g LEFT JOIN c0 ON g.range = c0.bucket),
       t AS (SELECT SUM(n_base) AS t_base, SUM(n_new) AS t_new FROM c),
       f AS (
         SELECT c.bucket, c.n_base, c.n_new,
           (c.n_base + CAST(1.0 AS DOUBLE)) /
             (t.t_base + CAST(10.0 AS DOUBLE)) AS p,
           (c.n_new + CAST(1.0 AS DOUBLE)) /
             (t.t_new + CAST(10.0 AS DOUBLE)) AS q
         FROM c CROSS JOIN t)
       SELECT bucket, n_base, n_new,
         CAST(ROUND(CAST((p - q) * ln(p / q) AS DECIMAL(28,10)), 6)
           AS DOUBLE) AS psi_term
       FROM f ORDER BY bucket"""

  /** Embedding-centroid drift ([[TextAnalysis.embeddingDrift]]):
    * cosine between the even- and odd-id slices' summed embedding
    * vectors — the representation-space drift statistic next to the
    * scalar PSI. The oracle replays the positional decimal-routed
    * sums, the double products and the decimal-routed reductions. */
  def ppEmbeddingDrift(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.embeddingDrift(t(s, dir, "embeddings"), "embedding",
      col("vec_id") % 2 === 0)

  private val ppEmbeddingDriftSql =
    """WITH e AS (
         SELECT (vec_id % 2 = 0) AS is_base, embedding
         FROM embeddings),
       pos AS (
         SELECT e.is_base, i,
           CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(28,10)) AS xd
         FROM e CROSS JOIN unnest(range(len(embedding))) r(i)),
       sums AS (
         SELECT i,
           CAST(SUM(CASE WHEN is_base THEN xd
                    ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE) AS sb,
           CAST(SUM(CASE WHEN NOT is_base THEN xd
                    ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE) AS sn,
           SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS n_base,
           SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS n_new
         FROM pos GROUP BY i),
       red AS (
         SELECT MAX(n_base) AS n_base, MAX(n_new) AS n_new,
           SUM(CAST(sb * sn AS DECIMAL(38,10))) AS dot,
           SUM(CAST(sb * sb AS DECIMAL(38,10))) AS nb2,
           SUM(CAST(sn * sn AS DECIMAL(38,10))) AS nn2
         FROM sums)
       SELECT CAST(n_base AS BIGINT) AS n_base,
         CAST(n_new AS BIGINT) AS n_new,
         CAST(ROUND(CAST(CAST(dot AS DOUBLE) /
           (sqrt(CAST(nb2 AS DOUBLE)) * sqrt(CAST(nn2 AS DOUBLE)))
           AS DECIMAL(28,10)), 6) AS DOUBLE) AS cos_sim
       FROM red"""

  /** T5-style span corruption ([[TextAnalysis.spanCorruption]]):
    * deterministic md5-gated token masking, gaps-and-islands span
    * grouping, sentinel-numbered input/target pair per document. The
    * oracle replays the hash gate, the lag/running-sum windows and
    * the ordered string assembly end to end. */
  def ppSpanCorruption(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.spanCorruption(t(s, dir, "documents"), "text",
      "doc_id")

  private val ppSpanCorruptionSql =
    """WITH t AS (
         SELECT doc_id, list_filter(
           string_split_regex(lower(text), '\W+'),
           x -> x <> '') AS tk
         FROM documents),
       toks AS (
         SELECT doc_id, CAST(i AS INTEGER) AS pos, tk[i+1] AS word,
           substr(md5(doc_id || ':' || i), 1, 1)
             IN ('0','1','2') AS masked
         FROM t CROSS JOIN unnest(range(len(tk))) AS r(i)),
       flags AS (
         SELECT *, masked AND NOT lag(masked, 1, false)
             OVER (PARTITION BY doc_id ORDER BY pos) AS is_start
         FROM toks),
       ks AS (
         SELECT *, SUM(CASE WHEN is_start THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - 1 AS k
         FROM flags),
       em AS (
         SELECT doc_id, pos, masked, is_start,
           CASE WHEN NOT masked THEN [word]
                WHEN is_start THEN ['<X' || k || '>']
                ELSE [] END AS inp_toks,
           CASE WHEN is_start THEN ['<X' || k || '>', word]
                WHEN masked THEN [word]
                ELSE [] END AS tgt_toks
         FROM ks)
       SELECT doc_id,
         COALESCE(array_to_string(
           flatten(list(inp_toks ORDER BY pos)), ' '), '')
           AS input_text,
         COALESCE(array_to_string(
           flatten(list(tgt_toks ORDER BY pos)), ' '), '')
           AS target_text,
         CAST(SUM(CASE WHEN is_start THEN 1 ELSE 0 END) AS BIGINT)
           AS n_spans,
         CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
           AS n_masked
       FROM em GROUP BY doc_id ORDER BY doc_id"""

  /** The full curate → dedup → budget → shard chain in ONE gate —
    * the flagship composition proving the pipeline stages snap
    * together: quality floor (chars + tokens), exact-dedup keepers,
    * per-language token-budget selection in deterministic md5 order
    * ([[Sampling.budgetSelect]]), then the per-(lang, shard) manifest
    * of exactly what a [[Sharding]] write of the selection would
    * hold. Every stage reuses a gated operator's exact semantics;
    * the oracle chains their SQL idioms verbatim. Plan: three
    * scan-local filters, one hash-partitioned window per dedup/
    * budget stage, one manifest aggregate — nothing corpus-quadratic
    * anywhere. */
  def ppCurateShardE2e(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val quality = d.filter(col("n_chars") >= 100)
      .filter(TextAnalysis.whitespaceTokenCount(col("text")) >= 20)
    val kept = Dedup.exactRank(quality, "text", "doc_id")
      .filter(col("dup_rank") === 1)
      .drop("text_hash", "dup_rank")
    Sampling.budgetSelect(kept, "text", "doc_id", "lang",
        budget = 2000L)
      .withColumn("shard", pmod(col("doc_id"), lit(4L)).cast("int"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(md5(col("text"))).as("min_md5"),
        max(md5(col("text"))).as("max_md5"),
        sum(col("doc_id")).as("sum_key"))
      .orderBy(col("lang"), col("shard"))
  }

  private val ppCurateShardE2eSql =
    """WITH q AS (
         SELECT doc_id, text, lang,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT)
             AS n_tokens
         FROM documents WHERE n_chars >= 100),
       q2 AS (SELECT * FROM q WHERE n_tokens >= 20),
       dd AS (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
           ORDER BY doc_id) AS dup_rank
         FROM q2),
       kept AS (SELECT doc_id, text, lang, n_tokens FROM dd
                WHERE dup_rank = 1),
       sel AS (
         SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_tokens
         FROM kept),
       fin AS (SELECT * FROM sel WHERE cum_tokens <= 2000)
       SELECT lang, CAST(doc_id % 4 AS INTEGER) AS shard,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5,
         CAST(SUM(doc_id) AS BIGINT) AS sum_key
       FROM fin GROUP BY lang, shard ORDER BY lang, shard"""

  /** Incrementally-maintained sharded layout
    * ([[Sharding.appendBatch]]/[[Sharding.manifestIncremental]]): a
    * base write over a third of the corpus plus two batch appends,
    * manifest computed over base ∪ deltas. Every manifest field is a
    * sum/count/min/max, so the result is bit-identical to a full
    * rebuild — gated against [[ppShardManifestSql]] VERBATIM. */
  def ppShardUpdated(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "shards8_incr")
    ensureLayout(s"$root/base")(Sharding.writeShardedBase(
      d.filter(col("doc_id") % 3 === 0), "doc_id", root,
      nShards = 8))
    ensureLayout(s"$root/delta/batch=1")(Sharding.appendBatch(
      d.filter(col("doc_id") % 3 === 1), 1L, root, "doc_id",
      nShards = 8))
    ensureLayout(s"$root/delta/batch=2")(Sharding.appendBatch(
      d.filter(col("doc_id") % 3 === 2), 2L, root, "doc_id",
      nShards = 8))
    Sharding.manifestIncremental(s, root, "doc_id", "text")
  }

  /** Distributed BPE merge training ([[TextAnalysis.bpeMerges]]) —
    * 8 merge rounds over the documents vocabulary. The oracle unrolls
    * all 8 rounds as CTE chains (pair counting, winner pick with the
    * count-then-lexicographic tie-break, delimiter-wrapped replace),
    * proving every round's winner AND the greedy merge application
    * engine-neutral. */
  def ppBpeTrain(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMerges(t(s, dir, "documents"), "text", rounds = 8)
      .orderBy(col("round"))

  /** Subword segmentation with the trained merges
    * ([[TextAnalysis.bpeSegment]]): the 8 learned merges replayed in
    * training order over the distinct-word vocabulary. */
  def ppBpeApply(s: SparkSession, dir: String): DataFrame = {
    val m = TextAnalysis.bpeMerges(t(s, dir, "documents"), "text",
        rounds = 8)
      .orderBy(col("round"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    TextAnalysis.bpeSegment(t(s, dir, "documents"), "text", m)
  }

  private val bpeRounds = 8

  /** The shared BPE CTE chain: w0 (character-split vocabulary) and,
    * per round r, p_r (pair counts) → m_r (winner) → w_r (merged). */
  private lazy val bpeCtes: String = {
    val head =
      """WITH wc AS (
           SELECT gram AS word, COUNT(*) AS cnt FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '\W+'),
               x -> x <> '')) AS gram
             FROM documents) GROUP BY 1),
         w0 AS MATERIALIZED (
           SELECT word, cnt,
             regexp_replace(word, '(.)', '/\1/', 'g') AS s
           FROM wc)"""
    val rounds = (1 to bpeRounds).map { r =>
      val prev = s"w${r - 1}"
      s""",
         p$r AS MATERIALIZED (
           SELECT sym[i+1] AS a, sym[i+2] AS b, SUM(cnt) AS c
           FROM (SELECT cnt, string_split(trim(s, '/'), '//') AS sym
                 FROM $prev)
             CROSS JOIN unnest(range(len(sym) - 1)) AS r(i)
           GROUP BY 1, 2),
         m$r AS MATERIALIZED (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         w$r AS MATERIALIZED (
           SELECT word, cnt,
             replace(s,
               '/' || (SELECT a FROM m$r) || '//' ||
                 (SELECT b FROM m$r) || '/',
               '/' || (SELECT a FROM m$r) ||
                 (SELECT b FROM m$r) || '/') AS s
           FROM $prev)"""
    }.mkString
    head + rounds
  }

  private lazy val ppBpeTrainSql = {
    val roundsSel = (1 to bpeRounds).map { r =>
      s"""SELECT $r AS round, a AS lhs, b AS rhs, a || b AS merged,
            CAST(c AS BIGINT) AS pair_count FROM m$r"""
    }.mkString(" UNION ALL ")
    s"""$bpeCtes
       SELECT * FROM ($roundsSel) ORDER BY round"""
  }

  private lazy val ppBpeApplySql = {
    val seg = (1 to bpeRounds).foldLeft(
      "regexp_replace(word, '(.)', '/\\1/', 'g')") {
      case (acc, r) =>
        s"""replace($acc,
             '/' || (SELECT a FROM m$r) || '//' ||
               (SELECT b FROM m$r) || '/',
             '/' || (SELECT a FROM m$r) ||
               (SELECT b FROM m$r) || '/')"""
    }
    s"""$bpeCtes,
       words AS (SELECT DISTINCT word FROM wc),
       seg AS (SELECT word, $seg AS s FROM words)
       SELECT word,
         array_to_string(string_split(trim(s, '/'), '//'), ' ') AS pieces,
         CAST(len(string_split(trim(s, '/'), '//')) AS BIGINT) AS n_pieces
       FROM seg ORDER BY word"""
  }

  /** Corpus-scale BPE tokenization ([[TextAnalysis.bpeTokenize]]):
    * per-document word and BPE-token counts under the 8 trained
    * merges — the broadcast-vocabulary apply at occurrence scale.
    * The oracle chains the full training replay into the
    * segmentation join. */
  def ppBpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val m = TextAnalysis.bpeMerges(t(s, dir, "documents"), "text",
        rounds = 8)
      .orderBy(col("round"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    TextAnalysis.bpeTokenize(t(s, dir, "documents"), "text", "doc_id", m)
  }

  private lazy val ppBpeTokenizeSql = {
    val seg = (1 to bpeRounds).foldLeft(
      "regexp_replace(word, '(.)', '/\\1/', 'g')") {
      case (acc, r) =>
        s"""replace($acc,
             '/' || (SELECT a FROM m$r) || '//' ||
               (SELECT b FROM m$r) || '/',
             '/' || (SELECT a FROM m$r) ||
               (SELECT b FROM m$r) || '/')"""
    }
    s"""$bpeCtes,
       words AS (SELECT DISTINCT word FROM wc),
       seg AS (SELECT word,
         len(string_split(trim($seg, '/'), '//')) AS n_pieces
         FROM words),
       occ AS (
         SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '\\W+'),
           x -> x <> '')) AS word
         FROM documents)
       SELECT o.doc_id, COUNT(*) AS n_words,
         CAST(SUM(s.n_pieces) AS BIGINT) AS n_bpe_tokens
       FROM occ o JOIN seg s ON s.word = o.word
       GROUP BY o.doc_id ORDER BY o.doc_id"""
  }

  /** [[ppBpeTrain]]'s production-scale twin
    * ([[TextAnalysis.bpeMergesFast]]): ONE distributed shuffle to the
    * distinct-word table, then driver-local delta-updated pair counts
    * — per-round cost tracks the merge's footprint instead of a full
    * Spark job per round. Gated against [[ppBpeTrainSql]] VERBATIM:
    * same 8 winners, counts, tie-breaks. */
  def ppBpeTrainFast(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMergesFast(t(s, dir, "documents"), "text",
      rounds = 8).orderBy(col("round"))

  /** [[ppBpeApply]]'s production-scale twin: merges trained by the
    * delta trainer, segmentation by the broadcast merge-rank greedy
    * ([[TextAnalysis.bpeSegmentFast]]) — no replace chain anywhere,
    * so nothing grows with the merge count. Same oracle verbatim. */
  def ppBpeApplyFast(s: SparkSession, dir: String): DataFrame = {
    val m = TextAnalysis.bpeMergesFast(t(s, dir, "documents"), "text",
        rounds = 8)
      .orderBy(col("round"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    TextAnalysis.bpeSegmentFast(t(s, dir, "documents"), "text", m)
  }

  /** [[ppBpeTokenize]]'s production-scale twin — fast trainer + fast
    * segmenter at occurrence scale, same oracle verbatim. */
  def ppBpeTokenizeFast(s: SparkSession, dir: String): DataFrame = {
    val m = TextAnalysis.bpeMergesFast(t(s, dir, "documents"), "text",
        rounds = 8)
      .orderBy(col("round"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    TextAnalysis.bpeTokenizeFast(t(s, dir, "documents"), "text",
      "doc_id", m)
  }

  /** The at-rest BPE model store shared by the `_at_rest` apply /
    * tokenize gates: train once ([[TextAnalysis.writeBpeModel]],
    * minCount=1 so the merges are EXACTLY the distributed trainer's,
    * which the shared oracle replays), read back the model-sized
    * ordered merge list for every probe. */
  private def bpeStoredMerges(s: SparkSession, dir: String)
      : Seq[(String, String)] = {
    // _mv suffix: the params row grew a max_vocab stamp in round 16
    // (content-change rule — an old cache lacks the column)
    val root = layoutDir(dir, "documents", "bpe_r8_c1_mv")
    ensureLayout(root) {
      TextAnalysis.writeBpeModel(t(s, dir, "documents"), "text",
        rounds = 8, minCount = 1L, root)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    TextAnalysis.readBpeModel(s, root, expectRounds = Some(8),
      expectMinCount = Some(1L),
      expectMaxVocab = Some(Int.MaxValue))
  }

  /** [[ppBpeApply]] with the merges read from the at-rest store —
    * training paid once; apply reads the model-sized merge list and
    * segments scan-local. Shares [[ppBpeApplySql]] VERBATIM
    * (lossless-store proof: the persisted ordered merges reproduce
    * the inline segmentation bit-for-bit). */
  def ppBpeApplyAtRest(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeSegmentFast(t(s, dir, "documents"), "text",
      bpeStoredMerges(s, dir))

  /** [[ppBpeTokenize]] off the at-rest model store — the
    * occurrence-scale twin of [[ppBpeApplyAtRest]], same oracle
    * verbatim. */
  def ppBpeTokenizeAtRest(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTokenizeFast(t(s, dir, "documents"), "text",
      "doc_id", bpeStoredMerges(s, dir))

  /** Tokenizer fertility report — tokens-per-word per language, the
    * number every vocab-size decision is made on (a language whose
    * fertility blows up under a shared vocabulary is being
    * under-served by it; production teams track this per release).
    * Composes the AT-REST tokenize path (stored merges, fast
    * segmenter) and rolls up per language: docs with ≥1 word, word
    * and piece volumes as exact longs, fertility = Σpieces/Σwords
    * 6-dp-rounded. O(langs) output rows. */
  def taTokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val tok = ppBpeTokenizeAtRest(s, dir)
    tok.join(t(s, dir, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        round((col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(20, 10)), 6)
          .cast("double").as("fertility"))
      .orderBy(col("lang"))
  }

  private lazy val taTokenizerFertilitySql =
    s"""WITH tok AS (SELECT * FROM ($ppBpeTokenizeSql) q)
       SELECT d.lang, COUNT(*) AS n_docs,
         CAST(SUM(t.n_words) AS BIGINT) AS n_words,
         CAST(SUM(t.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
         CAST(ROUND(CAST(CAST(SUM(t.n_bpe_tokens) AS DOUBLE) /
             CAST(SUM(t.n_words) AS DOUBLE) AS DECIMAL(20,10)), 6)
           AS DOUBLE) AS fertility
       FROM tok t JOIN documents d ON d.doc_id = t.doc_id
       GROUP BY d.lang ORDER BY d.lang"""

  // ---------------------------------------------------------------
  // Unigram-LM tokenizer gates ([[TextAnalysis.unigramTrain]] /
  // unigramSegment): the oracle replays the ENTIRE trainer — the
  // substring-count seeding, every hard-EM round's Viterbi DP
  // (unrolled position by position up to ugMaxWord, the pp_bpe_train
  // unrolling pattern), the backward path walk, the occurrence-
  // weighted recount with the char floor, and the 6-dp decimal cost
  // quantization — so the train gate hash-proves each round's counts
  // AND costs, and the apply gate the segmentation itself,
  // engine-neutral. MATERIALIZED is load-bearing throughout (each DP
  // stage references the previous; DuckDB would inline the chain
  // exponentially — the pp_bpe_train lesson).
  // ---------------------------------------------------------------

  private val ugRounds = 2
  private val ugMaxPiece = 4
  private val ugMaxWord = 12 // oracle DP unroll; corpus max word = 8
  private val ugMinCount = 3

  /** The oracle's Viterbi/MaxMatch DP is unrolled to exactly
    * [[ugMaxWord]] positions — a corpus word longer than that makes
    * the ORACLE emit truncated walks while the engine segments
    * correctly, surfacing as an opaque hash red. Embed the contract
    * in the gate plan (no extra action: evaluated during the pass
    * that tokenizes anyway) so a violation fails pointedly instead. */
  private[graft] def ugChecked(docs: DataFrame): DataFrame = {
    val maxLen = array_max(transform(
      filter(split(lower(col("text")), "\\W+"), w => w =!= ""),
      w => length(w)))
    docs.withColumn("text",
      when(coalesce(maxLen, lit(0)) <= ugMaxWord, col("text"))
        .otherwise(raise_error(concat(
          lit(s"unigram gates: corpus word longer than the oracle " +
            s"DP unroll ugMaxWord=$ugMaxWord in document "),
          col("doc_id").cast("string"),
          lit(" — raise ugMaxWord (or derive it from the corpus)")))))
  }

  /** Quantized -log-prob cost table over vocabulary `vTab`:
    * `$name` = (piece, cnt, cost DECIMAL(20,6)). */
  private def ugCostCte(name: String, vTab: String): String =
    s"""$name AS MATERIALIZED (
         SELECT piece, cnt,
           CAST(ROUND(CAST(ln(CAST(t.total AS DOUBLE) /
                              CAST(v.cnt AS DOUBLE))
             AS DECIMAL(20,10)), 6) AS DECIMAL(20,6)) AS cost
         FROM $vTab v CROSS JOIN
           (SELECT SUM(cnt) AS total FROM $vTab) t)"""

  /** One full Viterbi pass over `wc` under cost table `cTab`: the
    * forward DP (one CTE per position; candidates per last-piece
    * length unioned and the lexicographic (cost, k, s) minimum kept
    * via QUALIFY) and the backward path walk (one CTE per step,
    * prepending the chosen last piece). Emits `${pfx}seg` =
    * (word, pieces). */
  private def ugViterbiCtes(pfx: String, cTab: String): String = {
    val d0 =
      s"""${pfx}d0 AS MATERIALIZED (
           SELECT word, 0 AS p, CAST(0 AS DECIMAL(24,6)) AS cost,
             0 AS k, 0 AS s
           FROM wc)"""
    val dps = (1 to ugMaxWord).map { p =>
      val branches = (1 to math.min(p, ugMaxPiece)).map { s =>
        s"""SELECT d.word, $p AS p,
              CAST(d.cost + c.cost AS DECIMAL(24,6)) AS cost,
              d.k + 1 AS k, $s AS s
            FROM ${pfx}d${p - s} d JOIN $cTab c
              ON c.piece = substr(d.word, ${p - s + 1}, $s)
            WHERE length(d.word) >= $p"""
      }.mkString(" UNION ALL ")
      s""",
         ${pfx}d$p AS MATERIALIZED (
           SELECT word, p, cost, k, s FROM ($branches) z
           QUALIFY ROW_NUMBER() OVER (PARTITION BY word
             ORDER BY cost, k, s) = 1)"""
    }.mkString
    val dall = s""",
         ${pfx}dall AS MATERIALIZED (${(1 to ugMaxWord)
      .map(p => s"SELECT * FROM ${pfx}d$p").mkString(" UNION ALL ")})"""
    val w0 = s""",
         ${pfx}w0 AS MATERIALIZED (
           SELECT word, length(word) AS pos, '' AS pieces FROM wc)"""
    val walks = (1 to ugMaxWord).map { j =>
      s""",
         ${pfx}w$j AS MATERIALIZED (
           SELECT w.word,
             CASE WHEN w.pos = 0 THEN 0 ELSE w.pos - d.s END AS pos,
             CASE WHEN w.pos = 0 THEN w.pieces
                  ELSE substr(w.word, w.pos - d.s + 1, d.s) ||
                    (CASE WHEN w.pieces = '' THEN ''
                          ELSE ' ' END) || w.pieces END AS pieces
           FROM ${pfx}w${j - 1} w
           LEFT JOIN ${pfx}dall d
             ON d.word = w.word AND d.p = w.pos)"""
    }.mkString
    val seg = s""",
         ${pfx}seg AS MATERIALIZED (
           SELECT word, pieces FROM ${pfx}w$ugMaxWord)"""
    d0 + dps + dall + w0 + walks + seg
  }

  /** Occurrence-weighted recount off a segmentation pass, with the
    * char floor: `$vNew` = (piece, cnt) — Viterbi-counted pieces,
    * plus count-1 rows for `$vPrev`'s single characters that won no
    * mass (pruning by absence for everything else). */
  private def ugRecountCte(vNew: String, segTab: String,
      vPrev: String): String =
    s"""${vNew}raw AS MATERIALIZED (
         SELECT piece, SUM(cnt) AS cnt FROM (
           SELECT wc.cnt,
             unnest(string_split(s.pieces, ' ')) AS piece
           FROM $segTab s JOIN wc USING (word)) z
         GROUP BY piece),
       $vNew AS MATERIALIZED (
         SELECT piece, cnt FROM ${vNew}raw
         UNION ALL
         SELECT v.piece, 1 AS cnt FROM $vPrev v
         WHERE length(v.piece) = 1
           AND v.piece NOT IN (SELECT piece FROM ${vNew}raw))"""

  /** The shared trainer chain: wc → v0 (substring seeding) → per EM
    * round r: c(r-1) costs → Viterbi pass → vr recount; ends at
    * `c$ugRounds`, the final (piece, cnt, cost) model. */
  private lazy val ugCtes: String = {
    val head =
      s"""WITH wc AS MATERIALIZED (
           SELECT gram AS word, COUNT(*) AS cnt FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '\\W+'),
               x -> x <> '')) AS gram
             FROM documents) GROUP BY 1),
         v0 AS MATERIALIZED (
           SELECT piece, SUM(cnt) AS cnt FROM (
             SELECT wc.cnt,
               substr(wc.word, CAST(i + 1 AS INT), CAST(l + 1 AS INT))
                 AS piece
             FROM wc
             CROSS JOIN unnest(range(length(word))) AS ri(i)
             CROSS JOIN unnest(range($ugMaxPiece)) AS rl(l)
             WHERE i + l + 1 <= length(word)) z
           GROUP BY piece
           HAVING SUM(cnt) >= $ugMinCount OR length(piece) = 1)"""
    val rounds = (1 to ugRounds).map { r =>
      s""",
         ${ugCostCte(s"c${r - 1}", s"v${r - 1}")},
         ${ugViterbiCtes(s"r$r", s"c${r - 1}")},
         ${ugRecountCte(s"v$r", s"r${r}seg", s"v${r - 1}")}"""
    }.mkString
    head + rounds + s",\n         ${ugCostCte(s"c$ugRounds", s"v$ugRounds")}"
  }

  /** Unigram-LM training ([[TextAnalysis.unigramTrain]]) — substring
    * seeding plus 2 hard-EM rounds over the documents vocabulary;
    * output the final (piece, cnt, cost) model. */
  def ppUnigramTrain(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramTrain(ugChecked(t(s, dir, "documents")), "text",
        rounds = ugRounds, maxPieceLen = ugMaxPiece,
        minCount = ugMinCount)
      .orderBy(col("piece"))

  private lazy val ppUnigramTrainSql =
    s"""$ugCtes
       SELECT piece, CAST(cnt AS BIGINT) AS cnt,
         CAST(cost AS DOUBLE) AS cost
       FROM c$ugRounds ORDER BY piece"""

  /** Viterbi segmentation under the trained unigram model
    * ([[TextAnalysis.unigramSegment]]) — the [[ppBpeApply]] contract:
    * (word, pieces, n_pieces) over the distinct-word vocabulary. */
  def ppUnigramApply(s: SparkSession, dir: String): DataFrame = {
    val trained = TextAnalysis.unigramTrain(
      ugChecked(t(s, dir, "documents")),
      "text", rounds = ugRounds, maxPieceLen = ugMaxPiece,
      minCount = ugMinCount)
    TextAnalysis.unigramSegment(t(s, dir, "documents"), "text",
      TextAnalysis.unigramModel(trained), maxPieceLen = ugMaxPiece)
  }

  private lazy val ppUnigramApplySql =
    s"""$ugCtes,
       ${ugViterbiCtes("ap", s"c$ugRounds")}
       SELECT word, pieces,
         CAST(len(string_split(pieces, ' ')) AS BIGINT) AS n_pieces
       FROM apseg ORDER BY word"""

  /** One greedy MaxMatch forward walk over `wc` under vocabulary
    * `cTab`: per step, the LONGEST matching piece at the cursor
    * (UNION branches per length, QUALIFY keeps the max), appended
    * and advanced — the WordPiece-style inference rule unrolled. */
  private def mmWalkCtes(pfx: String, cTab: String): String = {
    val g0 =
      s"""${pfx}g0 AS MATERIALIZED (
           SELECT word, 0 AS pos, '' AS pieces FROM wc)"""
    val steps = (1 to ugMaxWord).map { j =>
      val branches = (1 to ugMaxPiece).map { s =>
        s"""SELECT w.word, $s AS s,
              substr(w.word, w.pos + 1, $s) AS piece
            FROM ${pfx}g${j - 1} w JOIN $cTab c
              ON c.piece = substr(w.word, w.pos + 1, $s)
            WHERE length(w.word) >= w.pos + $s
              AND w.pos < length(w.word)"""
      }.mkString(" UNION ALL ")
      s""",
         ${pfx}m$j AS MATERIALIZED (
           SELECT word, s, piece FROM ($branches) z
           QUALIFY ROW_NUMBER() OVER (PARTITION BY word
             ORDER BY s DESC) = 1),
         ${pfx}g$j AS MATERIALIZED (
           SELECT w.word,
             CASE WHEN m.word IS NULL THEN w.pos
                  ELSE w.pos + m.s END AS pos,
             CASE WHEN m.word IS NULL THEN w.pieces
                  WHEN w.pieces = '' THEN m.piece
                  ELSE w.pieces || ' ' || m.piece END AS pieces
           FROM ${pfx}g${j - 1} w
           LEFT JOIN ${pfx}m$j m ON m.word = w.word)"""
    }.mkString
    g0 + steps
  }

  /** [[ppUnigramApply]] with the model read from the at-rest store
    * ([[TextAnalysis.writeUnigramModel]]) — training paid once, apply
    * reads the model-sized vocabulary and segments scan-local. Shares
    * [[ppUnigramApplySql]] VERBATIM (lossless-store proof: the
    * persisted DECIMAL(20,6) costs reproduce the inline segmentation
    * bit-for-bit). Training itself stays a batch job: EM
    * re-estimates over the whole corpus, so an "incremental trainer"
    * would be dishonest — the store is the production apply path. */
  /** The at-rest unigram model store shared by the unigram AND
    * MaxMatch `_at_rest` gates (MaxMatch consumes only the piece
    * inventory, so one store serves both inference rules): train
    * once, read back ((piece, cost) pairs, maxPieceLen). */
  private def unigramStoredModel(s: SparkSession, dir: String,
      docs: DataFrame): (Seq[(String, java.math.BigDecimal)], Int) = {
    val root = layoutDir(dir, "documents", "unigram_r2_m4_c3")
    ensureLayout(root) {
      TextAnalysis.writeUnigramModel(docs, "text", rounds = ugRounds,
        maxPieceLen = ugMaxPiece, minCount = ugMinCount, root)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    TextAnalysis.readUnigramModel(s, root)
  }

  def ppUnigramApplyAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = ugChecked(t(s, dir, "documents"))
    val (model, mpl) = unigramStoredModel(s, dir, docs)
    TextAnalysis.unigramSegment(docs, "text", model, mpl)
  }

  /** WordPiece-style greedy MaxMatch segmentation
    * ([[TextAnalysis.maxMatchSegmentTable]]) over the SAME trained
    * unigram vocabulary as [[ppUnigramApply]] — the other inference
    * rule production tokenizers use (BERT); the oracle replays the
    * trainer chain plus the greedy walk, so the gate pins exactly
    * where greedy and Viterbi agree to disagree. */
  def ppMaxmatchApply(s: SparkSession, dir: String): DataFrame = {
    val trained = TextAnalysis.unigramTrain(
      ugChecked(t(s, dir, "documents")),
      "text", rounds = ugRounds, maxPieceLen = ugMaxPiece,
      minCount = ugMinCount)
    TextAnalysis.maxMatchSegmentTable(t(s, dir, "documents"), "text",
      trained.select(col("piece")).collect().map(_.getString(0)).toSeq,
      maxPieceLen = ugMaxPiece)
  }

  private lazy val ppMaxmatchApplySql =
    s"""$ugCtes,
       ${mmWalkCtes("mm", s"c$ugRounds")}
       SELECT word, pieces,
         CAST(len(string_split(pieces, ' ')) AS BIGINT) AS n_pieces
       FROM mmg$ugMaxWord ORDER BY word"""

  /** [[ppMaxmatchApply]] with the vocabulary read from the SAME
    * at-rest unigram store [[ppUnigramApplyAtRest]] builds — the
    * greedy inference rule needs only the piece inventory, so the
    * store is written once and serves both tokenizers. Shares
    * [[ppMaxmatchApplySql]] VERBATIM. */
  def ppMaxmatchApplyAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = ugChecked(t(s, dir, "documents"))
    val (model, mpl) = unigramStoredModel(s, dir, docs)
    TextAnalysis.maxMatchSegmentTable(docs, "text", model.map(_._1),
      mpl)
  }

  /** Corpus-scale unigram tokenization
    * ([[TextAnalysis.unigramTokenize]]): per-document word and
    * unigram-token counts under the trained model — the
    * [[ppBpeTokenize]] contract for the other tokenizer family. */
  def ppUnigramTokenize(s: SparkSession, dir: String): DataFrame = {
    val trained = TextAnalysis.unigramTrain(
      ugChecked(t(s, dir, "documents")),
      "text", rounds = ugRounds, maxPieceLen = ugMaxPiece,
      minCount = ugMinCount)
    TextAnalysis.unigramTokenize(t(s, dir, "documents"), "text",
      "doc_id", TextAnalysis.unigramModel(trained),
      maxPieceLen = ugMaxPiece)
  }

  private lazy val ppUnigramTokenizeSql =
    s"""$ugCtes,
       ${ugViterbiCtes("ap", s"c$ugRounds")},
       seg AS (
         SELECT word,
           len(string_split(pieces, ' ')) AS n_pieces
         FROM apseg),
       occ AS (
         SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '\\W+'),
           x -> x <> '')) AS word
         FROM documents)
       SELECT o.doc_id, COUNT(*) AS n_words,
         CAST(SUM(s.n_pieces) AS BIGINT) AS n_unigram_tokens
       FROM occ o JOIN seg s ON s.word = o.word
       GROUP BY o.doc_id ORDER BY o.doc_id"""

  /** Gopher's other repetition signal: fraction of a document's
    * bigrams occupied by its single most frequent bigram, smallest
    * gram winning count ties. */
  def taTopBigram(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topGramStats(t(s, dir, "documents"), "text", "doc_id",
        n = 2)
      .orderBy(col("doc_id"))

  private val taTopBigramSql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT doc_id, tk[i+1] || ' ' || tk[i+2] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       counts AS (
         SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
       ranked AS (
         SELECT doc_id, gram, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY c DESC, gram) AS rn
         FROM counts),
       agg AS (
         SELECT doc_id, SUM(c) AS n_grams FROM counts GROUP BY doc_id)
       SELECT d.doc_id,
         CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
         r.gram AS top_gram,
         CAST(COALESCE(r.c, 0) AS BIGINT) AS top_count,
         CAST(ROUND(CAST(CASE WHEN COALESCE(a.n_grams, 0) > 0
           THEN CAST(r.c AS DOUBLE) / a.n_grams ELSE 0.0 END
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS top_fraction
       FROM documents d
       LEFT JOIN agg a ON d.doc_id = a.doc_id
       LEFT JOIN ranked r ON d.doc_id = r.doc_id AND r.rn = 1
       ORDER BY d.doc_id"""

  /** Per-source quota sampling by deterministic hash order — the
    * mixture-weighting step of a pretraining pipeline ("N_i docs from
    * source i"): src0 upweighted, src1 downweighted, everything else
    * at the default quota. */
  def ppMixture(s: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 20, "src1" -> 5), defaultQuota = 10)
      .select(col("doc_id"), col("source"), col("sample_rank"))
      .orderBy(col("doc_id"))

  private val ppMixtureSql =
    """WITH ranked AS (
         SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
         FROM documents)
       SELECT doc_id, source, sample_rank FROM ranked
       WHERE sample_rank <= CASE source WHEN 'src0' THEN 20
                                        WHEN 'src1' THEN 5
                                        ELSE 10 END
       ORDER BY doc_id"""

  /** Length-bucketed batch assignment
    * ([[Sampling.lengthBucketBatches]], batches of 32): the
    * padding-minimization step of a data loader, bucket = bit-length
    * of the whitespace token count (integer log2 — engine-exact). */
  def ppLengthBuckets(s: SparkSession, dir: String): DataFrame =
    Sampling.lengthBucketBatches(t(s, dir, "documents"), "text",
      "doc_id", batchSize = 32)
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        col("batch_idx"))
      .orderBy(col("doc_id"))

  private val ppLengthBucketsSql =
    """WITH m AS (
         SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT)
             AS n_tokens
         FROM documents),
       b AS (
         SELECT doc_id, n_tokens,
           CAST(length(bin(GREATEST(n_tokens, 1))) AS BIGINT) AS bucket
         FROM m),
       r AS (
         SELECT doc_id, n_tokens, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM b)
       SELECT doc_id, n_tokens, bucket,
         CAST(FLOOR(CAST(rn - 1 AS DOUBLE) / 32) AS BIGINT) AS batch_idx
       FROM r ORDER BY doc_id"""

  /** Token-budget-capped per-source selection
    * ([[Sampling.budgetSelect]], 500 tokens per source — tight enough
    * that the cap genuinely truncates every source): documents
    * consumed in deterministic hash order until the budget fills —
    * the data-constrained subsetting step of a mix search. */
  def ppBudgetSelect(s: SparkSession, dir: String): DataFrame =
    Sampling.budgetSelect(t(s, dir, "documents"), "text", "doc_id",
      "source", budget = 500L)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("doc_id"))

  private val ppBudgetSelectSql =
    """WITH m AS (
         SELECT doc_id, source,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT)
             AS n_tokens
         FROM documents),
       c AS (
         SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
         FROM m)
       SELECT doc_id, source, n_tokens, cum_tokens
       FROM c WHERE cum_tokens <= 500 ORDER BY doc_id"""

  /** Temperature-scaled language-mixture weights
    * ([[Sampling.temperatureWeights]], T = 2): per language, token
    * share and the renormalized sqrt(share) sampling weight — the
    * UniMax-style rebalancing that upweights low-resource languages.
    * sqrt is IEEE-correctly-rounded and the normalizer sum is
    * decimal-routed, so the whole computation is bit-replayable in
    * SQL. */
  def ppTemperature(s: SparkSession, dir: String): DataFrame =
    Sampling.temperatureWeights(t(s, dir, "documents"), "text", "lang")
      .orderBy(col("lang"))

  private val ppTemperatureSql =
    """WITH pl AS (
         SELECT lang, COUNT(*) AS n_docs,
           SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT))
             AS n_tokens
         FROM documents GROUP BY lang),
       w AS (
         SELECT lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share_raw,
           sqrt(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()) AS wr
         FROM pl)
       SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(ROUND(CAST(share_raw AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS share,
         CAST(ROUND(CAST(wr / CAST(SUM(CAST(wr AS DECIMAL(28,15)))
               OVER () AS DOUBLE) AS DECIMAL(28,10)), 3) AS DOUBLE)
           AS weight
       FROM w ORDER BY lang"""

  /** End-to-end RefinedWeb/Dolma-style curation pass — the full
    * filter pipeline a pretraining corpus goes through, in one call:
    * quality heuristics (score ≥ 0.65) → within-doc repetition
    * (duplicate-3-gram fraction ≤ 0.01) → MinHash-LSH fuzzy dedup
    * (drop any doc with a lower-keyed candidate partner). Emits the
    * per-(lang, source) funnel: stage-attributed drop counts (each doc
    * charged to the FIRST stage that rejects it, so drops + kept =
    * input) and the surviving token budget — the numbers a mixture
    * designer actually consumes.
    *
    * Plan shape: quality + repetition are scan-local projections
    * (one corpus pass), dedup pairs come from the banded equi-join
    * ([[Dedup.minHashCandidates]]), and the funnel is one final
    * aggregate — no corpus-sized join except the hash-keyed
    * candidate lookup. Thresholds compare the r3-ROUNDED scores both
    * engines are proven to agree on (ta_quality / ta_repetition). */
  def ppFilterE2e(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sig = TextAnalysis.repetitionStats(
      TextAnalysis.qualityMetrics(d, "text"), "text", n = 3)
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws_tokens"),
        col("quality_score"), col("dup_fraction"))
    val dupOf = Dedup.minHashCandidates(d, "text", "doc_id")
      .groupBy(col("key_b")).agg(min(col("key_a")).as("near_dup_of"))
    val flags = sig
      .join(dupOf, sig("doc_id") === dupOf("key_b"), "left_outer")
      .withColumn("pass_q", col("quality_score") >= 0.65)
      .withColumn("pass_r", col("dup_fraction") <= 0.01)
      .withColumn("pass_d", col("near_dup_of").isNull)
    flags.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_in"),
        sum(when(!col("pass_q"), 1L).otherwise(0L)).as("drop_quality"),
        sum(when(col("pass_q") && !col("pass_r"), 1L).otherwise(0L))
          .as("drop_repetition"),
        sum(when(col("pass_q") && col("pass_r") && !col("pass_d"), 1L)
          .otherwise(0L)).as("drop_neardup"),
        sum(when(col("pass_q") && col("pass_r") && col("pass_d"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("pass_q") && col("pass_r") && col("pass_d"),
          col("ws_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("lang"), col("source"))
  }

  private val ppFilterE2eSql =
    s"""WITH ${minhashBandsCte(Int.MaxValue)},
       ndup AS (
         SELECT b.doc_id, MIN(a.doc_id) AS near_dup_of
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id
         GROUP BY b.doc_id),
       m AS (
         SELECT doc_id, lang, source,
           len(list_filter(string_split_regex(lower(text), '\\W+'),
                           x -> x <> '')) AS n_tokens,
           length(regexp_replace(lower(text),
             '[a-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS n_punct,
           length(text) AS n_len,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \\t\\n\\x0B\\f\\r]+')) END AS BIGINT)
             AS ws_tokens
         FROM documents),
       q AS (
         SELECT doc_id, lang, source, ws_tokens,
           CAST(ROUND(CAST(GREATEST(0.0, LEAST(1.0,
             CASE WHEN n_tokens > 0
               THEN 0.5 + 0.5 * LEAST(1.0, n_tokens / 100.0) -
                    (CASE WHEN n_len > 0
                     THEN CAST(n_punct AS DOUBLE) / n_len ELSE 0.0 END)
               ELSE 0.0 END)) AS DECIMAL(28,10)), 3) AS DOUBLE) AS qs
         FROM m),
       rtoks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM documents),
       rg AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM rtoks CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       ragg AS (
         SELECT doc_id, COUNT(*) AS ng, COUNT(DISTINCT gram) AS nd
         FROM rg GROUP BY doc_id),
       rep AS (
         SELECT d.doc_id,
           CAST(ROUND(CAST(CASE WHEN COALESCE(a.ng, 0) > 0
             THEN 1.0 - CAST(a.nd AS DOUBLE) / a.ng
             ELSE 0.0 END AS DECIMAL(28,10)), 3) AS DOUBLE) AS rf
         FROM documents d LEFT JOIN ragg a ON d.doc_id = a.doc_id),
       j AS (
         SELECT q.lang, q.source, q.ws_tokens,
           (q.qs >= 0.65) AS pass_q,
           (rep.rf <= 0.01) AS pass_r,
           (ndup.near_dup_of IS NULL) AS pass_d
         FROM q JOIN rep ON q.doc_id = rep.doc_id
           LEFT JOIN ndup ON q.doc_id = ndup.doc_id)
       SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_in,
         CAST(SUM(CASE WHEN NOT pass_q THEN 1 ELSE 0 END) AS BIGINT)
           AS drop_quality,
         CAST(SUM(CASE WHEN pass_q AND NOT pass_r THEN 1 ELSE 0 END)
           AS BIGINT) AS drop_repetition,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND NOT pass_d
           THEN 1 ELSE 0 END) AS BIGINT) AS drop_neardup,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND pass_d
           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND pass_d
           THEN ws_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       FROM j GROUP BY lang, source ORDER BY lang, source"""

  /** [[ppFilterE2e]] with the LM-PERPLEXITY routing stage production
    * funnels actually run (CCNet/RefinedWeb gate on a KenLM-style
    * perplexity next to the heuristics; round-16 verdict #5): quality
    * → repetition → perplexity → MinHash near-dup, first-rejecting-
    * stage attribution preserved (drops + kept = input). The
    * perplexity stage is [[taPplRoute]]'s exact shape — the KN bigram
    * model trained on the ⅔ slice, scores compared to the FIXED
    * calibration cutoff (−3.42, the route's tail floor: CCNet keeps
    * head+middle), scan-local over the scored corpus. A document with
    * no scorable bigram has no perplexity evidence and DROPS at the
    * ppl stage (deterministic on both engines — the oracle's COALESCE
    * replays it). */
  def ppFilterPplE2e(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sig = TextAnalysis.repetitionStats(
      TextAnalysis.qualityMetrics(d, "text"), "text", n = 3)
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws_tokens"),
        col("quality_score"), col("dup_fraction"))
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        d.filter(col("doc_id") % 3 =!= 0), "text"))
    val scored = TextAnalysis.ngramLmScoreKn(d, g2, lamT, contT,
        "text", "doc_id")
      .select(col("key").as("doc_id"), col("avg_ll"))
    val dupOf = Dedup.minHashCandidates(d, "text", "doc_id")
      .groupBy(col("key_b")).agg(min(col("key_a")).as("near_dup_of"))
    val flags = sig
      .join(scored, Seq("doc_id"), "left_outer")
      .join(dupOf, sig("doc_id") === dupOf("key_b"), "left_outer")
      .withColumn("pass_q", col("quality_score") >= 0.65)
      .withColumn("pass_r", col("dup_fraction") <= 0.01)
      .withColumn("pass_p",
        coalesce(col("avg_ll") >= lit(-3.42), lit(false)))
      .withColumn("pass_d", col("near_dup_of").isNull)
    flags.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_in"),
        sum(when(!col("pass_q"), 1L).otherwise(0L)).as("drop_quality"),
        sum(when(col("pass_q") && !col("pass_r"), 1L).otherwise(0L))
          .as("drop_repetition"),
        sum(when(col("pass_q") && col("pass_r") && !col("pass_p"), 1L)
          .otherwise(0L)).as("drop_ppl"),
        sum(when(col("pass_q") && col("pass_r") && col("pass_p") &&
          !col("pass_d"), 1L).otherwise(0L)).as("drop_neardup"),
        sum(when(col("pass_q") && col("pass_r") && col("pass_p") &&
          col("pass_d"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("pass_q") && col("pass_r") && col("pass_p") &&
          col("pass_d"), col("ws_tokens")).otherwise(0L))
          .as("kept_tokens"))
      .orderBy(col("lang"), col("source"))
  }

  private lazy val ppFilterPplE2eSql =
    s"""WITH ${minhashBandsCte(Int.MaxValue)},
       ndup AS (
         SELECT b.doc_id, MIN(a.doc_id) AS near_dup_of
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id
         GROUP BY b.doc_id),
       pplsc AS (
         SELECT doc_id, avg_ll FROM ($taNgramLmKnSql) pz),
       m AS (
         SELECT doc_id, lang, source,
           len(list_filter(string_split_regex(lower(text), '\\W+'),
                           x -> x <> '')) AS n_tokens,
           length(regexp_replace(lower(text),
             '[a-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS n_punct,
           length(text) AS n_len,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \\t\\n\\x0B\\f\\r]+')) END AS BIGINT)
             AS ws_tokens
         FROM documents),
       q AS (
         SELECT doc_id, lang, source, ws_tokens,
           CAST(ROUND(CAST(GREATEST(0.0, LEAST(1.0,
             CASE WHEN n_tokens > 0
               THEN 0.5 + 0.5 * LEAST(1.0, n_tokens / 100.0) -
                    (CASE WHEN n_len > 0
                     THEN CAST(n_punct AS DOUBLE) / n_len ELSE 0.0 END)
               ELSE 0.0 END)) AS DECIMAL(28,10)), 3) AS DOUBLE) AS qs
         FROM m),
       rtoks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM documents),
       rg AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM rtoks CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       ragg AS (
         SELECT doc_id, COUNT(*) AS ng, COUNT(DISTINCT gram) AS nd
         FROM rg GROUP BY doc_id),
       rep AS (
         SELECT d.doc_id,
           CAST(ROUND(CAST(CASE WHEN COALESCE(a.ng, 0) > 0
             THEN 1.0 - CAST(a.nd AS DOUBLE) / a.ng
             ELSE 0.0 END AS DECIMAL(28,10)), 3) AS DOUBLE) AS rf
         FROM documents d LEFT JOIN ragg a ON d.doc_id = a.doc_id),
       j AS (
         SELECT q.lang, q.source, q.ws_tokens,
           (q.qs >= 0.65) AS pass_q,
           (rep.rf <= 0.01) AS pass_r,
           COALESCE(pplsc.avg_ll >= CAST(-3.42 AS DOUBLE), FALSE)
             AS pass_p,
           (ndup.near_dup_of IS NULL) AS pass_d
         FROM q JOIN rep ON q.doc_id = rep.doc_id
           LEFT JOIN pplsc ON q.doc_id = pplsc.doc_id
           LEFT JOIN ndup ON q.doc_id = ndup.doc_id)
       SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_in,
         CAST(SUM(CASE WHEN NOT pass_q THEN 1 ELSE 0 END) AS BIGINT)
           AS drop_quality,
         CAST(SUM(CASE WHEN pass_q AND NOT pass_r THEN 1 ELSE 0 END)
           AS BIGINT) AS drop_repetition,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND NOT pass_p
           THEN 1 ELSE 0 END) AS BIGINT) AS drop_ppl,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND pass_p AND
           NOT pass_d THEN 1 ELSE 0 END) AS BIGINT) AS drop_neardup,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND pass_p AND pass_d
           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN pass_q AND pass_r AND pass_p AND pass_d
           THEN ws_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       FROM j GROUP BY lang, source ORDER BY lang, source"""

  /** Per-document stage attribution of the EXACT-dedup curation
    * funnel ([[graft.streaming.CurationStream.batchVerdicts]]) — the
    * batch reference the incremental readStream/foreachBatch funnel is
    * proven equal to in StreamingSpec, so this oracle transitively
    * gates the streaming path too. Doc-granular (one verdict row per
    * document) — a misattributed stage on ANY document
    * hash-mismatches, which an aggregated funnel could mask.
    *
    * The synthetic corpus has no byte-identical texts at the gate
    * scales, so (ta_pii's injection precedent) every 11th document is
    * unioned back in as a deterministic "recrawl" duplicate
    * (doc_id + 1,000,000, source 'recrawl') — replayed identically in
    * the oracle — so the dedup stage provably fires: each recrawl of a
    * quality-passing original must land in drop_dup. */
  def ppCurationVerdicts(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val recrawl = d.filter(pmod(col("doc_id"), lit(11)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("source", lit("recrawl"))
    graft.streaming.CurationStream.batchVerdicts(d.unionByName(recrawl))
      .select(col("doc_id"), col("lang"), col("source"),
        col("ws_tokens").cast("long").as("ws_tokens"), col("stage"))
      .orderBy(col("doc_id"))
  }

  private val ppCurationVerdictsSql =
    """WITH docs AS (
         SELECT doc_id, lang, source, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id, lang,
           'recrawl' AS source, text
         FROM documents WHERE doc_id % 11 = 0),
       m AS (
         SELECT doc_id, lang, source, md5(text) AS fp,
           len(list_filter(string_split_regex(lower(text), '\W+'),
                           x -> x <> '')) AS n_tokens,
           length(regexp_replace(lower(text),
             '[a-z0-9 \t\n\x0B\f\r]', '', 'g')) AS n_punct,
           length(text) AS n_len,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text),
                         '[ \t\n\x0B\f\r]+')) END AS BIGINT)
             AS ws_tokens
         FROM docs),
       q AS (
         SELECT doc_id, lang, source, ws_tokens, fp,
           CAST(ROUND(CAST(GREATEST(0.0, LEAST(1.0,
             CASE WHEN n_tokens > 0
               THEN 0.5 + 0.5 * LEAST(1.0, n_tokens / 100.0) -
                    (CASE WHEN n_len > 0
                     THEN CAST(n_punct AS DOUBLE) / n_len ELSE 0.0 END)
               ELSE 0.0 END)) AS DECIMAL(28,10)), 3) AS DOUBLE) AS qs
         FROM m),
       rtoks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM docs),
       rg AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM rtoks CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       ragg AS (
         SELECT doc_id, COUNT(*) AS ng, COUNT(DISTINCT gram) AS nd
         FROM rg GROUP BY doc_id),
       rep AS (
         SELECT d.doc_id,
           CAST(ROUND(CAST(CASE WHEN COALESCE(a.ng, 0) > 0
             THEN 1.0 - CAST(a.nd AS DOUBLE) / a.ng
             ELSE 0.0 END AS DECIMAL(28,10)), 3) AS DOUBLE) AS rf
         FROM docs d LEFT JOIN ragg a ON d.doc_id = a.doc_id),
       v AS (
         SELECT q.doc_id, q.lang, q.source, q.ws_tokens, q.fp,
           (q.qs >= 0.65) AS pass_q, (rep.rf <= 0.01) AS pass_r
         FROM q JOIN rep ON q.doc_id = rep.doc_id),
       keep AS (
         SELECT fp, MIN(doc_id) AS keep_id
         FROM v WHERE pass_q AND pass_r GROUP BY fp)
       SELECT v.doc_id, v.lang, v.source,
         CAST(v.ws_tokens AS BIGINT) AS ws_tokens,
         CASE WHEN NOT pass_q THEN 'drop_quality'
              WHEN NOT pass_r THEN 'drop_repetition'
              WHEN v.doc_id <> keep.keep_id THEN 'drop_dup'
              ELSE 'kept' END AS stage
       FROM v LEFT JOIN keep ON v.fp = keep.fp
       ORDER BY doc_id"""

  /** Concat-and-chunk packing spans per source shard (4096-token
    * blocks): each document's global token offset and chunk range
    * under GPT-style corpus packing. */
  def ppPacking(s: SparkSession, dir: String): DataFrame =
    Sampling.concatChunkSpans(t(s, dir, "documents"), "text", "doc_id",
        "source", chunkTokens = 4096)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_token"), col("first_chunk"), col("last_chunk"))
      .orderBy(col("doc_id"))

  // DuckDB-version-robust formulation (round-5 directive #1). Two
  // changes vs the round-4 oracle that hash-red on the driver while
  // passing bit-exact on local DuckDB 1.0.0 at all three scales:
  // (a) THE FIX — `start_token` was emitted raw from
  //     SUM(BIGINT) OVER (...), which DuckDB types as HUGEINT; how a
  //     HUGEINT column crosses into the comparator (int64 vs
  //     decimal128 vs float) is exactly the kind of
  //     client-version-sensitive behavior that reproduces "values
  //     diverge only on the driver's build". pp_packing was the ONLY
  //     oracle in the corpus with an uncast windowed SUM in its
  //     output. Now every output column is explicitly BIGINT.
  // (b) belt-and-braces: regexp_extract_all on the positive token
  //     class (never produces empty segments) instead of
  //     string_split_regex+list_filter, FLOOR over DOUBLE (one
  //     defined semantics everywhere; values ≪ 2^52 so the double
  //     round-trip is exact) instead of `//`, and the window frame
  //     spelled out in full.
  private val ppPackingSql =
    """WITH counted AS (
         SELECT doc_id, source,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+'))
             AS BIGINT) AS n_tokens
         FROM documents),
       offs AS (
         SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tokens AS BIGINT) AS start_token
         FROM counted)
       SELECT doc_id, source, n_tokens, start_token,
         CAST(FLOOR(CAST(start_token AS DOUBLE) / 4096.0) AS BIGINT)
           AS first_chunk,
         CAST(FLOOR(CAST(GREATEST(start_token,
             start_token + n_tokens - 1) AS DOUBLE) / 4096.0) AS BIGINT)
           AS last_chunk
       FROM offs ORDER BY doc_id"""

  /** Sliding-window chunking with overlap
    * ([[Sampling.chunkWithOverlap]], 16-token windows every 8): the
    * retrieval-indexing cut, one row per (doc, window). Scan-local
    * explode — the whole query is a map; every output column is an
    * integer or string, so the hash comparison is exact by
    * construction. */
  def ppChunkOverlap(s: SparkSession, dir: String): DataFrame =
    Sampling.chunkWithOverlap(t(s, dir, "documents"), "text", "doc_id",
      chunkTokens = 16, stride = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))

  // n_chunks mirrors the engine's FLOOR-over-DOUBLE form (pp_packing's
  // engine-portable division); list_slice truncates at the list end
  // exactly like Spark's slice, but array_to_string of an empty slice
  // is NULL where array_join gives '' — hence the COALESCE.
  private val ppChunkOverlapSql =
    """WITH toks AS (
         SELECT doc_id,
           regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+'))
             AS BIGINT) AS n_tokens
         FROM documents),
       nc AS (
         SELECT doc_id, tk, n_tokens,
           CASE WHEN n_tokens <= 16 THEN CAST(1 AS BIGINT)
                ELSE CAST(FLOOR(CAST(n_tokens - 16 + 8 - 1 AS DOUBLE)
                       / 8.0) AS BIGINT) + 1
           END AS n_chunks
         FROM toks),
       ch AS (
         SELECT doc_id, tk, n_tokens,
           CAST(unnest(range(n_chunks)) AS BIGINT) AS chunk_idx
         FROM nc)
       SELECT doc_id, n_tokens, chunk_idx,
         CAST(chunk_idx * 8 AS BIGINT) AS start_token,
         CAST(LEAST(n_tokens - chunk_idx * 8, 16) AS BIGINT)
           AS chunk_tokens,
         COALESCE(array_to_string(list_slice(tk,
           chunk_idx * 8 + 1, chunk_idx * 8 + 16), ' '), '')
           AS chunk_text
       FROM ch ORDER BY doc_id, chunk_idx"""

  /** Content-defined chunking ([[Sampling.chunkContentDefined]],
    * 4-token window, hex-'0' boundary ⇒ mean chunk ≈ 16 tokens): the
    * storage-dedup cut whose boundaries survive insertions. Every
    * output column is integral or an md5 hex string — exact hash
    * compare by construction. */
  def ppChunkCdc(s: SparkSession, dir: String): DataFrame =
    Sampling.chunkContentDefined(t(s, dir, "documents"), "text",
      "doc_id")
      .orderBy(col("doc_id"), col("chunk_id"))

  // the boundary window (list() OVER 3 PRECEDING..CURRENT) and the
  // strictly-preceding boundary cumsum mirror the engine's frames
  // exactly; unnest(range)+list_extract is the posexplode replay, and
  // string_agg(... ORDER BY pos) replays the engine's sorted-struct
  // fingerprint (chunk positions are contiguous in both).
  // Parameterized by the source relation so the incremental gate can
  // replay the chain over the simulated NEW snapshot.
  private def cdcChunksCteFrom(src: String): String =
    s"""tkl AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+')
           AS tk
         FROM $src),
       toks AS (
         SELECT doc_id, CAST(unnest(range(len(tk))) AS BIGINT) AS pos,
           list_extract(tk,
             CAST(unnest(range(len(tk))) AS BIGINT) + 1) AS tok
         FROM tkl),
       marked AS (
         SELECT doc_id, pos, tok,
           CASE WHEN substr(md5(array_to_string(list(tok) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), ' ')),
               1, 1) = '0'
             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
           END AS boundary
         FROM toks),
       cid AS (
         SELECT doc_id, pos, tok,
           COALESCE(SUM(boundary) OVER (PARTITION BY doc_id
             ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(0 AS BIGINT)) AS chunk_id
         FROM marked),
       chunks AS (
         SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(MIN(pos) AS BIGINT) AS start_pos,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS fingerprint
         FROM cid GROUP BY doc_id, chunk_id)"""

  private val cdcChunksCte = cdcChunksCteFrom("documents")

  private val ppChunkCdcSql =
    s"""WITH $cdcChunksCte
       SELECT doc_id, chunk_id, start_pos, n_tokens, fingerprint
       FROM chunks ORDER BY doc_id, chunk_id"""

  /** Chunk-level storage dedup over the CDC cut: per document, how
    * many of its tokens sit in chunks whose fingerprint also appears
    * in ANOTHER document — the dedup-store savings CDC exists to
    * harvest. Composition of [[ppChunkCdc]] with one
    * fingerprint-keyed ownership count; the per-doc fraction is a
    * single integral division, decimal-rounded. */
  def ppCdcDedup(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.ChunkStore.dupMass(
      Sampling.chunkContentDefined(t(s, dir, "documents"), "text",
        "doc_id"))
      .orderBy(col("doc_id"))

  private val ppCdcDedupSql =
    s"""WITH $cdcChunksCte,
       owners AS (
         SELECT fingerprint,
           COUNT(DISTINCT doc_id) AS n_owner_docs
         FROM chunks GROUP BY fingerprint)
       SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN o.n_owner_docs >= 2 THEN c.n_tokens
           ELSE 0 END) AS BIGINT) AS dup_tokens,
         CAST(ROUND(CAST(CAST(SUM(CASE WHEN o.n_owner_docs >= 2
             THEN c.n_tokens ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c.n_tokens) AS DOUBLE) AS DECIMAL(28,10)), 6)
           AS DOUBLE) AS dup_frac
       FROM chunks c JOIN owners o USING (fingerprint)
       GROUP BY c.doc_id ORDER BY c.doc_id"""

  /** Corpus snapshot diff ([[Dedup.snapshotDiff]]): the
    * incremental-crawl delta classifier. Two snapshots are simulated
    * deterministically from the one documents table — the old
    * snapshot drops every 7th doc (→ `added` in new) and appends a
    * revision marker to every 5th text (→ `changed`); the new
    * snapshot drops every 11th (→ `removed`). Fingerprint compare per
    * key; the join moves md5 strings, never text. */
  def ppSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val oldSnap = docs
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"),
          lit(" [rev1]"))).otherwise(col("text")).as("text"))
    val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"))
    Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  private val ppSnapshotDiffSql =
    """WITH oldsnap AS (
         SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0
           THEN text || ' [rev1]' ELSE text END) AS old_fp
         FROM documents WHERE doc_id % 7 <> 0),
       newsnap AS (
         SELECT doc_id, md5(text) AS new_fp
         FROM documents WHERE doc_id % 11 <> 0)
       SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.old_fp IS NULL THEN 'added'
              WHEN n.new_fp IS NULL THEN 'removed'
              WHEN o.old_fp = n.new_fp THEN 'unchanged'
              ELSE 'changed' END AS status
       FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
       ORDER BY doc_id"""

  /** [[ppCdcDedup]] over the at-rest
    * [[graft.pipeline.ChunkStore]] — the "chunk once, probe many"
    * form: the corpus-wide chunk+md5 pass is paid at write time, the
    * probe reads chunk rows from the `fp_bucket=` layout. Shares
    * [[ppCdcDedup]]'s oracle VERBATIM (lossless-layout proof). */
  def ppCdcAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = layoutDir(dir, "documents", "cdc_w4_b64")
    ensureLayout(s"$root")(graft.pipeline.ChunkStore.writeBase(
      t(s, dir, "documents"), "text", "doc_id", root))
    graft.pipeline.ChunkStore.dupMass(
      graft.pipeline.ChunkStore.liveChunks(s, root))
      .orderBy(col("doc_id"))
  }

  /** Snapshot-driven incremental chunk maintenance: base store from
    * the OLD simulated snapshot, ONE [[Dedup.snapshotDiff]] batch
    * (added+changed re-chunked, removed+changed tombstoned), live
    * chunks read back. The result must equal a full rebuild over the
    * NEW snapshot — the oracle replays [[ppChunkCdc]]'s chain over
    * newsnap, so the maintenance arithmetic (generation precedence,
    * tombstones, per-doc re-chunk) is hash-proven lossless. */
  def ppCdcIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val oldSnap = docs
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"),
          lit(" [rev1]"))).otherwise(col("text")).as("text"))
    val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"))
    val root = layoutDir(dir, "documents", "cdc_incr_w4_b64")
    // the cache sentinel lives under applied/ and is stamped AFTER
    // the diff batch: writeBase's own root/_SUCCESS alone must not
    // satisfy the cache, or a crash between base and batch would
    // leave a skippable half-built layout (round-12 torn-state rule);
    // the wipe target is the whole root so a replay never appends
    // batch 0 against its own prior delta/watermark state
    ensureLayout(s"$root/applied", root) {
      graft.pipeline.ChunkStore.writeBase(oldSnap, "text", "doc_id",
        root)
      graft.pipeline.ChunkStore.appendDiffBatch(
        Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text"),
        newSnap, batchId = 0L, root, "text", "doc_id")
      val applied = new java.io.File(s"$root/applied")
      applied.mkdirs()
      new java.io.File(applied, "_SUCCESS").createNewFile(): Unit
    }
    graft.pipeline.ChunkStore.liveChunks(s, root)
      .select(col("doc_id"), col("chunk_id"), col("start_pos"),
        col("n_tokens"), col("fingerprint"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** [[ppCdcIncremental]]'s layout COMPACTED: base(old) + diff batch
    * folded into a single-level base (staged swap + fold watermark),
    * then probed. Shares pp_cdc_incremental's oracle VERBATIM — the
    * fold is hash-proven lossless. */
  def ppCdcCompacted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val oldSnap = docs
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"),
          lit(" [rev1]"))).otherwise(col("text")).as("text"))
    val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"))
    val root = layoutDir(dir, "documents", "cdc_cpt_w4_b64")
    // wipe the whole root on a cold sentinel: a crash after compact
    // (which stamps base/watermark.json) but before applied/_SUCCESS
    // would otherwise replay appendDiffBatch(0) against the stale
    // fold watermark and be rejected forever
    ensureLayout(s"$root/applied", root) {
      graft.pipeline.ChunkStore.writeBase(oldSnap, "text", "doc_id",
        root)
      graft.pipeline.ChunkStore.appendDiffBatch(
        Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text"),
        newSnap, batchId = 0L, root, "text", "doc_id")
      graft.pipeline.ChunkStore.compact(s, root)
      val applied = new java.io.File(s"$root/applied")
      applied.mkdirs()
      new java.io.File(applied, "_SUCCESS").createNewFile(): Unit
    }
    graft.pipeline.ChunkStore.liveChunks(s, root)
      .select(col("doc_id"), col("chunk_id"), col("start_pos"),
        col("n_tokens"), col("fingerprint"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val ppCdcIncrementalSql =
    s"""WITH newsnap AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0),
       ${cdcChunksCteFrom("newsnap")}
       SELECT doc_id, chunk_id, start_pos, n_tokens, fingerprint
       FROM chunks ORDER BY doc_id, chunk_id"""

  /** TF-IDF keyword extraction ([[TextAnalysis.tfidfKeywords]]): top
    * 3 terms per document by tf·idf (Lucene idf — the BM25 family's
    * notion of rarity), ranked on the custom bounded-heap
    * [[graft.plans.TopKPerKey]] operator. Rank on the raw double with
    * an ascending-term tie-break; score decimal-rounded after. */
  def taKeywords(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfKeywords(t(s, dir, "documents"), "text",
      "doc_id")
      .orderBy(col("doc_id"), col("rank"))

  private val taKeywordsSql =
    """WITH tkl AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+')
           AS tk
         FROM documents),
       posts AS (SELECT doc_id, unnest(tk) AS term FROM tkl),
       tf AS (
         SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
         FROM posts GROUP BY doc_id, term),
       dfs AS (
         SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
         FROM tf GROUP BY term),
       nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM tkl),
       scored AS (
         SELECT t.doc_id, t.term,
           ln(CAST(1.0 AS DOUBLE) +
              (nd.n_docs - d.df + CAST(0.5 AS DOUBLE)) /
              (d.df + CAST(0.5 AS DOUBLE))) * t.tf AS score
         FROM tf t JOIN dfs d USING (term) CROSS JOIN nd),
       ranked AS (
         SELECT doc_id, term, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term) AS INTEGER) AS rank
         FROM scored)
       SELECT doc_id, rank, term,
         CAST(ROUND(CAST(score AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS score
       FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""

  /** Dictionary taxonomy tagging ([[TextAnalysis.dictionaryTags]]):
    * per-(doc, topic) keyword breadth + occurrence mass against a
    * four-topic engine-themed dictionary. Broadcast dict, scan-local
    * explode, one keyed count — all-integer output. */
  def taTagDict(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dictionaryTags(t(s, dir, "documents"), "text",
      "doc_id", tagDictionary)
      .orderBy(col("doc_id"), col("topic"))

  private val tagDictionary: Seq[(String, Seq[String])] = Seq(
    "joins" -> Seq("join", "merge", "hash"),
    "scans" -> Seq("scan", "filter", "row"),
    "streaming" -> Seq("stream", "batch", "window"),
    "sorting" -> Seq("sort", "order", "group"))

  private lazy val taTagDictSql = {
    val values = tagDictionary
      .flatMap { case (t, kws) => kws.map(k => s"('$t', '$k')") }
      .mkString(", ")
    s"""WITH dict(topic, keyword) AS (VALUES $values),
       toks AS (
         SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
             AS tok
         FROM documents)
       SELECT doc_id, topic,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_keywords,
         CAST(COUNT(*) AS BIGINT) AS n_occ
       FROM toks JOIN dict ON tok = keyword
       GROUP BY doc_id, topic ORDER BY doc_id, topic"""
  }

  /** Multinomial Naive Bayes training ([[Classify.nbModel]]): the
    * Laplace-smoothed log-likelihood grid over the deterministic
    * doc_id%5 train split, labels = lang. The grid is DENSE
    * (vocab × classes) so apply-time join misses cannot silently
    * drop smoothed mass. */
  def ppNbModel(s: SparkSession, dir: String): DataFrame = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 5 =!= 0)
    nbModelReport(Classify.nbModel(train, "text", "lang"))
  }

  private val DecimalType28_10 =
    org.apache.spark.sql.types.DecimalType(28, 10)

  /** The NB trainer CTE chain over a parameterizable train slice —
    * shared by the base gates and the re-crawl gate (whose "latest
    * snapshot" train carries updated texts). */
  private val nbTrainCte = nbTrainCteFor("text")

  private def nbTrainCteFor(textExpr: String) =
    s"""train AS (
         SELECT doc_id, lang AS label, $textExpr AS text FROM documents
         WHERE doc_id % 5 <> 0),
       ntoks AS (
         SELECT label,
           unnest(list_filter(string_split_regex(lower(text), '\\W+'),
                              x -> x <> '')) AS token
         FROM train),
       ncounts AS (
         SELECT label, token, COUNT(*) AS cnt
         FROM ntoks GROUP BY label, token),
       nct AS (
         SELECT label, COUNT(*) AS n_tok FROM ntoks GROUP BY label),
       nvocab AS (SELECT DISTINCT token FROM ntoks),
       nv AS (SELECT COUNT(*) AS v_size FROM nvocab),
       ngrid AS (
         SELECT nct.label, nvocab.token,
           CAST(ROUND(CAST(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
                            CAST(nct.n_tok + nv.v_size AS DOUBLE))
                        AS DECIMAL(20,10)), 6)
             AS DECIMAL(20,6)) AS loglik
         FROM nvocab CROSS JOIN nct CROSS JOIN nv
         LEFT JOIN ncounts c
           ON c.label = nct.label AND c.token = nvocab.token)"""

  private lazy val ppNbModelSql =
    s"""WITH $nbTrainCte
       SELECT label, token,
         CAST(ROUND(CAST(loglik AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS loglik
       FROM ngrid ORDER BY label, token"""

  /** CCNet-style perplexity routing with FIXED calibration cutoffs —
    * the production shape: cutoffs are model constants from a
    * held-out calibration (here pinned to this corpus's KN tertile
    * region), so routing is a scan-local CASE over the scored corpus,
    * embarrassingly parallel at any scale; the corpus-relative form
    * is [[taPplTertiles]]. Output: per-bucket doc and bigram mass. */
  def taPplRoute(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    pplRouteBuckets(
      TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT, "text",
        "doc_id"))
  }

  /** The fixed-cutoff routing over a scored relation — ONE body for
    * the inline and at-rest forms, so the calibration constants
    * can't drift between twins. */
  private def pplRouteBuckets(scored: DataFrame): DataFrame =
    scored
      .withColumn("bucket",
        when(col("avg_ll") >= lit(-3.39), lit("head"))
          .when(col("avg_ll") >= lit(-3.42), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_scored")).as("n_bigrams"))
      .orderBy(col("bucket"))

  /** [[taPplRoute]] with the KN model derived from the SHARED
    * [[lmCountsRoot]] store — the full production loop at rest:
    * sufficient statistics streamed once, the routing model folded
    * from them, the corpus routed scan-locally against fixed
    * cutoffs. Shares [[taPplRouteSql]] VERBATIM. */
  def taPplRouteAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // upToN=2: the shared store carries n=1..5 since r15 — a bigram
    // consumer must not materialize a five-order fold (the model's
    // eager checkpoint sits above the fold, so Catalyst can't prune)
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      graft.streaming.NgramLmStream.foldedCountsOf(s,
        lmCountsRoot(s, dir), upToN = 2))
    pplRouteBuckets(
      TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT, "text",
        "doc_id"))
  }

  private lazy val taPplRouteSql =
    s"""SELECT bucket, COUNT(*) AS n_docs,
         CAST(SUM(n_scored) AS BIGINT) AS n_bigrams
       FROM (SELECT doc_id, n_scored, avg_ll,
               CASE WHEN avg_ll >= CAST(-3.39 AS DOUBLE) THEN 'head'
                    WHEN avg_ll >= CAST(-3.42 AS DOUBLE) THEN 'middle'
                    ELSE 'tail' END AS bucket
             FROM ($taNgramLmKnSql) z) b
       GROUP BY bucket ORDER BY bucket"""

  /** Corpus-relative perplexity bucketing: exact tertiles of the KN
    * score via NTILE(3) over (score DESC, doc_id) — a deterministic
    * total order both engines share. The global window is the
    * ORACLE-PARITY form; at 100 TB the production path is
    * [[taPplRoute]]'s fixed cutoffs or [[taPplTertilesApprox]]'s
    * approx-quantile boundaries broadcast as constants (contract-
    * gated ≥99% agreement) — a global exact NTILE is a single-task
    * sort by construction. */
  def taPplTertiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT, "text",
        "doc_id")
      .withColumnRenamed("key", "doc_id")
      .withColumn("nt", ntile(3).over(
        Window.orderBy(col("avg_ll").desc, col("doc_id"))))
      .select(col("doc_id"), col("avg_ll"),
        when(col("nt") === 1, lit("head"))
          .when(col("nt") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  private lazy val taPplTertilesSql =
    s"""SELECT doc_id, avg_ll,
         CASE WHEN nt = 1 THEN 'head'
              WHEN nt = 2 THEN 'middle'
              ELSE 'tail' END AS bucket
       FROM (SELECT doc_id, avg_ll,
               NTILE(3) OVER (ORDER BY avg_ll DESC, doc_id) AS nt
             FROM ($taNgramLmKnSql) z) b
       ORDER BY doc_id"""

  /** The 100 TB form of [[taPplTertiles]], contract-gated (the q28
    * pattern): `percentile_approx` cutoffs computed in ONE mergeable-
    * sketch pass and broadcast back onto the scan as constants — no
    * global sort anywhere — then bucket assignment compared against
    * the exact NTILE(3). The oracle pins the exact per-bucket doc
    * counts (NTILE replay, deterministic) plus TRUE for the
    * contract; Spark asserts ≥99% of docs agree, with the remainder
    * necessarily tie/boundary rows (a threshold puts every tied
    * score on one side; NTILE splits ties by doc_id to equalize
    * bucket sizes). This is the routing a production deployment runs
    * when the cutoffs must be corpus-relative rather than the fixed
    * calibration constants of [[taPplRoute]]. */
  def taPplTertilesApprox(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    // model-sized result (one row per doc): checkpoint so the scan
    // feeding the cutoff sketch and the bucketing pass runs once.
    // The partitioning is PINNED (fixed count, doc_id hash) before
    // the sketch so each partition's summary is a deterministic
    // function of the corpus, not of the session's shuffle-partition
    // conf (Verify and Bench differ) — merge order can still vary
    // with task completion, but the measured agreement slack is wide
    // (≥99.8% at every gated scale, recorded in BASELINE.md) against
    // the 99% assert (round-16 ADVICE headroom note).
    val scored = TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT,
        "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .repartition(32, col("doc_id"))
      .localCheckpoint()
    // head = top third by score: the 2/3 and 1/3 ascending
    // percentiles are the head/middle floors
    val cutsRow = scored.agg(percentile_approx(col("avg_ll"),
      array(lit(2.0 / 3.0), lit(1.0 / 3.0)), lit(10000)).as("cuts"))
      .collect()(0).getSeq[Double](0)
    val (cHi, cLo) = (cutsRow(0), cutsRow(1))
    scored
      .withColumn("nt", ntile(3).over(
        Window.orderBy(col("avg_ll").desc, col("doc_id"))))
      .withColumn("bucket",
        when(col("nt") === 1, lit("head"))
          .when(col("nt") === 2, lit("middle"))
          .otherwise(lit("tail")))
      .withColumn("bucket_approx",
        when(col("avg_ll") >= lit(cHi), lit("head"))
          .when(col("avg_ll") >= lit(cLo), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bucket_approx") === col("bucket"), 1L)
          .otherwise(0L)).as("n_agree"))
      .select(col("bucket"), col("n_docs"),
        (col("n_agree") * lit(100L) >= col("n_docs") * lit(99L))
          .as("approx_ok"))
      .orderBy(col("bucket"))
  }

  private lazy val taPplTertilesApproxSql =
    s"""SELECT bucket, COUNT(*) AS n_docs, TRUE AS approx_ok
       FROM (SELECT doc_id,
               CASE WHEN nt = 1 THEN 'head'
                    WHEN nt = 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
             FROM (SELECT doc_id,
                     NTILE(3) OVER (ORDER BY avg_ll DESC, doc_id)
                       AS nt
                   FROM ($taNgramLmKnSql) z) b) g
       GROUP BY bucket ORDER BY bucket"""

  /** The PRODUCTION slice of the corpus-relative router, benched on
    * its own (round-16 verdict #3): ONE mergeable-sketch pass for the
    * percentile_approx cutoffs, then scan-local routing against them
    * — no exact-NTILE comparator anywhere, so this gate's scale
    * exponent measures the actual 100 TB path
    * ([[taPplTertilesApprox]]'s 0.75 decade-2 exponent was its exact
    * comparator's single-task global sort, which exists only for the
    * agreement CONTRACT and stays gated at the small scales). The
    * output is contract-shaped (the q28 pattern): per approx bucket,
    * TRUE iff the bucket holds a sane tertile share (25-42% of
    * routed docs). Sketch rank error at accuracy 10⁴ is ≤0.01% and
    * cutoff tie mass is small at a 6-dp score, so the band has wide
    * headroom while still catching a broken cutoff — a degenerate
    * threshold routes nearly everything into one bucket and reds the
    * gate (a missing bucket also reds it: 3 rows expected). */
  def taPplTertilesProd(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    val scored = TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT,
        "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .repartition(32, col("doc_id"))
      .localCheckpoint()
    val cutsRow = scored.agg(percentile_approx(col("avg_ll"),
      array(lit(2.0 / 3.0), lit(1.0 / 3.0)), lit(10000)).as("cuts"))
      .collect()(0).getSeq[Double](0)
    val (cHi, cLo) = (cutsRow(0), cutsRow(1))
    val total = scored.agg(count(lit(1)).as("n_total"))
    scored
      .withColumn("bucket",
        when(col("avg_ll") >= lit(cHi), lit("head"))
          .when(col("avg_ll") >= lit(cLo), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        (col("n_docs") * lit(100L) >= col("n_total") * lit(25L) &&
          col("n_docs") * lit(100L) <= col("n_total") * lit(42L))
          .as("size_ok"))
      .orderBy(col("bucket"))
  }

  private lazy val taPplTertilesProdSql =
    """SELECT bucket, TRUE AS size_ok
       FROM (VALUES ('head'), ('middle'), ('tail')) t(bucket)
       ORDER BY bucket"""

  /** PER-LANGUAGE perplexity tertiles — the CCNet bucketing shape
    * (Wenzek et al. 2020 cut head/middle/tail PER LANGUAGE, because
    * one global cutoff would route whole low-resource languages to
    * the tail): trigram-KN document scores off the cached chain
    * ([[knChainCached]] order 3), an exact `ntile(3)` within each
    * language (ties broken by doc_id so both engines agree), and
    * per-(lang, bucket) counts + a decimal-routed score sum. Like
    * [[taPplTertiles]] this exact per-group NTILE is the semantic
    * reference — the 100 TB path replaces the per-language sort with
    * per-language `percentile_approx` cutoffs exactly as
    * [[taPplTertilesProd]] does globally (grouped sketches are one
    * mergeable aggregation, no sort). */
  def taPplLangBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = true, order = 3)
    val scored = TextAnalysis.ngramLmScoreKnChain(docs, chain,
        "text", "doc_id")
      .select(col("key").as("doc_id"), col("avg_ll"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"))
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("lang"))
          .orderBy(col("avg_ll").desc, col("doc_id"))))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("avg_ll").cast("decimal(20,6)")).cast("double")
          .as("sum_ll"))
      .orderBy(col("lang"), col("bucket"))
  }

  private lazy val taPplLangBucketsSql =
    s"""WITH j AS (
         SELECT d.lang, s.doc_id, s.avg_ll
         FROM documents d
         JOIN (SELECT * FROM ($taNgramLmKn3Sql) q) s
           ON d.doc_id = s.doc_id),
       b AS (
         SELECT lang, avg_ll,
           NTILE(3) OVER (PARTITION BY lang
                          ORDER BY avg_ll DESC, doc_id) AS bucket
         FROM j)
       SELECT lang, bucket, COUNT(*) AS n_docs,
         CAST(SUM(CAST(avg_ll AS DECIMAL(20,6))) AS DOUBLE) AS sum_ll
       FROM b GROUP BY lang, bucket ORDER BY lang, bucket"""

  /** Trained language-ID router — the fastText-style production form
    * of the heuristic [[TextAnalysis.langId]]: the proven NB
    * machinery ([[Classify]]) over CHAR-TRIGRAM features (character
    * statistics separate scripts and orthographies where word
    * features fragment), trained on the doc_id%5≠0 slice's lang
    * labels, routing the held-out slice. The oracle replays train and
    * apply end-to-end over the same char-gram extractor; LangIdSpec
    * compares accuracy against the heuristic on the same slice. */
  def taLangidNb(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val test = d.filter(col("doc_id") % 5 === 0)
    val model = Classify.nbModelFromCounts(
      Classify.charGramCounts(train, "text", "lang", n = 3))
    val priors = Classify.nbPriors(train, "lang")
    Classify.nbApplyCounts(test, model, priors,
        c => graft.functions.GraftFunctions.char_gram_counts(c, 3),
        "text", "doc_id")
      .join(test.select(col("doc_id").as("key"),
        col("lang").as("label_true")), Seq("key"))
      .select(col("key").as("doc_id"), col("label_true"),
        col("label_pred"), col("score"))
      .orderBy(col("doc_id"))
  }

  private lazy val taLangidNbSql =
    s"""WITH train AS (
         SELECT doc_id, lang AS label, lower(text) AS lt
         FROM documents WHERE doc_id % 5 <> 0),
       ctoks AS (
         SELECT label, substr(lt, CAST(i + 1 AS INT), 3) AS token
         FROM train CROSS JOIN unnest(range(length(lt) - 2)) AS r(i)
         WHERE length(lt) >= 3),
       ncounts AS (
         SELECT label, token, COUNT(*) AS cnt
         FROM ctoks GROUP BY label, token),
       nct AS (
         SELECT label, COUNT(*) AS n_tok FROM ctoks GROUP BY label),
       nvocab AS (SELECT DISTINCT token FROM ctoks),
       nv AS (SELECT COUNT(*) AS v_size FROM nvocab),
       ngrid AS (
         SELECT nct.label, nvocab.token,
           CAST(ROUND(CAST(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
                            CAST(nct.n_tok + nv.v_size AS DOUBLE))
                        AS DECIMAL(20,10)), 6)
             AS DECIMAL(20,6)) AS loglik
         FROM nvocab CROSS JOIN nct CROSS JOIN nv
         LEFT JOIN ncounts c
           ON c.label = nct.label AND c.token = nvocab.token),
       npriors AS (
         SELECT p.label,
           CAST(ROUND(CAST(ln(CAST(p.n_docs AS DOUBLE) /
                              CAST(tt.n_total AS DOUBLE))
                        AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
             AS logprior
         FROM (SELECT label, COUNT(*) AS n_docs FROM train
               GROUP BY label) p
         CROSS JOIN (SELECT COUNT(*) AS n_total FROM train) tt),
       ntest AS (
         SELECT doc_id, lang AS label_true, lower(text) AS lt
         FROM documents WHERE doc_id % 5 = 0),
       nocc AS (
         SELECT doc_id, token, COUNT(*) AS cnt FROM (
           SELECT doc_id, substr(lt, CAST(i + 1 AS INT), 3) AS token
           FROM ntest CROSS JOIN unnest(range(length(lt) - 2)) AS r(i)
           WHERE length(lt) >= 3) z
         GROUP BY doc_id, token),
       nev AS (
         SELECT o.doc_id, g.label,
           SUM(g.loglik * CAST(o.cnt AS DECIMAL(10,0))) AS ev
         FROM nocc o JOIN ngrid g USING (token)
         GROUP BY o.doc_id, g.label),
       nscored AS (
         SELECT t.doc_id, p.label,
           p.logprior + COALESCE(e.ev, CAST(0 AS DECIMAL(20,6)))
             AS score
         FROM ntest t CROSS JOIN npriors p
         LEFT JOIN nev e
           ON e.doc_id = t.doc_id AND e.label = p.label),
       nranked AS (
         SELECT doc_id, label, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, label DESC) AS rn
         FROM nscored)
       SELECT r.doc_id, t.label_true, r.label AS label_pred,
         CAST(ROUND(CAST(r.score AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS score
       FROM nranked r JOIN ntest t USING (doc_id)
       WHERE rn = 1 ORDER BY r.doc_id"""

  /** [[taLangidNb]] with the router's sufficient statistics read
    * from an at-rest count store (the NbStream layout written once:
    * char-gram `counts/` + `docs/` partials; the grid and priors
    * DERIVE from the folded counts, so the store is lossless by the
    * same argument as pp_nb_model_at_rest). Shares [[taLangidNbSql]]
    * VERBATIM — train once, route every crawl snapshot. */
  def taLangidNbAtRest(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val test = d.filter(col("doc_id") % 5 === 0)
    val root = layoutDir(dir, "documents", "langid_nb_cg3")
    ensureLayout(root) {
      Classify.charGramCounts(train, "text", "lang", n = 3)
        .write.mode("overwrite").parquet(s"$root/counts")
      Classify.docCounts(train, "lang")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/docs")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    val model = Classify.nbModelFromCounts(
      s.read.parquet(s"$root/counts"))
    val priors = Classify.nbPriorsFromCounts(
      s.read.parquet(s"$root/docs"))
    Classify.nbApplyCounts(test, model, priors,
        c => graft.functions.GraftFunctions.char_gram_counts(c, 3),
        "text", "doc_id")
      .join(test.select(col("doc_id").as("key"),
        col("lang").as("label_true")), Seq("key"))
      .select(col("key").as("doc_id"), col("label_true"),
        col("label_pred"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** Naive Bayes classification ([[Classify.nbApply]]) of the held-out
    * doc_id%5 split: per-doc argmax over
    * `logprior + Σ cnt·loglik` with exact decimal score sums; the
    * oracle replays train AND apply end-to-end. */
  def ppNbClassify(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val test = d.filter(col("doc_id") % 5 === 0)
    val model = Classify.nbModel(train, "text", "lang")
    val priors = Classify.nbPriors(train, "lang")
    Classify.nbApply(test, model, priors, "text", "doc_id")
      .join(test.select(col("doc_id").as("key"),
        col("lang").as("label_true")), Seq("key"))
      .select(col("key").as("doc_id"), col("label_true"),
        col("label_pred"), col("score"))
      .orderBy(col("doc_id"))
  }

  private lazy val ppNbClassifySql =
    s"""WITH $nbTrainCte,
       npriors AS (
         SELECT p.label,
           CAST(ROUND(CAST(ln(CAST(p.n_docs AS DOUBLE) /
                              CAST(tt.n_total AS DOUBLE))
                        AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
             AS logprior
         FROM (SELECT label, COUNT(*) AS n_docs FROM train
               GROUP BY label) p
         CROSS JOIN (SELECT COUNT(*) AS n_total FROM train) tt),
       ntest AS (
         SELECT doc_id, lang AS label_true, text FROM documents
         WHERE doc_id % 5 = 0),
       nocc AS (
         SELECT doc_id, token, COUNT(*) AS cnt
         FROM (SELECT doc_id,
                 unnest(list_filter(
                   string_split_regex(lower(text), '\\W+'),
                   x -> x <> '')) AS token
               FROM ntest) z
         GROUP BY doc_id, token),
       nev AS (
         SELECT o.doc_id, g.label,
           SUM(g.loglik * CAST(o.cnt AS DECIMAL(10,0))) AS ev
         FROM nocc o JOIN ngrid g USING (token)
         GROUP BY o.doc_id, g.label),
       nscored AS (
         SELECT t.doc_id, p.label,
           p.logprior + COALESCE(e.ev, CAST(0 AS DECIMAL(20,6)))
             AS score
         FROM ntest t CROSS JOIN npriors p
         LEFT JOIN nev e
           ON e.doc_id = t.doc_id AND e.label = p.label),
       nranked AS (
         SELECT doc_id, label, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, label DESC) AS rn
         FROM nscored)
       SELECT r.doc_id, t.label_true, r.label AS label_pred,
         CAST(ROUND(CAST(r.score AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS score
       FROM nranked r JOIN ntest t USING (doc_id)
       WHERE rn = 1 ORDER BY r.doc_id"""

  /** The NB model under RE-CRAWLS ([[graft.streaming.NbStream
    * .appendDiffBatch]]): base crawl over the original train split,
    * then one diff batch re-crawling every doc_id%7==0 document with
    * revised text — the superseded versions' counts subtract as
    * negative partials, so the folded model is bit-identical to
    * retraining on the LATEST snapshot, which is exactly what the
    * oracle replays (the [[ppNbModel]] SQL over the updated-text
    * train slice). The supersede story [[ppBm25Updated]] tells with a
    * sidecar, told in the sufficient-statistics algebra. */
  def ppNbUpdated(s: SparkSession, dir: String): DataFrame = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 5 =!= 0)
    val recrawled = train.filter(col("doc_id") % 7 === 0)
    val revised = recrawled.withColumn("text",
      concat(col("text"), lit(" [rev1]")))
    val root = layoutDir(dir, "documents", "nb_counts_upd_lang_p")
    ensureLayout(root) {
      graft.streaming.NbStream.appendBatch(train, 0L, root, "text",
        "lang")
      graft.streaming.NbStream.appendDiffBatch(recrawled, revised,
        1L, root, "text", "lang")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    nbModelReport(graft.streaming.NbStream.model(s, root))
  }

  private lazy val ppNbUpdatedSql = {
    val updatedText =
      "CASE WHEN doc_id % 7 = 0 THEN text || ' [rev1]' ELSE text END"
    s"""WITH ${nbTrainCteFor(updatedText)}
       SELECT label, token,
         CAST(ROUND(CAST(loglik AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS loglik
       FROM ngrid ORDER BY label, token"""
  }

  /** [[ppNbClassify]] with the model read from the at-rest
    * sufficient-statistics store ([[ppNbModelAtRest]]'s layout): the
    * production shape — train-time counts paid once, apply-time
    * reads derive the grid/priors from the folded counts and
    * broadcast them. Shares [[ppNbClassifySql]] VERBATIM: the stored
    * model must reproduce the inline classifier bit-for-bit. */
  def ppNbClassifyAtRest(s: SparkSession, dir: String): DataFrame =
    nbClassifiedAtRest(s, dir).orderBy(col("doc_id"))

  /** The at-rest classify frame WITHOUT the gate's total order —
    * [[ppNbEval]] aggregates it (order-insensitive), so sharing the
    * unordered form keeps the eval's checkpoint from materializing a
    * useless global sort. */
  private def nbClassifiedAtRest(s: SparkSession, dir: String)
      : DataFrame = {
    val d = t(s, dir, "documents")
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val test = d.filter(col("doc_id") % 5 === 0)
    val root = layoutDir(dir, "documents", "nb_counts_lang_p")
    ensureLayout(root) {
      graft.streaming.NbStream.appendBatch(train, 0L, root, "text",
        "lang")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    Classify.nbApply(test, graft.streaming.NbStream.model(s, root),
        graft.streaming.NbStream.priors(s, root), "text", "doc_id")
      .join(test.select(col("doc_id").as("key"),
        col("lang").as("label_true")), Seq("key"))
      .select(col("key").as("doc_id"), col("label_true"),
        col("label_pred"), col("score"))
  }

  /** Classifier evaluation report — the confusion-derived per-class
    * precision/recall every production curation pipeline publishes
    * before routing on a classifier's verdicts (the held-out eval
    * that justifies a quality/language filter's threshold). Composes
    * the AT-REST classify path (the production form): per class,
    * support (`n_true`), predicted count (`n_pred`), correct count,
    * and 6-dp-rounded precision/recall — counts are exact longs, the
    * ratios integer-exact IEEE divisions rounded through DECIMAL, so
    * the report is engine-exact. Classes appear if they occur in
    * truth OR prediction (full outer), zero-filled. O(classes)
    * output rows regardless of corpus size; the only corpus-scale
    * work is the classify pass itself. */
  def ppNbEval(s: SparkSession, dir: String): DataFrame = {
    // EAGER checkpoint: the classify DAG (test tokenization explode +
    // grid join + argmax) is consumed THREE times below; exchange
    // reuse dedupes the shuffles but re-runs every post-shuffle stage
    // per consumer (the round-19 executed plan showed 11 scans / 37
    // aggregates). The classify result is one row per TEST doc — the
    // round-10 "eager checkpoint for small shared relations" case —
    // so classify now runs once and the three per-class aggregates
    // read blocks. Re-materialized per call: nothing persists across
    // bench runs.
    val cls = nbClassifiedAtRest(s, dir).localCheckpoint()
    val perTrue = cls.groupBy(col("label_true").as("label"))
      .agg(count(lit(1)).as("n_true"))
    val perPred = cls.groupBy(col("label_pred").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    val correct = cls.filter(col("label_true") === col("label_pred"))
      .groupBy(col("label_true").as("label"))
      .agg(count(lit(1)).as("n_correct"))
    def r6(c: Column): Column =
      round(c.cast(org.apache.spark.sql.types.DecimalType(20, 10)), 6)
        .cast("double")
    perTrue.join(perPred, Seq("label"), "full_outer")
      .join(correct, Seq("label"), "left_outer")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .withColumn("prec", r6(
        when(col("n_pred") > 0, col("n_correct").cast("double") /
          col("n_pred").cast("double")).otherwise(lit(0.0))))
      .withColumn("rec", r6(
        when(col("n_true") > 0, col("n_correct").cast("double") /
          col("n_true").cast("double")).otherwise(lit(0.0))))
      .orderBy(col("label"))
  }

  private lazy val ppNbEvalSql =
    s"""WITH cls AS (SELECT * FROM ($ppNbClassifySql) c),
       pt AS (SELECT label_true AS label, COUNT(*) AS n_true
              FROM cls GROUP BY 1),
       pp AS (SELECT label_pred AS label, COUNT(*) AS n_pred
              FROM cls GROUP BY 1),
       pc AS (SELECT label_true AS label, COUNT(*) AS n_correct
              FROM cls WHERE label_true = label_pred GROUP BY 1)
       SELECT COALESCE(pt.label, pp.label) AS label,
         COALESCE(pt.n_true, 0) AS n_true,
         COALESCE(pp.n_pred, 0) AS n_pred,
         COALESCE(pc.n_correct, 0) AS n_correct,
         CAST(ROUND(CAST(CASE WHEN COALESCE(pp.n_pred, 0) > 0
             THEN CAST(COALESCE(pc.n_correct, 0) AS DOUBLE) /
                  CAST(pp.n_pred AS DOUBLE)
             ELSE 0.0 END AS DECIMAL(20,10)), 6) AS DOUBLE) AS prec,
         CAST(ROUND(CAST(CASE WHEN COALESCE(pt.n_true, 0) > 0
             THEN CAST(COALESCE(pc.n_correct, 0) AS DOUBLE) /
                  CAST(pt.n_true AS DOUBLE)
             ELSE 0.0 END AS DECIMAL(20,10)), 6) AS DOUBLE) AS rec
       FROM pt FULL OUTER JOIN pp ON pt.label = pp.label
       LEFT JOIN pc ON COALESCE(pt.label, pp.label) = pc.label
       ORDER BY label"""

  /** The shared output projection of every NB-model gate — identical
    * column shape for the inline, at-rest and incremental forms so
    * they all gate against [[ppNbModelSql]] verbatim. */
  private def nbModelReport(model: DataFrame): DataFrame =
    model.select(col("label"), col("token"),
      round(col("loglik").cast(DecimalType28_10), 6)
        .cast("double").as("loglik"))
      .orderBy(col("label"), col("token"))

  /** [[ppNbModel]] over the at-rest sufficient-statistics store
    * ([[graft.streaming.NbStream]]): the train split's token/doc
    * counts persisted once, the smoothed grid DERIVED at read — the
    * model store holds additive counts, not logliks, which is what
    * makes it incrementally maintainable. Shares [[ppNbModelSql]]
    * VERBATIM (lossless-store proof). */
  def ppNbModelAtRest(s: SparkSession, dir: String): DataFrame = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 5 =!= 0)
    val root = layoutDir(dir, "documents", "nb_counts_lang_p")
    ensureLayout(root) {
      graft.streaming.NbStream.appendBatch(train, 0L, root, "text",
        "lang")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    nbModelReport(graft.streaming.NbStream.model(s, root))
  }

  /** The NB model INCREMENTALLY maintained: the train split arriving
    * as three streamed batches, each persisting only its own additive
    * `(label, token, cnt)` / `(label, n_docs)` partials; the grid
    * derives from the folded sums. Bit-identical to retraining on
    * the union — gated against [[ppNbModelSql]] VERBATIM. */
  def ppNbIncremental(s: SparkSession, dir: String): DataFrame = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 5 =!= 0)
    val root = layoutDir(dir, "documents", "nb_counts_incr_lang_p")
    ensureLayout(root) {
      (0L to 2L).foreach { b =>
        graft.streaming.NbStream.appendBatch(
          train.filter(col("doc_id") % 3 === b), b, root, "text",
          "lang")
      }
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    nbModelReport(graft.streaming.NbStream.model(s, root))
  }

  /** Declarative data-quality validation ([[graft.pipeline.Validation]]):
    * a seven-rule Deequ-style check set over lineitem — completeness,
    * PK uniqueness, two range conformances, a pattern conformance,
    * and two mean bounds — compiled into ONE aggregation pass over
    * ONE scan (the distinct aggregate rides the same scan as a
    * two-stage pass). The report is O(rules) rows. */
  /** The algebraic (fold-from-partials) subset of the dq_checks rule
    * set — shared verbatim by the one-shot and streamed gates. */
  private def dqAlgebraicRules: Seq[graft.pipeline.Validation.Rule] = {
    import graft.pipeline.Validation._
    Seq(
      Completeness("complete_returnflag", "l_returnflag", 1.0),
      Conformance("range_quantity",
        col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0, 1.0),
      Conformance("range_discount",
        col("l_discount") >= 0.0 && col("l_discount") <= 0.08, 0.9),
      Conformance("pattern_linestatus",
        col("l_linestatus").rlike("^[A-Z]$"), 1.0),
      MeanBound("mean_quantity_floor", "l_quantity", 10.0, ">="),
      MeanBound("mean_quantity_ceiling", "l_quantity", 40.0, "<="))
  }

  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Validation._
    Validation.check(t(s, dir, "lineitem"),
      UniqueKey("key_orderkey_linenumber",
        Seq("l_orderkey", "l_linenumber"), 1.0) +: dqAlgebraicRules)
  }

  /** Streamed data-quality monitoring ([[graft.streaming.DqStream]]):
    * the algebraic dq_checks rules folded from three per-batch
    * partial rows — the report is bit-identical to the one-shot check
    * over the union, which is exactly what the shared-arithmetic
    * oracle proves (dq_checks' SQL minus the non-foldable UniqueKey
    * row). */
  def dqIncremental(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val root = layoutDir(dir, "lineitem", "dq_partials_v1")
    ensureLayout(root) {
      (0L to 2L).foreach { b =>
        graft.streaming.DqStream.appendBatch(
          li.filter(col("l_orderkey") % 3 === b), b, root,
          dqAlgebraicRules, rulesetId = "lineitem_v1")
      }
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    graft.streaming.DqStream.report(s, root, dqAlgebraicRules,
      rulesetId = "lineitem_v1")
  }

  private val dqIncrementalSql =
    """WITH m AS (
         SELECT
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(COUNT(l_returnflag) AS DOUBLE) AS c_rf,
           CAST(SUM(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0
             THEN 1 ELSE 0 END) AS DOUBLE) AS c_qty,
           CAST(SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.08
             THEN 1 ELSE 0 END) AS DOUBLE) AS c_disc,
           CAST(SUM(CASE WHEN regexp_matches(l_linestatus, '^[A-Z]$')
             THEN 1 ELSE 0 END) AS DOUBLE) AS c_ls,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
             AS s_qty
         FROM lineitem),
       rep(rule, metric, threshold, op) AS (
         SELECT 'complete_returnflag',
           CAST(ROUND(CAST(c_rf / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'range_quantity',
           CAST(ROUND(CAST(c_qty / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'range_discount',
           CAST(ROUND(CAST(c_disc / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(0.9 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'pattern_linestatus',
           CAST(ROUND(CAST(c_ls / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'mean_quantity_floor',
           CAST(ROUND(CAST(s_qty / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(10.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'mean_quantity_ceiling',
           CAST(ROUND(CAST(s_qty / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(40.0 AS DOUBLE), '<=' FROM m)
       SELECT rule, metric, threshold, op,
         CASE WHEN op = '>=' THEN metric >= threshold
              ELSE metric <= threshold END AS passed
       FROM rep ORDER BY rule"""

  private val dqChecksSql =
    """WITH m AS (
         SELECT
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(COUNT(l_returnflag) AS DOUBLE) AS c_rf,
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE)
             AS cd_key,
           CAST(SUM(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0
             THEN 1 ELSE 0 END) AS DOUBLE) AS c_qty,
           CAST(SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.08
             THEN 1 ELSE 0 END) AS DOUBLE) AS c_disc,
           CAST(SUM(CASE WHEN regexp_matches(l_linestatus, '^[A-Z]$')
             THEN 1 ELSE 0 END) AS DOUBLE) AS c_ls,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
             AS s_qty
         FROM lineitem),
       rep(rule, metric, threshold, op) AS (
         SELECT 'complete_returnflag',
           CAST(ROUND(CAST(c_rf / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'key_orderkey_linenumber',
           CAST(ROUND(CAST(cd_key / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'range_quantity',
           CAST(ROUND(CAST(c_qty / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'range_discount',
           CAST(ROUND(CAST(c_disc / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(0.9 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'pattern_linestatus',
           CAST(ROUND(CAST(c_ls / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(1.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'mean_quantity_floor',
           CAST(ROUND(CAST(s_qty / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(10.0 AS DOUBLE), '>=' FROM m
         UNION ALL SELECT 'mean_quantity_ceiling',
           CAST(ROUND(CAST(s_qty / n AS DECIMAL(28,10)), 6) AS DOUBLE),
           CAST(40.0 AS DOUBLE), '<=' FROM m)
       SELECT rule, metric, threshold, op,
         CASE WHEN op = '>=' THEN metric >= threshold
              ELSE metric <= threshold END AS passed
       FROM rep ORDER BY rule"""

  /** Leakage-safe train/eval split ([[Sampling.leakageSafeSplit]]):
    * the near-dup clusters of pp_dedup_e2e assigned ATOMICALLY to a
    * side by hashing the cluster label — no eval document has a
    * near-duplicate in train. The oracle replays the full chain:
    * banding → components → md5 split. */
  def ppSplitClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
    val pairs = Dedup.minHashCandidates(docs, "text", "doc_id")
    Sampling.leakageSafeSplit(
      Dedup.componentClusters(docs.select(col("doc_id")), "doc_id",
        pairs, "key_a", "key_b"), "component")
      .orderBy(col("doc_id"))
  }

  private lazy val ppSplitClustersSql =
    s"""WITH RECURSIVE ${minhashBandsCte(300)},
       pairs AS (
         SELECT DISTINCT a.doc_id AS va, b.doc_id AS vb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id),
       edges AS (SELECT va AS src, vb AS dst FROM pairs
                 UNION ALL SELECT vb, va FROM pairs),
       universe AS (SELECT doc_id FROM documents WHERE doc_id < 300),
       reach(node, root) AS (
         SELECT doc_id, doc_id FROM universe
         UNION
         SELECT e.dst, r.root FROM reach r JOIN edges e
           ON e.src = r.node),
       comp AS (
         SELECT node AS doc_id, MIN(root) AS component
         FROM reach GROUP BY node)
       SELECT doc_id, component,
         CASE WHEN md5(CAST(component AS VARCHAR)) < '2' THEN 'eval'
              ELSE 'train' END AS split
       FROM comp ORDER BY doc_id"""

  /** End-to-end near-dup resolution: MinHash+LSH candidate pairs →
    * connected components → one keeper per cluster — the full
    * candidate-generation → clustering → resolution chain a dedup
    * pipeline runs, with every stage scale-safe (bucketed LSH join,
    * Pregel components). The oracle replays the whole chain: the
    * dd_minhash band CTE feeding a recursive min-label CTE. */
  def ppDedupE2e(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
    val pairs = Dedup.minHashCandidates(docs, "text", "doc_id")
    Dedup.componentClusters(docs.select(col("doc_id")), "doc_id",
        pairs, "key_a", "key_b")
      .withColumn("is_keeper", col("doc_id") === col("component"))
      .orderBy(col("doc_id"))
  }

  private lazy val ppDedupE2eSql =
    s"""WITH RECURSIVE ${minhashBandsCte(300)},
       pairs AS (
         SELECT DISTINCT a.doc_id AS va, b.doc_id AS vb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id),
       edges AS (SELECT va AS src, vb AS dst FROM pairs
                 UNION ALL SELECT vb, va FROM pairs),
       universe AS (SELECT doc_id FROM documents WHERE doc_id < 300),
       reach(node, root) AS (
         SELECT doc_id, doc_id FROM universe
         UNION
         SELECT e.dst, r.root FROM reach r JOIN edges e
           ON e.src = r.node)
       SELECT node AS doc_id, MIN(root) AS component,
         node = MIN(root) AS is_keeper
       FROM reach GROUP BY node ORDER BY doc_id"""

  /** Leakage-safe train/validation split
    * ([[Dedup.leakageSafeSplit]]): deterministic `doc_id % 10` hash
    * split, then training documents that would leak a validation
    * document — same normalized fingerprint (exact) or any shared
    * MinHash LSH band bucket (near) — are marked dropped with the
    * first-matching reason. The cross-split decontamination every
    * training pipeline owes its benchmark numbers; the oracle
    * replays the fingerprint and full-corpus band chains and the
    * same precedence CASE. */
  def ppSplitDecontam(s: SparkSession, dir: String): DataFrame =
    Dedup.leakageSafeSplit(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** [[ppSplitDecontam]] against a PERSISTED val-side index
    * ([[Dedup.writeSplitValIndex]]): the benchmark/validation slice
    * is fingerprinted and banded ONCE into a stored index, and each
    * training crawl decontaminates against it — the production shape
    * (a benchmark suite changes rarely; training crawls arrive
    * continuously), the dd_contamination_at_rest precedent applied
    * to the split. MinHash and the normalized fingerprint are pure
    * functions of the text, so the stored index reproduces the
    * inline recomputation bit-for-bit and the gate shares
    * [[ppSplitDecontamSql]] VERBATIM. */
  def ppSplitDecontamAtRest(s: SparkSession, dir: String)
      : DataFrame = {
    val d = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "split_val_idx")
    ensureLayout(root) {
      Dedup.writeSplitValIndex(d.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", root)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    Dedup.leakageSafeSplitAgainst(d, "text", "doc_id", root)
      .orderBy(col("doc_id"))
  }

  private lazy val ppSplitDecontamSql =
    s"""WITH ${minhashBandsCte(Int.MaxValue)},
       fps AS (
         SELECT doc_id,
           md5(regexp_replace(lower(trim(COALESCE(text, ''))), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
         FROM documents),
       exact_leak AS (
         SELECT DISTINCT tr.doc_id
         FROM fps tr JOIN fps v ON tr.fp = v.fp
         WHERE tr.doc_id % 10 <> 0 AND v.doc_id % 10 = 0),
       near_leak AS (
         SELECT DISTINCT a.doc_id
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_hash = b.band_hash
         WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0)
       SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 0 THEN 'val'
              WHEN e.doc_id IS NOT NULL THEN 'dropped_exact'
              WHEN n.doc_id IS NOT NULL THEN 'dropped_near'
              ELSE 'train' END AS split
       FROM documents d
       LEFT JOIN exact_leak e ON d.doc_id = e.doc_id
       LEFT JOIN near_leak n ON d.doc_id = n.doc_id
       ORDER BY d.doc_id"""

  /** Transitive SemDeDup resolution — the embedding twin of
    * [[ppDedupE2e]]: within-cluster cosine pairs
    * ([[Similarity.semanticPairs]], same codebook and τ as
    * dd_semantic) feed GraphX connected components, labeling every
    * vector with its cluster representative. Chains that dd_semantic's
    * pairwise dup_of policy leaves implicit (a~b, b~c) collapse to one
    * keeper here; the oracle replays assignment, pairing, AND the
    * component closure via a recursive min-label CTE. */
  def ppSemdedupE2e(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val pairs = Similarity.semanticPairs(e, "embedding", "vec_id",
      e.filter(codebookPred(e))
        .select(col("vec_id").as("cent_id"),
          col("embedding").as("cent_vec")),
      tau = 0.35)
    Dedup.componentClusters(e.select(col("vec_id")), "vec_id",
        pairs, "key_a", "key_b")
      .withColumn("is_keeper", col("vec_id") === col("component"))
      .orderBy(col("vec_id"))
  }

  /** Unrolled min-label + pointer-jumping closure for oracle SQL —
    * replaces the `WITH RECURSIVE reach(node, root)` transitive-closure
    * CTE, whose row count is Σ component_size² and which DuckDB could
    * not finish inside the sf1 oracle timeout (the one documented SKIP
    * of round 7). Each round k takes, per node, the min of (a) its
    * label's own label (pointer jump — label chains halve, so reach
    * doubles along sorted chains) and (b) its neighbors' labels
    * (guaranteed one-hop spread per round, any id ordering). Rounds
    * rows stay O(nodes + edges) per round instead of quadratic in
    * component size. `rounds` must cover the similarity graph's
    * diameter in the worst case; non-convergence cannot pass silently —
    * unconverged labels hash-mismatch the engine's exact GraphX
    * components and the gate reports FAIL. Measured at sf1 (20 k
    * vectors, 26 804 pairs): convergence by round 8 (rounds 8 and 12
    * produce identical output; round 6 differs), each round ≈ 3 s of
    * DuckDB time on top of the ~40 s assignment+pairing replay — 14
    * rounds keeps 2⁶× doubling margin over the observed diameter while
    * holding the whole replay near 85 s quiet (240 s gate budget).
    * Expects CTEs `edges(src, dst)` (both directions) and `l0(node,
    * lab)` (identity seed) in scope; leaves `l<rounds>` as the
    * converged (node, lab) relation. */
  private def minLabelRoundsSql(rounds: Int): String =
    (1 to rounds).map { k =>
      val p = s"l${k - 1}"
      // MATERIALIZED is load-bearing: each round references the
      // previous one three times, and DuckDB's default CTE inlining
      // would re-expand the whole chain exponentially (observed as
      // "Too many open files" on the base parquet scan at 20 rounds)
      s"""l$k AS MATERIALIZED (
         SELECT p.node, LEAST(j.lab, COALESCE(nm.nlab, j.lab)) AS lab
         FROM $p p
         JOIN $p j ON j.node = p.lab
         LEFT JOIN (SELECT e.dst AS node, MIN(l.lab) AS nlab
                    FROM edges e JOIN $p l ON l.node = e.src
                    GROUP BY e.dst) nm ON nm.node = p.node)"""
    }.mkString(",\n       ")

  private lazy val ppSemdedupE2eSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM n WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       cscore AS (
         SELECT n.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(n.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (n.nrm * cent.cnrm)
             AS ccos
         FROM n CROSS JOIN cent),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM cscore) WHERE crk = 1),
       av AS (
         SELECT a.vec_id, a.cent_id, n.embedding, n.nrm
         FROM assigned a JOIN n USING (vec_id)),
       pairs AS (
         SELECT x.vec_id AS va, y.vec_id AS vb
         FROM av x JOIN av y
           ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
         WHERE (SELECT SUM(CAST(i AS DOUBLE)*CAST(j AS DOUBLE))
                FROM (SELECT unnest(x.embedding) AS i,
                             unnest(y.embedding) AS j) z)
             / (x.nrm * y.nrm) >= 0.35),
       edges AS MATERIALIZED (
         SELECT va AS src, vb AS dst FROM pairs
         UNION ALL SELECT vb, va FROM pairs),
       l0 AS MATERIALIZED (
         SELECT vec_id AS node, vec_id AS lab FROM embeddings),
       ${minLabelRoundsSql(14)}
       SELECT node AS vec_id, lab AS component,
         node = lab AS is_keeper
       FROM l14 ORDER BY vec_id"""

  /** Cross-document duplicated 5-gram fraction — the corpus-level
    * Gopher/Dolma boilerplate signal ([[TextAnalysis.crossDocDupStats]]):
    * per document, the share of its 5-gram occurrences whose gram also
    * appears in ≥2 distinct documents. Complements ta_repetition
    * (within-doc) with the across-doc view only a corpus-wide
    * aggregation can produce. */
  def taDupNgrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.crossDocDupStats(t(s, dir, "documents"), "text",
      "doc_id", n = 5, minDocs = 2)
      .orderBy(col("doc_id"))

  private val taDupNgramsSql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' ||
             tk[i+4] || ' ' || tk[i+5] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 4)) AS r(i)
         WHERE len(tk) >= 5),
       dpg AS (
         SELECT gram, COUNT(DISTINCT doc_id) AS n_docs
         FROM g GROUP BY gram)
       SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN dpg.n_docs >= 2 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_dup,
         CAST(ROUND(CAST(CAST(SUM(CASE WHEN dpg.n_docs >= 2 THEN 1
               ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS dup_frac
       FROM g JOIN dpg USING (gram)
       GROUP BY g.doc_id ORDER BY g.doc_id"""

  /** Model-apply form of the bigram LM
    * ([[TextAnalysis.scoreWithBigramModel]]): the model trains on the
    * documents corpus, then scores a DIFFERENT relation — every doc
    * with two out-of-vocabulary tokens appended, so each document
    * carries exactly two zero-probability transitions alongside its
    * in-model grams. Gates the unseen-gram (left-join + coalesce 0)
    * path the self-scoring query can never exercise; the oracle
    * replays train and apply over both relations. */
  def taBigramLmApply(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = TextAnalysis.bigramModel(docs, "text")
    // concat (not concat_ws): a NULL text must propagate NULL so the
    // doc drops out of tokenization, matching the oracle's
    // `text || ' qq7 qq7'` NULL semantics — concat_ws would skip the
    // NULL and score a phantom "qq7 qq7" document.
    val target = docs.select(col("doc_id"),
      concat(col("text"), lit(" qq7 qq7")).as("text"))
    TextAnalysis.scoreWithBigramModel(target, model, "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  private val taBigramLmApplySql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT tk[i+1] || ' ' || tk[i+2] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       pair AS (
         SELECT gram, split_part(gram, ' ', 1) AS w1,
           COUNT(*) AS c_pair
         FROM g GROUP BY gram),
       fw AS (
         SELECT w1, SUM(c_pair) AS c_first FROM pair GROUP BY w1),
       model AS (
         SELECT p.gram,
           CAST(ROUND(CAST(CAST(p.c_pair AS DOUBLE) / f.c_first
             AS DECIMAL(28,10)), 9) AS DECIMAL(18,9)) AS p9
         FROM pair p JOIN fw f ON p.w1 = f.w1),
       ttoks AS (
         SELECT doc_id,
           list_filter(string_split_regex(
             lower(text || ' qq7 qq7'), '\W+'), x -> x <> '') AS tk
         FROM documents),
       tg AS (
         SELECT doc_id, tk[i+1] || ' ' || tk[i+2] AS gram
         FROM ttoks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       occ AS (
         SELECT doc_id, gram, COUNT(*) AS occ
         FROM tg GROUP BY doc_id, gram)
       SELECT o.doc_id, CAST(SUM(o.occ) AS BIGINT) AS n_bigrams,
         CAST(ROUND(CAST(CAST(SUM(
             COALESCE(m.p9, CAST(0 AS DECIMAL(18,9)))
             * CAST(o.occ AS DECIMAL(10,0))) AS DOUBLE) / SUM(o.occ)
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS lm_score
       FROM occ o LEFT JOIN model m ON o.gram = m.gram
       GROUP BY o.doc_id ORDER BY o.doc_id"""

  /** Span-level exact-substring dedup
    * ([[TextAnalysis.exactSubstringScrub]]) — Lee et al.'s
    * suffix-array scrub in token-stream form: every 5-token window
    * occurring ≥2 times in the corpus is a duplicated span; covered
    * tokens are removed and the survivors re-joined. The oracle
    * replays gram counting, span coverage, and the per-doc rebuild
    * (including the reconstructed clean_text strings, compared
    * byte-for-byte) entirely in SQL. */
  def ddExactSubstring(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.exactSubstringScrub(t(s, dir, "documents"), "text",
      "doc_id", n = 5, minCount = 2)
      .orderBy(col("doc_id"))

  /** [[ddExactSubstring]] against the gram-span layout
    * ([[TextAnalysis.writeSpanIndex]] /
    * [[TextAnalysis.exactSubstringScrubAtRest]]): positional grams
    * and tokens read from the at-rest stores — the corpus is never
    * re-tokenized at scrub time — with the duplication threshold as
    * the query-time knob. Gated against [[ddExactSubstringSql]]
    * VERBATIM (lossless-layout proof). */
  def ddExactSubstringAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = layoutDir(dir, "documents", "spanidx_n5_b64")
    ensureLayout(root)(TextAnalysis.writeSpanIndex(
      t(s, dir, "documents"), "text", "doc_id", root, n = 5,
      buckets = 64))
    TextAnalysis.exactSubstringScrubAtRest(s, root, minCount = 2)
      .orderBy(col("doc_id"))
  }

  /** The span index INCREMENTALLY maintained
    * ([[graft.streaming.SpanStream]]): a base over a third of the
    * corpus plus two streamed delta batches, scrubbed over
    * base ∪ deltas — span coverage is a count over the union, so the
    * result is bit-identical to a full rebuild, gated against
    * [[ddExactSubstringSql]] VERBATIM. */
  private def spanIncrementalLayout(s: SparkSession, dir: String,
      root: String, marker: String)(
      maintain: => Unit): Unit = layoutLock(root).synchronized {
    val d = t(s, dir, "documents")
    val m = new java.io.File(root, marker)
    if (!m.exists()) {
      // cold marker ⇒ rebuild from scratch: an interrupted build's
      // partial delta batches would otherwise reject the replayed
      // batch 1 as a fresh-checkpoint restart (fresh-id guard)
      rmTree(new java.io.File(root))
      TextAnalysis.writeSpanIndex(d.filter(col("doc_id") % 3 === 0),
        "text", "doc_id", s"$root/base", n = 5, buckets = 64)
      graft.streaming.SpanStream.appendBatch(
        d.filter(col("doc_id") % 3 === 1), 1L, root, "text",
        "doc_id", n = 5, buckets = 64)
      graft.streaming.SpanStream.appendBatch(
        d.filter(col("doc_id") % 3 === 2), 2L, root, "text",
        "doc_id", n = 5, buckets = 64)
      maintain
      m.createNewFile(): Unit
    }
  }

  def ddExactSubstringIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = layoutDir(dir, "documents", "spanidx_incr_n5_b64")
    spanIncrementalLayout(s, dir, root, "_BUILT")(())
    graft.streaming.SpanStream.scrubIncremental(s, root, minCount = 2)
      .orderBy(col("doc_id"))
  }

  /** [[ddExactSubstringIncremental]]'s layout folded by
    * [[graft.streaming.SpanStream.compact]], then scrubbed — still
    * the inline oracle verbatim, proving compaction lossless for the
    * span tier. */
  def ddExactSubstringCompacted(s: SparkSession, dir: String): DataFrame = {
    val root = layoutDir(dir, "documents", "spanidx_cpt_n5_b64")
    spanIncrementalLayout(s, dir, root, "_COMPACTED")(
      graft.streaming.SpanStream.compact(s, root))
    graft.streaming.SpanStream.scrubIncremental(s, root, minCount = 2)
      .orderBy(col("doc_id"))
  }

  private val ddExactSubstringSql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       tpos AS (
         SELECT doc_id, i AS pos, tk[i+1] AS tok
         FROM toks CROSS JOIN unnest(range(len(tk))) AS r(i)),
       g AS (
         SELECT doc_id, i AS start,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' ||
             tk[i+4] || ' ' || tk[i+5] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 4)) AS r(i)
         WHERE len(tk) >= 5),
       dup AS (
         SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
       cov AS (
         SELECT DISTINCT g.doc_id, g.start + j AS pos
         FROM g JOIN dup USING (gram)
         CROSS JOIN unnest(range(5)) AS s(j)),
       cnt AS (
         SELECT doc_id, COUNT(*) AS n_tokens FROM tpos GROUP BY doc_id),
       rem AS (
         SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id),
       kept AS (
         SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos)
           AS clean_text
         FROM tpos t
         WHERE NOT EXISTS (SELECT 1 FROM cov c
           WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
         GROUP BY t.doc_id)
       SELECT cnt.doc_id, CAST(cnt.n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(rem.n_removed, 0) AS BIGINT) AS n_removed,
         COALESCE(kept.clean_text, '') AS clean_text
       FROM cnt LEFT JOIN rem USING (doc_id)
         LEFT JOIN kept USING (doc_id)
       ORDER BY doc_id"""

  /** Corpus-trained word-bigram LM quality score
    * ([[TextAnalysis.bigramLmScore]]) — the CCNet-style
    * perplexity-proxy: MLE transition probabilities trained on the
    * corpus itself, each document scored by the mean probability of
    * its bigrams. The oracle replays training and scoring entirely in
    * SQL over the same tokenizer. */
  def taBigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScore(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id"))

  private val taBigramLmSql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk
         FROM documents),
       g AS (
         SELECT doc_id, tk[i+1] || ' ' || tk[i+2] AS gram
         FROM toks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       occ AS (
         SELECT doc_id, gram, COUNT(*) AS occ
         FROM g GROUP BY doc_id, gram),
       pair AS (
         SELECT gram, split_part(gram, ' ', 1) AS w1,
           SUM(occ) AS c_pair
         FROM occ GROUP BY gram),
       fw AS (
         SELECT w1, SUM(c_pair) AS c_first FROM pair GROUP BY w1)
       SELECT o.doc_id, CAST(SUM(o.occ) AS BIGINT) AS n_bigrams,
         CAST(ROUND(CAST(CAST(SUM(
             CAST(ROUND(CAST(CAST(p.c_pair AS DOUBLE) / f.c_first
               AS DECIMAL(28,10)), 9) AS DECIMAL(18,9))
             * CAST(o.occ AS DECIMAL(10,0))) AS DOUBLE) / SUM(o.occ)
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS lm_score
       FROM occ o JOIN pair p USING (gram) JOIN fw f ON p.w1 = f.w1
       GROUP BY o.doc_id ORDER BY o.doc_id"""

  /** The shared smoothed-LM oracle: JM-interpolated bigram LM
    * (p = 0.9·p_ML + 0.1·p_uni, both constants LITERAL doubles in
    * both engines, ln 6-dp-quantized at birth — the Classify.dlog
    * contract) trained on `trainSel`, scoring EVERY document's
    * bigrams with unigram backoff for unseen bigrams and both-OOV
    * drop. */
  private def ngramLmSql(trainSel: String): String =
    s"""WITH train AS ($trainSel),
       ttk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM train),
       uni AS (
         SELECT w, COUNT(*) AS c_w FROM (
           SELECT unnest(tk) AS w FROM ttk) z GROUP BY w),
       tot AS (SELECT SUM(c_w) AS n_total FROM uni),
       tg AS (
         SELECT tk[i+1] || ' ' || tk[i+2] AS gram
         FROM ttk CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       pair AS (
         SELECT gram, split_part(gram, ' ', 1) AS w1,
           split_part(gram, ' ', 2) AS w2, COUNT(*) AS c_pair
         FROM tg GROUP BY gram),
       fw AS (SELECT w1, SUM(c_pair) AS c_first FROM pair GROUP BY w1),
       grid2 AS (
         SELECT p.gram,
           CAST(ROUND(CAST(ln(
             CAST(0.9 AS DOUBLE) * (CAST(p.c_pair AS DOUBLE) /
               CAST(f.c_first AS DOUBLE)) +
             CAST(0.1 AS DOUBLE) * (CAST(u.c_w AS DOUBLE) /
               CAST(t.n_total AS DOUBLE)))
             AS DECIMAL(20,10)), 6) AS DECIMAL(20,6)) AS ll
         FROM pair p JOIN fw f USING (w1)
         JOIN uni u ON u.w = p.w2 CROSS JOIN tot t),
       grid1 AS (
         SELECT u.w,
           CAST(ROUND(CAST(ln(
             CAST(0.1 AS DOUBLE) * (CAST(u.c_w AS DOUBLE) /
               CAST(t.n_total AS DOUBLE)))
             AS DECIMAL(20,10)), 6) AS DECIMAL(20,6)) AS ll1
         FROM uni u CROSS JOIN tot t),
       dtk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM documents),
       docc AS (
         SELECT doc_id, tk[i+1] || ' ' || tk[i+2] AS gram
         FROM dtk CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       scored AS (
         SELECT o.doc_id, COALESCE(g2.ll, g1.ll1) AS ll_eff
         FROM docc o
         LEFT JOIN grid2 g2 USING (gram)
         LEFT JOIN grid1 g1 ON g1.w = split_part(o.gram, ' ', 2)
         WHERE COALESCE(g2.ll, g1.ll1) IS NOT NULL)
       SELECT doc_id, COUNT(*) AS n_scored,
         CAST(ROUND(CAST(CAST(SUM(ll_eff) AS DOUBLE) / COUNT(*)
           AS DECIMAL(20,10)), 6) AS DOUBLE) AS avg_ll
       FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** Jelinek-Mercer smoothed bigram LM quality scorer
    * ([[TextAnalysis.ngramLmSmoothedModel]]) — the production
    * corpus-filter form [[taBigramLm]] proxies: trained on ⅔ of the
    * corpus, scoring ALL documents, so held-out documents exercise
    * the unigram backoff (the smoothing [[taBigramLm]]'s
    * unseen-gram-scores-0 proxy lacks). */
  def taNgramLmSmoothed(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (g2, g1) = TextAnalysis.ngramLmSmoothedModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    TextAnalysis.ngramLmScoreSmoothed(docs, g2, g1, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmSmoothedSql = ngramLmSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0")

  /** [[taNgramLmSmoothed]] with the model derived from the
    * [[graft.streaming.NgramLmStream]] sufficient-statistics store —
    * two streamed batches folded, bit-identical to the one-shot
    * trainer; shares [[taNgramLmSmoothedSql]] VERBATIM. */
  def taNgramLmAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = lmCountsRoot(s, dir)
    val (g2, g1) = graft.streaming.NgramLmStream.model(s, root)
    TextAnalysis.ngramLmScoreSmoothed(docs, g2, g1, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** The smoothed LM under RE-CRAWLS: base crawl plus one diff batch
    * revising every doc_id%7==0 train document — superseded versions
    * subtract as negative partials, so the folded model is
    * bit-identical to retraining on the LATEST snapshot, which the
    * oracle replays ([[ppNbUpdated]]'s contract on the LM tier). */
  def taNgramLmUpdated(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = lmCountsUpdRoot(s, dir)
    val (g2, g1) = graft.streaming.NgramLmStream.model(s, root)
    TextAnalysis.ngramLmScoreSmoothed(docs, g2, g1, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmUpdatedSql = ngramLmSql(
    """SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' [rev1]'
              ELSE text END AS text
       FROM documents WHERE doc_id % 3 <> 0""")

  /** The Kneser-Ney oracle: discounted seen-bigram mass + λ·p_cont
    * interpolation, every probability exact-IEEE double arithmetic
    * over integer counts (discount 0.75 LITERAL on both engines), ln
    * dlog-quantized — seen bigrams from the grid, unseen compose
    * λ(w1)·p_cont(w2) in the scoring join, unseen-w1 falls to
    * p_cont(w2), unseen-w2 drops. */
  private def ngramLmKnSql(trainSel: String): String =
    s"""WITH train AS ($trainSel),
       ttk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM train),
       tg AS (
         SELECT tk[i+1] || ' ' || tk[i+2] AS gram
         FROM ttk CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       knpair AS (
         SELECT gram, split_part(gram, ' ', 1) AS w1,
           split_part(gram, ' ', 2) AS w2, COUNT(*) AS c_pair
         FROM tg GROUP BY gram),
       kntypes AS (SELECT COUNT(*) AS n_types FROM knpair),
       knlam AS (
         SELECT w1, SUM(c_pair) AS c_first,
           CAST(0.75 AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) /
             CAST(SUM(c_pair) AS DOUBLE)) AS lam
         FROM knpair GROUP BY w1),
       kncont AS (
         SELECT w2 AS w, CAST(COUNT(*) AS DOUBLE) /
           CAST(t.n_types AS DOUBLE) AS pcont
         FROM knpair CROSS JOIN kntypes t GROUP BY w2, t.n_types),
       kngrid AS (
         SELECT p.gram,
           CAST(ROUND(CAST(ln(
             (GREATEST(CAST(p.c_pair AS DOUBLE) - CAST(0.75 AS DOUBLE),
                CAST(0 AS DOUBLE)) / CAST(l.c_first AS DOUBLE))
             + (l.lam * c.pcont))
             AS DECIMAL(20,10)), 6) AS DECIMAL(20,6)) AS ll
         FROM knpair p JOIN knlam l USING (w1)
         JOIN kncont c ON c.w = p.w2),
       dtk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM documents),
       docc AS (
         SELECT doc_id, tk[i+1] || ' ' || tk[i+2] AS gram
         FROM dtk CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       knsc AS (
         SELECT o.doc_id,
           CASE WHEN g.ll IS NOT NULL THEN g.ll
                WHEN l.lam IS NOT NULL AND c.pcont IS NOT NULL THEN
                  CAST(ROUND(CAST(ln(l.lam * c.pcont)
                    AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
                WHEN c.pcont IS NOT NULL THEN
                  CAST(ROUND(CAST(ln(c.pcont)
                    AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
                ELSE NULL END AS ll_eff
         FROM docc o
         LEFT JOIN kngrid g USING (gram)
         LEFT JOIN knlam l ON l.w1 = split_part(o.gram, ' ', 1)
         LEFT JOIN kncont c ON c.w = split_part(o.gram, ' ', 2))
       SELECT doc_id, COUNT(*) AS n_scored,
         CAST(ROUND(CAST(CAST(SUM(ll_eff) AS DOUBLE) / COUNT(*)
           AS DECIMAL(20,10)), 6) AS DOUBLE) AS avg_ll
       FROM knsc WHERE ll_eff IS NOT NULL
       GROUP BY doc_id ORDER BY doc_id"""

  /** Interpolated Kneser-Ney scorer ([[TextAnalysis.ngramLmKnModel]])
    * — the production LM-filter smoothing, same ⅔-train / score-all
    * split as [[taNgramLmSmoothed]] so held-out documents exercise
    * both backoff tiers. */
  def taNgramLmKn(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT, "text",
        "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmKnSql = ngramLmKnSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0")

  /** [[taNgramLmKn]] with the model derived from the SAME
    * [[graft.streaming.NgramLmStream]] count store the JM gate folds
    * — one sufficient-statistics store serves both smoothing
    * families (KN's continuation/fan-out/type counts are distinct-row
    * counts over the folded pair table). Shares [[taNgramLmKnSql]]
    * VERBATIM. */
  def taNgramLmKnAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = lmCountsRoot(s, dir)
    // upToN=2: prune the n=1..5 store below the fold (see
    // taPplRouteAtRest)
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      graft.streaming.NgramLmStream.foldedCountsOf(s, root,
        upToN = 2))
    TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT, "text",
        "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** The SHARED n-gram sufficient-statistics store, maxN=5: built
    * once under the layout cache as two streamed
    * [[graft.streaming.NgramLmStream]] batches over the ⅔-train
    * split. ONE `(n, gram, cnt)` store serves every smoothing family
    * and order — JM and bigram-KN filter n≤2, the trigram KN/MKN
    * chains derive from the n=3 rows, the 5-gram chain from n=5. */
  private def lmCountsRoot(s: SparkSession, dir: String): String = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 3 =!= 0)
    val root = layoutDir(dir, "documents", "ngram_lm_counts_n5")
    ensureLayout(root) {
      graft.streaming.NgramLmStream.appendBatch(
        train.filter(col("doc_id") % 2 === 0), 0L, root, "text",
        maxN = 5)
      graft.streaming.NgramLmStream.appendBatch(
        train.filter(col("doc_id") % 2 === 1), 1L, root, "text",
        maxN = 5)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    root
  }

  /** Build-once cache of a DERIVED KN chain under the layout
    * discipline (round-16): the grid/λ/backoff tables are a pure
    * function of the training counts and the (order, modifiedTop,
    * minTopCount) parameters, and the r15 bench measured a
    * persisted-chain apply at ~2.4× cheaper than rebuild-per-call —
    * so each KN-family gate derives its chain ONCE per surface run
    * ([[TextAnalysis.writeKnChainModel]]) and every later call reads
    * the persisted form, exactly what a production deployment does
    * (KenLM trains once, binarizes, applies many). `fromStore`
    * selects the training source: the shared [[lmCountsRoot]] fold
    * (the at-rest path, pruned to `upToN = order` so the order
    * filter reaches the store scan), the re-crawl-superseded
    * [[lmCountsUpdRoot]] fold (`updated` — itself deterministic, so
    * the chain derived from it is cacheable content like any other),
    * or a fresh fused corpus scan ([[TextAnalysis.ngramLmCounts]]
    * minN = order — keeps the inline count kernel in the gated
    * surface). The layoutDir name encodes every parameter (the
    * content-change rule: a chain trained differently is different
    * content). Round-16 routes the ORDER-3 family through this too —
    * the five trigram gates were re-deriving ~1-1.5 s of identical
    * chain per call. */
  private def knChainCached(s: SparkSession, dir: String,
      modifiedTop: Boolean, minTopCount: Long, fromStore: Boolean,
      boundary: Boolean = false, order: Int = 5,
      updated: Boolean = false): TextAnalysis.KnChain = {
    // fail fast on parameter combinations no source store can serve:
    // the updated store is unpadded, and the boundary store carries
    // only n=5 rows — silently training the wrong chain under a
    // layout name claiming otherwise would be served forever
    require(!(updated && boundary),
      "knChainCached: no boundary-padded updated store exists")
    require(!boundary || order == 5,
      s"knChainCached: the boundary store holds only n=5 rows " +
        s"(got order=$order)")
    // resolve the SOURCE count store first (building it if cold) and
    // stamp its max committed batch id into the chain layout name:
    // the chain is a pure function of the source FOLD, and
    // ensureLayout trusts the sentinel — without the stamp, a batch
    // appended to the source store after the chain was cached would
    // silently keep serving the stale chain forever (round-16
    // advice: the layout-content rule applied to DERIVED layouts).
    // The inline path derives from the corpus itself, which is fixed
    // per testdata dir — nothing to stamp.
    val srcRoot =
      if (updated) Some(lmCountsUpdRoot(s, dir))
      else if (fromStore && boundary) Some(lmCountsBosRoot(s, dir))
      else if (fromStore) Some(lmCountsRoot(s, dir))
      else None
    val wm = srcRoot.map(r => s"_w${maxCommittedBatch(r)}")
      .getOrElse("")
    val base =
      s"kn_chain_n${order}_m${if (modifiedTop) 1 else 0}" +
        s"_p$minTopCount" +
        s"_${if (updated) "u" else if (fromStore) "s" else "i"}" +
        (if (boundary) "_b" else "")
    val root = layoutDir(dir, "documents", base + wm)
    ensureLayout(root) {
      // reap superseded sibling chains: every source-store append
      // mints a new _w<N> directory and ensureLayout only wipes its
      // own root, so stale derived chains would otherwise accumulate
      // under the tmp layout root indefinitely. Anchor the match on
      // "_w" right after the FULL base so a chain whose base is a
      // prefix of another's (e.g. `_s` vs `_s_b`) is never reaped.
      if (wm.nonEmpty) {
        Option(new java.io.File(root).getParentFile.listFiles())
          .toSeq.flatten
          .filter(f => f.getName.startsWith(base + "_w") &&
            f.getName != base + wm)
          .foreach(rmTree)
      }
      val counts = srcRoot match {
        case Some(r) if boundary =>
          graft.streaming.NgramLmStream.foldedCountsOf(s, r)
        case Some(r) =>
          graft.streaming.NgramLmStream.foldedCountsOf(s, r,
            upToN = order)
        case None => TextAnalysis.ngramLmCounts(
          t(s, dir, "documents").filter(col("doc_id") % 3 =!= 0),
          "text", maxN = order, minN = order, boundary = boundary)
      }
      TextAnalysis.writeKnChainModel(
        if (modifiedTop)
          TextAnalysis.ngramLmMknChainModel(counts, order)
        else TextAnalysis.ngramLmKnChainModel(counts, order,
          minTopCount),
        root)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    TextAnalysis.readKnChainModel(s, root, order, modifiedTop,
      minTopCount)
  }

  /** The BOUNDARY-PADDED 5-gram count store
    * ([[TextAnalysis.wordNgramsBounded]] — `<s>`/`</s>` markers, the
    * KenLM/CCNet sentence-boundary convention, round-16 verdict #4).
    * A DIFFERENT gram stream than [[lmCountsRoot]]'s at every order,
    * hence its own layout name (content-change rule). minN=5: the
    * boundary chain derives entirely from its top-order rows, so the
    * store carries only them. */
  private def lmCountsBosRoot(s: SparkSession, dir: String): String = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 3 =!= 0)
    val root = layoutDir(dir, "documents", "ngram_lm_counts_bos_n5")
    ensureLayout(root) {
      graft.streaming.NgramLmStream.appendBatch(
        train.filter(col("doc_id") % 2 === 0), 0L, root, "text",
        maxN = 5, minN = 5, boundary = true)
      graft.streaming.NgramLmStream.appendBatch(
        train.filter(col("doc_id") % 2 === 1), 1L, root, "text",
        maxN = 5, minN = 5, boundary = true)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    root
  }

  /** The re-crawl twin of [[lmCountsRoot]]: base crawl plus one diff
    * batch revising every doc_id%7==0 train document — superseded
    * versions subtract as negative partials at EVERY order, so the
    * folded store is bit-identical to re-counting the latest
    * snapshot (including the trigram tier's distinct-row
    * continuation counts, which only stay exact because zero cells
    * DROP). */
  private def lmCountsUpdRoot(s: SparkSession, dir: String): String = {
    val train = t(s, dir, "documents")
      .filter(col("doc_id") % 3 =!= 0)
    val recrawled = train.filter(col("doc_id") % 7 === 0)
    val revised = recrawled.withColumn("text",
      concat(col("text"), lit(" [rev1]")))
    val root = layoutDir(dir, "documents", "ngram_lm_counts_upd_n3")
    ensureLayout(root) {
      graft.streaming.NgramLmStream.appendBatch(train, 0L, root,
        "text", maxN = 3)
      graft.streaming.NgramLmStream.appendDiffBatch(recrawled,
        revised, 1L, root, "text", maxN = 3)
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    root
  }

  /** Trigram interpolated Kneser-Ney scorer
    * ([[TextAnalysis.ngramLmKnChainModel]] at order 3) — the order
    * production CCNet-style corpus filters start at, same ⅔-train /
    * score-all split so held-out documents exercise all three
    * backoff tiers. The chain is derived once per surface run and
    * read back from the layout cache ([[knChainCached]] at
    * order 3). */
  def taNgramLmKn3(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = false, order = 3)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmKn3Sql = ngramLmKnChainSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0", 3)

  /** [[taNgramLmKn3]] off the SHARED [[lmCountsRoot]] store — the
    * fold already carries n=3 partials, so the trigram chain derives
    * from the same at-rest statistics the bigram families fold.
    * Shares [[taNgramLmKn3Sql]] VERBATIM. */
  def taNgramLmKn3AtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = true, order = 3)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** The trigram KN under RE-CRAWLS ([[lmCountsUpdRoot]]): the
    * negative-partial supersede must keep the DISTINCT-ROW adjusted
    * counts exact — a superseded trigram whose folded count hits
    * zero DROPS, so every left-extension type count matches a
    * retrain on the latest snapshot, which the oracle replays. */
  def taNgramLmKn3Updated(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = true, order = 3,
      updated = true)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmKn3UpdatedSql = ngramLmKnChainSql(
    """SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' [rev1]'
              ELSE text END AS text
       FROM documents WHERE doc_id % 3 <> 0""", 3)

  /** The generic interpolated-KN-chain oracle — the
    * [[TextAnalysis.ngramLmKnChainModel]] recursion unrolled to SQL
    * for ANY top order: per-level adjusted-count CTEs (each a
    * distinct-row count over the level above), per-level λ and raw-
    * probability tables, and an apply CASE whose nested COALESCE
    * backoff mirrors the Spark scorer expression for expression. */
  private def ngramLmKnChainSql(trainSel: String, order: Int,
      modifiedTop: Boolean = false, minTopCount: Long = 1L,
      boundary: Boolean = false): String = {
    val n = order
    def words(c: String, from: Int, to: Int): String =
      (from to to).map(i => s"split_part($c, ' ', $i)")
        .mkString(" || ' ' || ")
    val gramExpr = (1 to n).map(i => s"tk[i+$i]").mkString(" || ' ' || ")
    // boundary twin: the token list is padded with n-1 '<s>' markers
    // and one '</s>' (DuckDB || is list concat) — the gram CTEs
    // downstream are unchanged, they just see the longer list
    val tkExpr =
      if (!boundary)
        """list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '')"""
      else Seq.fill(n - 1)("'<s>'").mkString("[", ", ", "]") +
        """ || list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') || ['</s>']"""
    def dlogSql(x: String): String =
      s"CAST(ROUND(CAST(ln($x) AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))"
    val adjCtes = ((n - 1) to 2 by -1).map { k =>
      if (k == n - 1)
        s"""adj$k AS (
           SELECT suf AS gramk, COUNT(*) AS c_adj
           FROM top GROUP BY suf)"""
      else
        s"""adj$k AS (
           SELECT ${words("gramk", 2, k + 1)} AS gramk,
             COUNT(*) AS c_adj
           FROM adj${k + 1} GROUP BY 1)"""
    }
    val lamCtes = (2 to (n - 1)).map { k =>
      s"""lam$k AS (
         SELECT ${words("gramk", 1, k - 1)} AS ctxk,
           SUM(c_adj) AS n_mid,
           CAST(0.75 AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) /
             CAST(SUM(c_adj) AS DOUBLE)) AS lamk
         FROM adj$k GROUP BY 1)"""
    }
    val pCtes = (2 to (n - 1)).map { k =>
      val (lowJoin, lowVal) =
        if (k == 2)
          (s"cont c ON c.w = split_part(a.gramk, ' ', $k)", "c.pcont")
        else
          (s"p${k - 1} c ON c.gramk = ${words("a.gramk", 2, k)}",
            "c.pk")
      s"""p$k AS (
         SELECT a.gramk,
           (GREATEST(CAST(a.c_adj AS DOUBLE) - CAST(0.75 AS DOUBLE),
              CAST(0 AS DOUBLE)) / CAST(l.n_mid AS DOUBLE))
             + (l.lamk * $lowVal) AS pk
         FROM adj$k a
         JOIN lam$k l ON l.ctxk = ${words("a.gramk", 1, k - 1)}
         JOIN $lowJoin)"""
    }
    val applyJoins = (2 to (n - 1)).map { k =>
      s"""LEFT JOIN p$k pj$k
           ON pj$k.gramk = ${words("o.gram", n - k + 1, n)}
         LEFT JOIN lam$k lj$k
           ON lj$k.ctxk = ${words("o.gram", n - k + 1, n - 1)}"""
    }.mkString("\n         ")
    val lamTopCte =
      if (!modifiedTop)
        """lamtop AS (
         SELECT ctx, SUM(c_top) AS c_ctx,
           CAST(0.75 AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) /
             CAST(SUM(c_top) AS DOUBLE)) AS lam
         FROM top GROUP BY ctx)"""
      else
        """mkcoc AS (
         SELECT SUM(CASE WHEN c_top = 1 THEN 1 ELSE 0 END) AS n1,
           SUM(CASE WHEN c_top = 2 THEN 1 ELSE 0 END) AS n2,
           SUM(CASE WHEN c_top = 3 THEN 1 ELSE 0 END) AS n3,
           SUM(CASE WHEN c_top = 4 THEN 1 ELSE 0 END) AS n4
         FROM top),
       mkdiscr AS (
         SELECT
           CASE WHEN n1 > 0 THEN
             CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) *
               (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) +
                 CAST(2 AS DOUBLE) * CAST(n2 AS DOUBLE))) *
               (CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))
           ELSE CAST(0.75 AS DOUBLE) END AS d1r,
           CASE WHEN n1 > 0 AND n2 > 0 THEN
             CAST(2 AS DOUBLE) - CAST(3 AS DOUBLE) *
               (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) +
                 CAST(2 AS DOUBLE) * CAST(n2 AS DOUBLE))) *
               (CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE))
           ELSE CAST(0.75 AS DOUBLE) END AS d2r,
           CASE WHEN n1 > 0 AND n3 > 0 THEN
             CAST(3 AS DOUBLE) - CAST(4 AS DOUBLE) *
               (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) +
                 CAST(2 AS DOUBLE) * CAST(n2 AS DOUBLE))) *
               (CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE))
           ELSE CAST(0.75 AS DOUBLE) END AS d3r
         FROM mkcoc),
       mkdisc AS (
         SELECT
           CASE WHEN d1r > CAST(0 AS DOUBLE) THEN d1r
                ELSE CAST(0.75 AS DOUBLE) END AS d1,
           CASE WHEN d2r > CAST(0 AS DOUBLE) THEN d2r
                ELSE CAST(0.75 AS DOUBLE) END AS d2,
           CASE WHEN d3r > CAST(0 AS DOUBLE) THEN d3r
                ELSE CAST(0.75 AS DOUBLE) END AS d3
         FROM mkdiscr),
       lamtop AS (
         SELECT ctx, c_ctx, d1, d2, d3,
           (d1 * CAST(nc1 AS DOUBLE) + d2 * CAST(nc2 AS DOUBLE) +
             d3 * CAST(nc3p AS DOUBLE)) / CAST(c_ctx AS DOUBLE)
             AS lam
         FROM (SELECT ctx, SUM(c_top) AS c_ctx,
                 SUM(CASE WHEN c_top = 1 THEN 1 ELSE 0 END) AS nc1,
                 SUM(CASE WHEN c_top = 2 THEN 1 ELSE 0 END) AS nc2,
                 SUM(CASE WHEN c_top >= 3 THEN 1 ELSE 0 END) AS nc3p
               FROM top GROUP BY ctx) g CROSS JOIN mkdisc)"""
    val gridDiscSql =
      if (!modifiedTop) "CAST(0.75 AS DOUBLE)"
      else """(CASE WHEN t.c_top = 1 THEN x.d1
                      WHEN t.c_top = 2 THEN x.d2
                      ELSE x.d3 END)"""
    val peff = (3 to (n - 1)).foldLeft(
      "COALESCE(pj2.pk, lj2.lamk * cj.pcont, cj.pcont)") { (low, k) =>
      s"COALESCE(pj$k.pk, lj$k.lamk * $low, $low)"
    }
    s"""WITH train AS ($trainSel),
       ttk AS (
         SELECT doc_id, $tkExpr AS tk
         FROM train),
       tgn AS (
         SELECT $gramExpr AS gram
         FROM ttk CROSS JOIN unnest(range(len(tk) - ${n - 1}))
           AS r(i)
         WHERE len(tk) >= $n),
       top AS (
         SELECT gram, ${words("gram", 1, n - 1)} AS ctx,
           ${words("gram", 2, n)} AS suf, COUNT(*) AS c_top
         FROM tgn GROUP BY gram),
       $lamTopCte,
       ${adjCtes.mkString(",\n       ")},
       types2 AS (SELECT COUNT(*) AS n_types FROM adj2),
       cont AS (
         SELECT split_part(gramk, ' ', 2) AS w,
           CAST(COUNT(*) AS DOUBLE) / CAST(t.n_types AS DOUBLE)
             AS pcont
         FROM adj2 CROSS JOIN types2 t GROUP BY 1, t.n_types),
       ${lamCtes.mkString(",\n       ")},
       ${pCtes.mkString(",\n       ")},
       grid AS (
         SELECT t.gram,
           ${dlogSql(s"""(GREATEST(CAST(t.c_top AS DOUBLE) - $gridDiscSql,
                CAST(0 AS DOUBLE)) / CAST(x.c_ctx AS DOUBLE))
             + (x.lam * p.pk)""")} AS ll
         FROM top t JOIN lamtop x ON x.ctx = t.ctx
         JOIN p${n - 1} p ON p.gramk = t.suf
         WHERE t.c_top >= $minTopCount),
       dtk AS (
         SELECT doc_id, $tkExpr AS tk
         FROM documents),
       docc AS (
         SELECT doc_id, $gramExpr AS gram
         FROM dtk CROSS JOIN unnest(range(len(tk) - ${n - 1}))
           AS r(i)
         WHERE len(tk) >= $n),
       sc AS (
         SELECT o.doc_id,
           CASE WHEN g.ll IS NOT NULL THEN g.ll
                WHEN x.lam IS NOT NULL AND $peff IS NOT NULL THEN
                  ${dlogSql(s"x.lam * $peff")}
                WHEN $peff IS NOT NULL THEN
                  ${dlogSql(peff)}
                ELSE NULL END AS ll_eff
         FROM docc o
         LEFT JOIN grid g USING (gram)
         LEFT JOIN lamtop x ON x.ctx = ${words("o.gram", 1, n - 1)}
         $applyJoins
         LEFT JOIN cont cj ON cj.w = split_part(o.gram, ' ', $n))
       SELECT doc_id, COUNT(*) AS n_scored,
         CAST(ROUND(CAST(CAST(SUM(ll_eff) AS DOUBLE) / COUNT(*)
           AS DECIMAL(20,10)), 6) AS DOUBLE) AS avg_ll
       FROM sc WHERE ll_eff IS NOT NULL
       GROUP BY doc_id ORDER BY doc_id"""
  }

  /** 5-gram interpolated Kneser-Ney — the order the production
    * CCNet/KenLM corpus filters actually ship, over the generalized
    * chain ([[TextAnalysis.ngramLmKnChainModel]]); same ⅔-train /
    * score-all split. Documents shorter than five tokens have no
    * 5-gram and drop, on both engines. Round-16: the chain is
    * trained once from the fused corpus scan and CACHED
    * ([[knChainCached]]) — rebuild-per-call was ~37 s of the r15
    * bench across the family; the r13-discipline layout cache cuts
    * each apply to the persisted-chain cost. */
  def taNgramLmKn5(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = false)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmKn5Sql = ngramLmKnChainSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0", 5)

  /** [[taNgramLmKn5]] off the SHARED [[lmCountsRoot]] store (the
    * fold carries n=1..5 partials — one store, every order), the
    * chain itself cached at rest: the FULL at-rest loop — counts
    * streamed once, chain derived once, every apply a model read.
    * Shares [[taNgramLmKn5Sql]] VERBATIM. */
  def taNgramLmKn5AtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = true)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** 5-gram MODIFIED Kneser-Ney — KenLM's out-of-the-box model
    * (lmplz defaults: order 5, modified discounting): the generalized
    * chain with the count-of-count discounts at the top order, same
    * split and contract as [[taNgramLmKn5]]. */
  def taNgramLmMkn5(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = true,
      minTopCount = 1L, fromStore = false)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmMkn5Sql = ngramLmKnChainSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0", 5,
    modifiedTop = true)

  /** [[taNgramLmMkn5]] off the SHARED [[lmCountsRoot]] store, chain
    * cached at rest ([[knChainCached]]). Shares [[taNgramLmMkn5Sql]]
    * VERBATIM. */
  def taNgramLmMkn5AtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = true,
      minTopCount = 1L, fromStore = true)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** [[taNgramLmKn5]] with the top-order grid PRUNED at count ≥ 2
    * (KenLM's --prune): singleton 5-grams — the bulk of the type
    * inventory — are deleted from the apply-side model and their
    * queries fall to the backoff tier; λ and denominators stay
    * derived from the full counts, so this is entry deletion, not a
    * retrain. The oracle replays the same grid filter. */
  def taNgramLmKn5Pruned(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 2L, fromStore = false)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmKn5PrunedSql = ngramLmKnChainSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0", 5,
    modifiedTop = false, minTopCount = 2L)

  /** [[taNgramLmKn5]] scored off a PERSISTED chain model
    * ([[TextAnalysis.writeKnChainModel]] — the KenLM-binary analog):
    * the derived grid/λ/backoff tables written once under the layout
    * cache, every apply reading them back instead of re-deriving
    * from counts. Parquet round-trips the decimals and doubles
    * exactly, so this shares [[taNgramLmKn5Sql]] VERBATIM — the
    * lossless-store proof on the LM tier. Since round 16 the WHOLE
    * kn5 family rides this path ([[knChainCached]]); this gate and
    * [[taNgramLmKn5AtRest]] deliberately share the store-built cache
    * root — it was this gate's 2.4× r15 measurement that motivated
    * the collapse, and it stays registered as the family's
    * explicitly-validated read-back contract. */
  def taNgramLmKn5ModelAtRest(s: SparkSession,
      dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = true)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** [[taNgramLmKn5]] trained and scored with SENTENCE BOUNDARIES
    * (round-16 verdict #4): KenLM/CCNet condition the first words of
    * a document on `<s>` context and predict `</s>`, so production
    * perplexities diverge from unpadded ones exactly on short
    * documents — the ones a perplexity filter most often rules on.
    * The chain trains off the boundary-padded count store
    * ([[lmCountsBosRoot]]) and is cached like the rest of the family;
    * scoring explodes the SAME padded gram stream. The oracle is the
    * generic chain replay over padded token arrays — every document
    * now scores (len+1 grams ≥ 1), so the n_scored column itself
    * proves the padding happened on both engines. */
  def taNgramLmKn5Bos(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = false,
      minTopCount = 1L, fromStore = true, boundary = true)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id",
        boundary = true)
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmKn5BosSql = ngramLmKnChainSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0", 5,
    boundary = true)

  /** C4 cleaning heuristics ([[TextAnalysis.c4Clean]]) — line-level
    * rewrite + page-level drop, replayed string-op for string-op. */
  def taC4Clean(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.c4Clean(
        t(s, dir, "documents").withColumn("text",
          TextAnalysis.normalizeText(col("text"))), "text", "doc_id")
      .orderBy(col("doc_id"))

  private lazy val taC4CleanSql =
    "WITH src AS (SELECT doc_id, " +
      normalizeSqlExpr("COALESCE(text, '')") +
      " AS text FROM documents)," +
    """
       d AS (
         SELECT doc_id,
           list_filter(string_split(text, chr(10)), l ->
             (ends_with(l, '.') OR ends_with(l, '!')
               OR ends_with(l, '?') OR ends_with(l, '"'))
             AND len(list_filter(
               string_split_regex(lower(l), '\W+'),
               t -> t <> '')) >= 3
             AND NOT contains(lower(l), 'javascript')) AS kept
         FROM src),
       c AS (
         SELECT doc_id,
           COALESCE(array_to_string(kept, chr(10)), '') AS cleaned,
           CAST(len(kept) AS BIGINT) AS n_lines_kept
         FROM d),
       m AS (
         SELECT doc_id, cleaned, n_lines_kept,
           CAST((len(cleaned) -
             len(regexp_replace(cleaned, '\.', '', 'g')))
             / 1 AS BIGINT)
           + CAST((len(cleaned) -
               len(regexp_replace(cleaned, '!', '', 'g')))
             / 1 AS BIGINT)
           + CAST((len(cleaned) -
               len(regexp_replace(cleaned, '\?', '', 'g')))
             / 1 AS BIGINT) AS n_sentences
         FROM c)
       SELECT doc_id, cleaned, n_lines_kept, n_sentences,
         n_sentences >= 5
           AND NOT contains(lower(cleaned), 'lorem ipsum')
           AND NOT contains(cleaned, '{')
           AND NOT len(list_filter(
             list_filter(string_split_regex(lower(cleaned), '\W+'),
               t -> t <> ''),
             t -> t = 'badwordplaceholder')) > 0 AS keep
       FROM m ORDER BY doc_id"""

  /** The DuckDB twin of [[TextAnalysis.normalizeText]] — the same
    * six-step chain over `$col`, built from chr() codepoints so the
    * oracle SQL stays pure ASCII (control chars and curly quotes in
    * a JSON-dumped literal are asking for trouble). Keep in lockstep
    * with the Spark expression. */
  private def normalizeSqlExpr(col: String): String =
    s"""trim(regexp_replace(regexp_replace(regexp_replace(replace(
         translate($col,
           chr(8216)||chr(8217)||chr(8220)||chr(8221)||chr(8211)||
             chr(8212)||chr(160),
           chr(39)||chr(39)||chr(34)||chr(34)||'--'||chr(32)),
         chr(8230), '...'),
         '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
         '[ \\t]+', ' ', 'g'),
         ' ?\\n ?', chr(10), 'g'))"""

  /** Corpus-wide boilerplate scrub
    * ([[TextAnalysis.boilerplateScrub]]): lines whose normalized
    * fingerprint occurs more than twice across the whole corpus are
    * deleted from every document — the cross-document rewrite the
    * per-page C4/Gopher batteries can't express. The templated
    * synthetic corpus repeats its scaffold lines heavily, so the
    * gate produces real drops at every scale; the oracle replays the
    * explode → hot-set → keep-join → ordered string_agg chain and
    * the full scrubbed text is hashed, so line order and blank-line
    * preservation are both proven. */
  def taBoilerplate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.boilerplateScrub(t(s, dir, "documents"), "text",
        "doc_id")
      .orderBy(col("doc_id"))

  /** The line-fingerprint count store behind the at-rest boilerplate
    * gates: two streamed [[graft.streaming.LineStream]] batches over
    * the corpus — additive `(lf, cnt)` partials whose fold is
    * bit-identical to the one-shot corpus count. */
  private def boilerplateCountsRoot(s: SparkSession,
      dir: String): String = {
    val d = t(s, dir, "documents")
    val root = layoutDir(dir, "documents", "boilerplate_lf_counts")
    ensureLayout(root) {
      graft.streaming.LineStream.appendBatch(
        d.filter(col("doc_id") % 2 === 0), 0L, root, "text")
      graft.streaming.LineStream.appendBatch(
        d.filter(col("doc_id") % 2 === 1), 1L, root, "text")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    root
  }

  /** [[taBoilerplate]] against the persisted hot-line store
    * ([[graft.streaming.LineStream]]) — the production shape: the
    * corpus-wide line-fingerprint counts are maintained at rest
    * (additive partials, re-crawl supersede as subtraction) and each
    * scrub pass reads the hot set instead of recounting the corpus,
    * so the scrub is ONE corpus scan instead of two. Shares
    * [[taBoilerplateSql]] VERBATIM: the folded hot set must
    * reproduce the inline scrub bit-for-bit. */
  def taBoilerplateAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = boilerplateCountsRoot(s, dir)
    TextAnalysis.boilerplateScrubAgainst(t(s, dir, "documents"),
        graft.streaming.LineStream.hotSet(s, root, maxRepeats = 2L),
        "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** [[taBoilerplateAtRest]] under RE-CRAWLS: the store first sees a
    * STALE version of every doc_id%7==0 document (its text plus a
    * repeated banner line that would register as boilerplate if it
    * survived), then a diff batch supersedes them — the stale
    * versions' line counts subtract as negative partials, so the
    * folded hot set is bit-identical to recounting the latest
    * snapshot (which is exactly the corpus) and the gate shares
    * [[taBoilerplateSql]] VERBATIM. A leftover stale count would
    * either mint a phantom hot line (the banner) or inflate a real
    * line's count past the threshold — both hash-visible in the full
    * scrubbed text. */
  def taBoilerplateUpdated(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val recrawled = d.filter(col("doc_id") % 7 === 0)
    val stale = recrawled.withColumn("text",
      concat(lit("PHANTOM BANNER LINE\n"), col("text")))
    val root = layoutDir(dir, "documents", "boilerplate_lf_upd")
    ensureLayout(root) {
      graft.streaming.LineStream.appendBatch(
        d.filter(col("doc_id") % 7 =!= 0), 0L, root, "text")
      graft.streaming.LineStream.appendBatch(stale, 1L, root, "text")
      graft.streaming.LineStream.appendDiffBatch(stale, recrawled,
        2L, root, "text")
      new java.io.File(root, "_SUCCESS").createNewFile(): Unit
    }
    TextAnalysis.boilerplateScrubAgainst(d,
        graft.streaming.LineStream.hotSet(s, root, maxRepeats = 2L),
        "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taBoilerplateSql =
    s"""WITH ls AS (
         SELECT doc_id,
           unnest(string_split(COALESCE(text, ''), chr(10))) AS line,
           unnest(range(len(string_split(COALESCE(text, ''), chr(10)))))
             AS pos
         FROM documents),
       lf AS (
         SELECT doc_id, pos, line,
           regexp_matches(line, '^[ \\t\\x0B\\f\\r]*$$') AS blank,
           md5(regexp_replace(lower(trim(line)),
             '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
         FROM ls),
       hot AS (
         SELECT fp FROM lf WHERE NOT blank
         GROUP BY fp HAVING COUNT(*) > 2),
       k AS (
         SELECT l.doc_id, l.pos, l.line,
           (l.blank OR h.fp IS NULL) AS keep
         FROM lf l LEFT JOIN hot h ON l.fp = h.fp)
       SELECT doc_id,
         COALESCE(string_agg(line, chr(10) ORDER BY pos)
           FILTER (WHERE keep), '') AS scrubbed,
         COUNT(*) FILTER (WHERE NOT keep) AS n_dropped
       FROM k GROUP BY doc_id ORDER BY doc_id"""

  /** Dirty-document normalization ([[TextAnalysis.normalizeText]])
    * driver-gated char-for-char. The synthetic corpus is already
    * clean, so every 7th document is prefixed with a deterministic
    * dirty snippet (the ta_pii injection precedent) exercising every
    * battery step — curly quotes, em dash, ellipsis, NBSP, a C0
    * control, doubled spaces, a tab, space-padded line breaks —
    * replayed via chr() codepoints in the oracle. `changed` proves
    * each step fired (and that clean documents pass through
    * untouched). */
  def taNormalize(s: SparkSession, dir: String): DataFrame = {
    val dirty = "\u201CQuoted\u201D \u2014 it\u2019s " +
      "\u2026\u00A0here\u0001 \t twice  spaced \n  padded line\n"
    val src = t(s, dir, "documents").withColumn("raw",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(dirty), col("text"))).otherwise(col("text")))
    src.select(col("doc_id"),
        TextAnalysis.normalizeText(col("raw")).as("normalized"),
        (TextAnalysis.normalizeText(col("raw")) =!= col("raw"))
          .as("changed"))
      .orderBy(col("doc_id"))
  }

  private lazy val taNormalizeSql = {
    val dirtyExpr = "chr(8220)||'Quoted'||chr(8221)||' '||" +
      "chr(8212)||' it'||chr(8217)||'s '||chr(8230)||chr(160)||" +
      "'here'||chr(1)||' '||chr(9)||' twice  spaced '||chr(10)||" +
      "'  padded line'||chr(10)"
    s"""WITH src AS (
         SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN $dirtyExpr || text
                ELSE text END AS raw
         FROM documents)
       SELECT doc_id, ${normalizeSqlExpr("raw")} AS normalized,
         (${normalizeSqlExpr("raw")} <> raw) AS changed
       FROM src ORDER BY doc_id"""
  }

  /** Gopher quality rules ([[TextAnalysis.gopherRules]]) — the
    * Rae et al. 2021 production filter battery, one scan-local pass,
    * every ratio an integer cross-multiplication. Since round 16 the
    * battery runs over NORMALIZED text ([[TextAnalysis.normalizeText]]
    * — the order production pipelines actually apply them in; the
    * oracle replays the same normalization inside its src CTE). */
  def taGopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(
        t(s, dir, "documents").withColumn("text",
          TextAnalysis.normalizeText(col("text"))), "text",
        "doc_id")
      .orderBy(col("doc_id"))

  private lazy val taGopherRulesSql =
    "WITH src AS (SELECT doc_id, " +
      normalizeSqlExpr("COALESCE(text, '')") +
      " AS text FROM documents)," +
    """
       d AS (
         SELECT doc_id, text,
           list_filter(string_split_regex(lower(text), '\W+'),
             x -> x <> '') AS tk,
           string_split(text, chr(10)) AS ln
         FROM src),
       m AS (
         SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(tk, x -> len(x))),
             0) AS BIGINT) AS n_chars,
           CAST(len(list_filter(tk,
             x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
           CAST((len(text) - len(regexp_replace(text, '#', '', 'g')))
             / 1 AS BIGINT)
             + CAST((len(text) -
                 len(regexp_replace(text, '\.\.\.', '', 'g')))
               / 3 AS BIGINT) AS n_sym,
           CAST(len(list_intersect(list_distinct(tk),
             ['the','be','to','of','and','that','have','with']))
             AS BIGINT) AS n_stop,
           CAST(len(ln) AS BIGINT) AS n_lines,
           CAST(len(list_filter(ln, l -> starts_with(l, '-')
             OR starts_with(l, '*') OR starts_with(l, '•')))
             AS BIGINT) AS n_bullet,
           CAST(len(list_filter(ln, l -> ends_with(l, '...')))
             AS BIGINT) AS n_ellip,
           CAST(len(list_distinct(ln)) AS BIGINT) AS n_dlines
         FROM d),
       f AS (
         SELECT doc_id, n_words,
           n_words >= 50 AND n_words <= 100000 AS f_wc,
           3 * n_words <= n_chars AND n_chars <= 10 * n_words
             AS f_mwl,
           10 * n_sym <= n_words AS f_sym,
           5 * n_alpha >= 4 * n_words AS f_alpha,
           n_stop >= 2 AS f_stop,
           10 * n_bullet <= 9 * n_lines AS f_bullet,
           10 * n_ellip <= 3 * n_lines AS f_ellip,
           10 * (n_lines - n_dlines) <= 3 * n_lines AS f_dupline
         FROM m)
       SELECT doc_id, n_words, f_wc, f_mwl, f_sym, f_alpha, f_stop,
         f_bullet, f_ellip, f_dupline,
         f_wc AND f_mwl AND f_sym AND f_alpha AND f_stop AND
           f_bullet AND f_ellip AND f_dupline AS keep
       FROM f ORDER BY doc_id"""

  /** The Stupid-Backoff oracle — raw-count ratio tiers with literal
    * 0.4 multipliers, replayed over the same tokenize/gram CTEs. */
  private def ngramLmSbSql(trainSel: String): String =
    s"""WITH train AS ($trainSel),
       ttk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM train),
       sb1 AS (
         SELECT tk[i+1] AS gram
         FROM ttk CROSS JOIN unnest(range(len(tk))) AS r(i)
         WHERE len(tk) >= 1),
       uni AS (SELECT gram AS w, COUNT(*) AS c1 FROM sb1 GROUP BY 1),
       tot AS (SELECT SUM(c1) AS n_total FROM uni),
       sb2 AS (
         SELECT tk[i+1] || ' ' || tk[i+2] AS gram
         FROM ttk CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)
         WHERE len(tk) >= 2),
       bi AS (SELECT gram, COUNT(*) AS c2 FROM sb2 GROUP BY gram),
       sb3 AS (
         SELECT tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM ttk CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       tri AS (SELECT gram, COUNT(*) AS c3 FROM sb3 GROUP BY gram),
       g3 AS (
         SELECT t.gram,
           CAST(t.c3 AS DOUBLE) / CAST(b.c2 AS DOUBLE) AS s3
         FROM tri t JOIN bi b
           ON b.gram = split_part(t.gram, ' ', 1) || ' ' ||
             split_part(t.gram, ' ', 2)),
       g2 AS (
         SELECT b.gram AS suf,
           CAST(b.c2 AS DOUBLE) / CAST(u.c1 AS DOUBLE) AS s2
         FROM bi b JOIN uni u ON u.w = split_part(b.gram, ' ', 1)),
       g1 AS (
         SELECT u.w, CAST(u.c1 AS DOUBLE) /
           CAST(t.n_total AS DOUBLE) AS s1
         FROM uni u CROSS JOIN tot t),
       dtk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\W+'),
             x -> x <> '') AS tk
         FROM documents),
       docc AS (
         SELECT doc_id,
           tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS gram
         FROM dtk CROSS JOIN unnest(range(len(tk) - 2)) AS r(i)
         WHERE len(tk) >= 3),
       sbsc AS (
         SELECT o.doc_id,
           CASE WHEN g3.s3 IS NOT NULL THEN
                  CAST(ROUND(CAST(ln(g3.s3)
                    AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
                WHEN g2.s2 IS NOT NULL THEN
                  CAST(ROUND(CAST(ln(CAST(0.4 AS DOUBLE) * g2.s2)
                    AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
                WHEN g1.s1 IS NOT NULL THEN
                  CAST(ROUND(CAST(ln(CAST(0.4 AS DOUBLE) *
                    CAST(0.4 AS DOUBLE) * g1.s1)
                    AS DECIMAL(20,10)), 6) AS DECIMAL(20,6))
                ELSE NULL END AS ll_eff
         FROM docc o
         LEFT JOIN g3 USING (gram)
         LEFT JOIN g2 ON g2.suf =
           split_part(o.gram, ' ', 2) || ' ' || split_part(o.gram, ' ', 3)
         LEFT JOIN g1 ON g1.w = split_part(o.gram, ' ', 3))
       SELECT doc_id, COUNT(*) AS n_scored,
         CAST(ROUND(CAST(CAST(SUM(ll_eff) AS DOUBLE) / COUNT(*)
           AS DECIMAL(20,10)), 6) AS DOUBLE) AS avg_ll
       FROM sbsc WHERE ll_eff IS NOT NULL
       GROUP BY doc_id ORDER BY doc_id"""

  /** Stupid-Backoff scorer ([[TextAnalysis.ngramLmSbModel]]) — the
    * web-scale distributed LM scheme, same split and contract as the
    * KN gates. */
  def taNgramLmSb(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (g3, g2, g1) = TextAnalysis.ngramLmSbModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text", maxN = 3))
    TextAnalysis.ngramLmScoreSb(docs, g3, g2, g1, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmSbSql = ngramLmSbSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0")

  /** [[taNgramLmSb]] off the SHARED [[lmCountsRoot]] store — Stupid
    * Backoff's "model" IS the raw count tables, so the at-rest path
    * is the scheme's natural habitat. Shares [[taNgramLmSbSql]]
    * VERBATIM. */
  def taNgramLmSbAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = lmCountsRoot(s, dir)
    val (g3, g2, g1) = TextAnalysis.ngramLmSbModel(
      graft.streaming.NgramLmStream.foldedCountsOf(s, root,
        upToN = 3))
    TextAnalysis.ngramLmScoreSb(docs, g3, g2, g1, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Modified Kneser-Ney scorer
    * ([[TextAnalysis.ngramLmMknChainModel]] at order 3) — the
    * KenLM/SRILM-default discounting at the trigram order, same
    * split, scoring contract, and chain cache as
    * [[taNgramLmKn3]]. */
  def taNgramLmMkn(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = true,
      minTopCount = 1L, fromStore = false, order = 3)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  private lazy val taNgramLmMknSql = ngramLmKnChainSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0", 3,
    modifiedTop = true)

  /** [[taNgramLmMkn]] off the SHARED [[lmCountsRoot]] store — the
    * count-of-count statistics n1..n4 are themselves derived from
    * the folded additive counts, so the at-rest path is bit-identical
    * to the one-shot trainer. Shares [[taNgramLmMknSql]] VERBATIM. */
  def taNgramLmMknAtRest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chain = knChainCached(s, dir, modifiedTop = true,
      minTopCount = 1L, fromStore = true, order = 3)
    TextAnalysis.ngramLmScoreKnChain(docs, chain, "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** SemDeDup-style semantic dedup over the full embeddings table
    * ([[Similarity.semanticDedup]]): the same deterministic codebook as
    * ann_ivf_topk (the sqrt-sized [[codebookPred]] subset), τ = 0.35
    * (the corpus max
    * cosine is ~0.51, so the threshold separates planted near-dups
    * from background). The oracle replays centroid assignment,
    * within-cluster pairing, and keeper resolution entirely in SQL. */
  def ddSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.semanticDedup(e, "embedding", "vec_id",
      e.filter(codebookPred(e))
        .select(col("vec_id").as("cent_id"),
          col("embedding").as("cent_vec")),
      tau = 0.35)
      .orderBy(col("vec_id"))
  }

  private lazy val ddSemanticSql =
    s"""WITH n AS (
         SELECT vec_id, embedding,
           sqrt((SELECT SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
                 FROM (SELECT unnest(embedding) AS x) u)) AS nrm
         FROM embeddings),
       cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
                FROM n WHERE vec_id % 50 = 0
                  AND vec_id < $codebookCapSql),
       cscore AS (
         SELECT n.vec_id, cent.cent_id,
           (SELECT SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
            FROM (SELECT unnest(n.embedding) AS x,
                         unnest(cent.cemb) AS y) z) / (n.nrm * cent.cnrm)
             AS ccos
         FROM n CROSS JOIN cent),
       assigned AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
           FROM cscore) WHERE crk = 1),
       av AS (
         SELECT a.vec_id, a.cent_id, n.embedding, n.nrm
         FROM assigned a JOIN n USING (vec_id)),
       dup AS (
         SELECT y.vec_id AS vec_id, MIN(x.vec_id) AS dup_of
         FROM av x JOIN av y
           ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
         WHERE (SELECT SUM(CAST(i AS DOUBLE)*CAST(j AS DOUBLE))
                FROM (SELECT unnest(x.embedding) AS i,
                             unnest(y.embedding) AS j) z)
             / (x.nrm * y.nrm) >= 0.35
         GROUP BY y.vec_id)
       SELECT a.vec_id, a.cent_id, d.dup_of
       FROM assigned a LEFT JOIN dup d USING (vec_id)
       ORDER BY a.vec_id"""

  /** SemDeDup over the at-rest IVF index
    * ([[Similarity.semanticDedupAssigned]]): the cluster assignment —
    * the n^1.5 build that dominates dd_semantic's scaling — is
    * written once as a cent_id-partitioned layout
    * ([[PartitionedAnn.writeIvfPartitioned]] over the FULL table) and
    * dedup passes read it back, paying only the within-cluster
    * pairing. Gated against ddSemantic's oracle VERBATIM — the same
    * replay proving both paths compute the same thing is the proof
    * the at-rest layout is lossless (the dd_contamination_bloom
    * pattern). */
  def ddSemanticAtRest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val out = annLayoutDir(dir, "ivf_all_sqrt50")
    ensureLayout(out)(PartitionedAnn.writeIvfPartitioned(
      e, "embedding", "vec_id", centroids, out))
    Similarity.semanticDedupAssigned(s.read.parquet(out), "vec_id",
      tau = 0.35)
      .orderBy(col("vec_id"))
  }

  /** [[ddSemanticAtRest]] over the INCREMENTALLY-maintained layout
    * ([[graft.streaming.IvfStream]]): base over a third of the
    * embeddings, two streamed delta batches for the rest (same fixed
    * codebook — deterministic assignment), SemDeDup pairing over
    * base ∪ deltas — the SAME oracle SQL verbatim, proving streamed
    * maintenance composes with semantic dedup losslessly (the last
    * at-rest consumer without an incremental gate). */
  def ddSemanticIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val root = annLayoutDir(dir, "ivf_all_incr_sqrt50")
    val m = new java.io.File(root, "_DELTAS_DONE")
    if (!m.exists()) {
      PartitionedAnn.writeIvfPartitioned(
        e.filter(col("vec_id") % 3 === 0), "embedding", "vec_id",
        centroids, s"$root/base")
      graft.streaming.IvfStream.appendBatch(
        e.filter(col("vec_id") % 3 === 1), 1L, root, centroids,
        "embedding", "vec_id")
      graft.streaming.IvfStream.appendBatch(
        e.filter(col("vec_id") % 3 === 2), 2L, root, centroids,
        "embedding", "vec_id")
      m.createNewFile(): Unit
    }
    Similarity.semanticDedupAssigned(
        graft.streaming.IvfStream.layout(s, root), "vec_id",
        tau = 0.35)
      .orderBy(col("vec_id"))
  }

  /** Transitive SemDeDup over the at-rest IVF index — the e2e twin of
    * [[ddSemanticAtRest]]: where [[ppSemdedupE2e]] rebuilds codebook +
    * assignment per run (the n^1.5 stage that dominated its sf10 time,
    * 96 s median), this form reads the cent_id-partitioned layout
    * ([[PartitionedAnn.writeIvfPartitioned]], written once and shared
    * with dd_semantic_at_rest) and pays only within-cluster pairing +
    * GraphX components. Gated against ppSemdedupE2e's oracle VERBATIM:
    * the same replay hash-matching both paths is the proof the at-rest
    * division of labor loses nothing. */
  def ppSemdedupAtRest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroids = e.filter(codebookPred(e))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val out = annLayoutDir(dir, "ivf_all_sqrt50")
    ensureLayout(out)(PartitionedAnn.writeIvfPartitioned(
      e, "embedding", "vec_id", centroids, out))
    val pairs = Similarity.semanticPairsAssigned(
      s.read.parquet(out), tau = 0.35)
    Dedup.componentClusters(e.select(col("vec_id")), "vec_id",
        pairs, "key_a", "key_b")
      .withColumn("is_keeper", col("vec_id") === col("component"))
      .orderBy(col("vec_id"))
  }

  /** PII detect + redact round-trip ([[TextAnalysis.redactPii]]). The
    * synthetic corpus is PII-free word soup, so the query plants
    * deterministic synthetic PII (an email for even doc_ids, an IPv4
    * for multiples of 3, a +-prefixed phone for multiples of 5) and
    * both engines must agree on every per-class count AND on the md5
    * of the redacted text — the byte-exact proof that extraction and
    * replacement behave identically under Java regex and RE2. */
  def taPii(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val did = col("doc_id").cast("string")
    val email = when(col("doc_id") % 2 === 0,
      concat(lit(" contact user"), did, lit("@example.com")))
      .otherwise(lit(""))
    val ip = when(col("doc_id") % 3 === 0,
      concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string")))
      .otherwise(lit(""))
    val phone = when(col("doc_id") % 5 === 0,
      concat(lit(" call +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    d.withColumn("itext", concat(col("text"), email, ip, phone))
      .select(col("doc_id"),
        TextAnalysis.piiCount(col("itext"),
          TextAnalysis.piiEmailPattern).as("n_email"),
        TextAnalysis.piiCount(col("itext"),
          TextAnalysis.piiIpv4Pattern).as("n_ip"),
        TextAnalysis.piiCount(col("itext"),
          TextAnalysis.piiPhonePattern).as("n_phone"),
        md5(TextAnalysis.redactPii(col("itext"))).as("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  private val taPiiSql =
    """WITH inj AS (
         SELECT doc_id, text ||
           (CASE WHEN doc_id % 2 = 0 THEN ' contact user' ||
              CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) ||
           (CASE WHEN doc_id % 3 = 0 THEN ' from 10.' ||
              CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
              CAST(doc_id % 100 AS VARCHAR) ELSE '' END) ||
           (CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' ||
              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END) AS itext
         FROM documents)
       SELECT doc_id,
         CAST(len(regexp_extract_all(itext,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(itext,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
           AS BIGINT) AS n_ip,
         CAST(len(regexp_extract_all(itext, '\+\d[\d-]{6,}\d'))
           AS BIGINT) AS n_phone,
         md5(regexp_replace(regexp_replace(regexp_replace(itext,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\+\d[\d-]{6,}\d', '<PHONE>', 'g')) AS redacted_hash
       FROM inj ORDER BY doc_id"""

  // --- multimodal -----------------------------------------------

  /** Binary-column pipeline summary: synthetic assets → partition-wise
    * decode/featurize (stub codec) → per-asset frame counts + content
    * hash. The hash and frame arithmetic are oracle-checkable; the
    * float features are exercised in ScalaTest. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.featureTable(s, t(s, dir, "documents"))
      .groupBy(col("asset_id"), col("modality"))
      .agg(count(lit(1)).as("n_frames"), max(col("byte_len")).as("byte_len"),
        max(col("content_hash")).as("content_hash"))
      .orderBy(col("asset_id"))

  private val mmFeaturesSql =
    """SELECT doc_id AS asset_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
            ELSE LEAST(4, GREATEST(1, n_chars * 10 // 1000)) END AS BIGINT)
         AS n_frames,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       md5(text) AS content_hash
       FROM documents WHERE text IS NOT NULL ORDER BY asset_id"""

  /** REAL image decode, oracle-verified from first principles: 24
    * deterministic PNGs (solid colors + gradients with analytically
    * known channel means — [[Multimodal.fixturePng]]) are encoded
    * distributed, decoded through `javax.imageio`
    * ([[Multimodal.ImageIoCodec]]), and the decoded width/height/
    * channels/means must equal what DuckDB recomputes from `range()`
    * and the generator formulas alone. A wrong decode (or a lossy
    * encode) hash-mismatches — nothing here is stubbed. */
  /** Perceptual image hashing ([[Multimodal.dHashParts]]): 24 REAL
    * 9×8 PNG fixtures decoded through javax.imageio into 64-bit
    * difference hashes (4×16-bit parts). The fixture construction
    * ([[Multimodal.fixtureDHashPng]]) makes every hash bit an
    * analytic function of the asset id, so the oracle recomputes the
    * signatures from `range()` and the generator formulas alone —
    * a real decode verified from first principles, the
    * mm_decode/mm_audio_decode pattern. */
  def mmDhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.dHashTable(s, 24)
      .orderBy(col("asset_id"), col("part"))

  private val mmDhashSql =
    """WITH bits AS (
         SELECT i, CAST(x + y*8 AS INT) AS pos,
           CASE WHEN i >= 18 AND (x + y*8) = i % 64
             THEN 1 - bb ELSE bb END AS bit
         FROM (
           SELECT i, x, y,
             CASE WHEN ((3*x + 5*y + 7*(i % 6)) % 8) < 4
               THEN 1 ELSE 0 END AS bb
           FROM range(24) t(i)
           CROSS JOIN range(8) xs(x) CROSS JOIN range(8) ys(y)))
       SELECT CAST(i AS BIGINT) AS asset_id,
         CAST(pos // 16 AS INT) AS part,
         CAST(SUM(bit * (1::BIGINT << CAST(pos % 16 AS INT)))
           AS BIGINT) AS sig
       FROM bits GROUP BY asset_id, part
       ORDER BY asset_id, part"""

  /** Banded near-dup image pairs over the dHash signatures
    * ([[Multimodal.dHashPairs]]): pigeonhole candidates (any 16-bit
    * part equal — complete for Hamming ≤ 3) + exact candidate-only
    * Hamming verify. The oracle does the all-pairs comparison the
    * engine provably avoids — identical results = banding lost
    * nothing at this radius. */
  def mmDhashPairs(s: SparkSession, dir: String): DataFrame =
    Multimodal.dHashPairs(Multimodal.dHashTable(s, 24), maxHamming = 3)

  private val mmDhashPairsSql =
    """WITH bits AS (
         SELECT i, CAST(x + y*8 AS INT) AS pos,
           CASE WHEN i >= 18 AND (x + y*8) = i % 64
             THEN 1 - bb ELSE bb END AS bit
         FROM (
           SELECT i, x, y,
             CASE WHEN ((3*x + 5*y + 7*(i % 6)) % 8) < 4
               THEN 1 ELSE 0 END AS bb
           FROM range(24) t(i)
           CROSS JOIN range(8) xs(x) CROSS JOIN range(8) ys(y))),
       parts AS (
         SELECT CAST(i AS BIGINT) AS asset_id,
           CAST(pos // 16 AS INT) AS part,
           CAST(SUM(bit * (1::BIGINT << CAST(pos % 16 AS INT)))
             AS BIGINT) AS sig
         FROM bits GROUP BY asset_id, part)
       SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         CAST(SUM(bit_count(xor(a.sig, b.sig))) AS INT) AS hamming
       FROM parts a JOIN parts b
         ON a.part = b.part AND a.asset_id < b.asset_id
       GROUP BY id_a, id_b
       HAVING SUM(bit_count(xor(a.sig, b.sig))) <= 3
       ORDER BY id_a, id_b"""

  def mmDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeTable(s, 24)

  private val mmDecodeSql =
    """SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(16 + (i % 8) * 4 AS INT) AS width,
       CAST(12 + (i % 5) * 4 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CASE WHEN i % 3 = 0
            THEN CAST(16 + (i % 8) * 4 - 1 AS DOUBLE) / 2
            ELSE CAST((37 * i) % 256 AS DOUBLE) END AS mean_r,
       CASE WHEN i % 3 = 0
            THEN CAST(16 + (i % 8) * 4 - 1 AS DOUBLE) / 2
            ELSE CAST((59 * i) % 256 AS DOUBLE) END AS mean_g,
       CASE WHEN i % 3 = 0
            THEN CAST(16 + (i % 8) * 4 - 1 AS DOUBLE) / 2
            ELSE CAST((83 * i) % 256 AS DOUBLE) END AS mean_b
       FROM range(24) t(i) ORDER BY asset_id"""

  /** REAL audio decode, oracle-verified from first principles: 24
    * deterministic WAVs (1-2 channels, 1-3 s, constant amplitude per
    * one-second window — [[Multimodal.fixtureWav]]) are encoded
    * distributed, decoded through `javax.sound.sampled`
    * ([[Multimodal.WavCodec]]), and the decoded rate/channels/window
    * size/mean amplitude must equal what DuckDB recomputes from
    * `range()` and the generator formulas alone. PCM is lossless, so
    * a wrong decode hash-mismatches — nothing here is stubbed. */
  def mmAudioDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioDecodeTable(s, 24)

  private val mmAudioDecodeSql =
    """SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(k AS INT) AS frame_index,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 + i % 2 AS INT) AS channels,
       CAST(8000 * (1 + i % 2) AS INT) AS n_samples,
       CAST(((31 * i + 17 * k) % 200 - 100) * 100 AS DOUBLE) AS mean_amp
       FROM range(24) t(i), range(3) s(k) WHERE k < 1 + i % 3
       ORDER BY asset_id, frame_index"""

  /** REAL video-frame decode, oracle-verified from first principles:
    * 24 deterministic animated GIFs (1-4 solid-color frames each —
    * [[Multimodal.fixtureGif]]) are encoded distributed, frame-
    * sampled through `javax.imageio`'s GIF reader
    * ([[Multimodal.GifCodec]]), and the decoded dims/frame count/
    * per-channel means must equal what DuckDB recomputes from
    * `range()` and the generator formulas alone. GIF's palette
    * encoding is lossless, so a wrong decode hash-mismatches —
    * nothing here is stubbed. */
  def mmVideoDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoDecodeTable(s, 24)

  private val mmVideoDecodeSql =
    """SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(k AS INT) AS frame_index,
       CAST(16 + (i % 4) * 4 AS INT) AS width,
       CAST(12 + (i % 3) * 4 AS INT) AS height,
       CAST(1 + i % 4 AS INT) AS n_frames,
       CAST((29 * i + 11 * k) % 256 AS DOUBLE) AS mean_r,
       CAST((53 * i + 7 * k) % 256 AS DOUBLE) AS mean_g,
       CAST((71 * i + 13 * k) % 256 AS DOUBLE) AS mean_b
       FROM range(24) t(i), range(4) s(k) WHERE k < 1 + i % 4
       ORDER BY asset_id, frame_index"""

  /** Real pixel resize + re-encode + re-decode: solid-color assets
    * scaled to 10x7 must decode to the resize target dimensions with
    * channel means still exactly the generator colors (solid colors
    * survive any interpolation; PNG re-encode is lossless). Gradients
    * are excluded — their resized means are interpolator-dependent. */
  def mmResizeDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeDecodeTable(s, 24, 10, 7)

  private val mmResizeDecodeSql =
    """SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(10 AS INT) AS width,
       CAST(7 AS INT) AS height,
       CAST((37 * i) % 256 AS DOUBLE) AS mean_r,
       CAST((59 * i) % 256 AS DOUBLE) AS mean_g,
       CAST((83 * i) % 256 AS DOUBLE) AS mean_b
       FROM range(24) t(i) WHERE i % 3 <> 0 ORDER BY asset_id"""

  // --- registry -------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> (ddExact _),
    "dd_fingerprint" -> (ddFingerprint _),
    "dd_fingerprint_nfc" -> (ddFingerprintNfc _),
    "dd_minhash_lsh" -> (ddMinhash _),
    "dd_minhash_incremental" -> (ddMinhashIncremental _),
    "dd_minhash_agg_expr" -> (ddMinhashExpr _),
    "dd_minhash_scalar_expr" -> (ddMinhashScalar _),
    "dd_simhash" -> (ddSimhash _),
    "dd_simhash_native_expr" -> (ddSimhashExpr _),
    "dd_simhash_pairs" -> (ddSimhashPairs _),
    "dd_jaccard" -> (ddJaccard _),
    "dd_jaccard_verified" -> (ddJaccardVerified _),
    "dd_cosine" -> (ddCosine _),
    "dd_cosine_bucketed" -> (ddCosineBucketed _),
    "dd_components" -> (ddComponents _),
    "dd_keep_best" -> (ddKeepBest _),
    "dd_pagerank" -> (ddPagerank _),
    "dd_triplets" -> (ddTriplets _),
    "dd_triplets_at_rest" -> (ddTripletsAtRest _),
    "dd_contamination" -> (ddContamination _),
    "dd_contamination_at_rest" -> (ddContaminationAtRest _),
    "dd_contamination_incremental" -> (ddContaminationIncremental _),
    "dd_contamination_compacted" -> (ddContaminationCompacted _),
    "dd_contamination_bloom" -> (ddContaminationBloom _),
    "ann_brute_topk" -> (annBruteTopK _),
    "ann_knn_eval" -> (annKnnEval _),
    "ann_int8_topk" -> (annInt8TopK _),
    "ann_lsh_topk" -> (annLshTopK _),
    "ann_lsh_multiprobe" -> (annLshMultiProbe _),
    "ann_ivf_topk" -> (annIvfTopK _),
    "ann_pq_topk" -> (annPqTopK _),
    "ann_pq_refined" -> (annPqRefined _),
    "ann_mrl_eval" -> (annMrlEval _),
    "ann_binary_topk" -> (annBinaryTopK _),
    "ann_binary_partitioned" -> (annBinaryPartitioned _),
    "ann_pq_ivf_refined" -> (annPqIvfRefined _),
    "ann_lsh_partitioned" -> (annLshPartitioned _),
    "ann_ivf_partitioned" -> (annIvfPartitioned _),
    "ann_pq_ivf_partitioned" -> (annPqIvfPartitioned _),
    "ann_pq_ivf_incremental" -> (annPqIvfIncremental _),
    "ann_ivf_incremental" -> (annIvfIncremental _),
    "ann_ivf_compacted" -> (annIvfCompacted _),
    "ann_ivf_refreshed" -> (annIvfRefreshed _),
    "ann_int8_ivf_refreshed" -> (annInt8IvfRefreshed _),
    "ann_int8_partitioned" -> (annInt8Partitioned _),
    "ann_int8_ivf_partitioned" -> (annInt8IvfPartitioned _),
    "ann_int8_ivf_incremental" -> (annInt8IvfIncremental _),
    "pp_retrieval" -> (ppRetrieval _),
    "pp_bm25_search" -> (ppBm25Search _),
    "pp_bm25_at_rest" -> (ppBm25AtRest _),
    "pp_bm25_incremental" -> (ppBm25Incremental _),
    "pp_bm25_compacted" -> (ppBm25Compacted _),
    "pp_bm25_updated" -> (ppBm25Updated _),
    "pp_hybrid_search" -> (ppHybridSearch _),
    "pp_hybrid_at_rest" -> (ppHybridAtRest _),
    "pp_dsir_weights" -> (ppDsirWeights _),
    "pp_dsir_weights_at_rest" -> (ppDsirWeightsAtRest _),
    "pp_dsir_select" -> (ppDsirSelect _),
    "pp_profile" -> (ppProfile _),
    "pp_weak_labels" -> (ppWeakLabels _),
    "pp_curriculum" -> (ppCurriculum _),
    "ta_langid" -> (taLangid _),
    "ta_quality" -> (taQuality _),
    "ta_tokens" -> (taTokens _),
    "ta_repetition" -> (taRepetition _),
    "ta_dup_ngrams" -> (taDupNgrams _),
    "ta_bigram_lm" -> (taBigramLm _),
    "ta_bigram_lm_apply" -> (taBigramLmApply _),
    "ta_ngram_lm_smoothed" -> (taNgramLmSmoothed _),
    "ta_ngram_lm_at_rest" -> (taNgramLmAtRest _),
    "ta_ngram_lm_updated" -> (taNgramLmUpdated _),
    "ta_ngram_lm_kn" -> (taNgramLmKn _),
    "ta_ngram_lm_kn_at_rest" -> (taNgramLmKnAtRest _),
    "ta_ngram_lm_kn3" -> (taNgramLmKn3 _),
    "ta_ngram_lm_kn5" -> (taNgramLmKn5 _),
    "ta_ngram_lm_kn5_at_rest" -> (taNgramLmKn5AtRest _),
    "ta_ngram_lm_kn5_bos" -> (taNgramLmKn5Bos _),
    "ta_ngram_lm_kn5_pruned" -> (taNgramLmKn5Pruned _),
    "ta_ngram_lm_kn5_model_at_rest" -> (taNgramLmKn5ModelAtRest _),
    "ta_c4_clean" -> (taC4Clean _),
    "ta_boilerplate" -> (taBoilerplate _),
    "ta_boilerplate_at_rest" -> (taBoilerplateAtRest _),
    "ta_boilerplate_updated" -> (taBoilerplateUpdated _),
    "ta_gopher_rules" -> (taGopherRules _),
    "ta_normalize" -> (taNormalize _),
    "ta_ngram_lm_sb" -> (taNgramLmSb _),
    "ta_ngram_lm_sb_at_rest" -> (taNgramLmSbAtRest _),
    "ta_ngram_lm_mkn5" -> (taNgramLmMkn5 _),
    "ta_ngram_lm_mkn5_at_rest" -> (taNgramLmMkn5AtRest _),
    "ta_ngram_lm_kn3_at_rest" -> (taNgramLmKn3AtRest _),
    "ta_ngram_lm_kn3_updated" -> (taNgramLmKn3Updated _),
    "ta_ngram_lm_mkn" -> (taNgramLmMkn _),
    "ta_ngram_lm_mkn_at_rest" -> (taNgramLmMknAtRest _),
    "ta_ppl_route" -> (taPplRoute _),
    "ta_ppl_route_at_rest" -> (taPplRouteAtRest _),
    "ta_ppl_tertiles" -> (taPplTertiles _),
    "ta_ppl_tertiles_approx" -> (taPplTertilesApprox _),
    "ta_ppl_tertiles_prod" -> (taPplTertilesProd _),
    "ta_ppl_lang_buckets" -> (taPplLangBuckets _),
    "ta_langid_nb" -> (taLangidNb _),
    "ta_langid_nb_at_rest" -> (taLangidNbAtRest _),
    "dd_exact_substring" -> (ddExactSubstring _),
    "dd_exact_substring_at_rest" -> (ddExactSubstringAtRest _),
    "dd_exact_substring_incremental" -> (ddExactSubstringIncremental _),
    "dd_exact_substring_compacted" -> (ddExactSubstringCompacted _),
    "ta_pii" -> (taPii _),
    "dd_semantic" -> (ddSemantic _),
    "dd_semantic_at_rest" -> (ddSemanticAtRest _),
    "dd_semantic_incremental" -> (ddSemanticIncremental _),
    "ta_repetition_native_expr" -> (taRepetitionExpr _),
    "ta_top_bigram" -> (taTopBigram _),
    "ta_heavy_hitters" -> (taHeavyHitters _),
    "ta_heavy_hitters_incremental" -> (taHeavyHittersIncremental _),
    "ta_heavy_hitters_at_rest" -> (taHeavyHittersAtRest _),
    "pp_bpe_train" -> (ppBpeTrain _),
    "pp_bpe_train_fast" -> (ppBpeTrainFast _),
    "pp_unigram_train" -> (ppUnigramTrain _),
    "pp_unigram_apply" -> (ppUnigramApply _),
    "pp_unigram_tokenize" -> (ppUnigramTokenize _),
    "pp_maxmatch_apply" -> (ppMaxmatchApply _),
    "pp_maxmatch_apply_at_rest" -> (ppMaxmatchApplyAtRest _),
    "pp_unigram_apply_at_rest" -> (ppUnigramApplyAtRest _),
    "pp_bpe_apply" -> (ppBpeApply _),
    "pp_bpe_apply_fast" -> (ppBpeApplyFast _),
    "pp_bpe_apply_at_rest" -> (ppBpeApplyAtRest _),
    "pp_shard_manifest" -> (ppShardManifest _),
    "pp_shard_updated" -> (ppShardUpdated _),
    "pp_bpe_tokenize" -> (ppBpeTokenize _),
    "pp_bpe_tokenize_fast" -> (ppBpeTokenizeFast _),
    "pp_bpe_tokenize_at_rest" -> (ppBpeTokenizeAtRest _),
    "pp_span_corruption" -> (ppSpanCorruption _),
    "pp_hard_negatives" -> (ppHardNegatives _),
    "pp_hard_negatives_at_rest" -> (ppHardNegativesAtRest _),
    "pp_curate_shard_e2e" -> (ppCurateShardE2e _),
    "pp_drift_psi" -> (ppDriftPsi _),
    "pp_drift_incremental" -> (ppDriftIncremental _),
    "pp_embedding_drift" -> (ppEmbeddingDrift _),
    "pp_mixture" -> (ppMixture _),
    "pp_temperature" -> (ppTemperature _),
    "pp_length_buckets" -> (ppLengthBuckets _),
    "pp_budget_select" -> (ppBudgetSelect _),
    "pp_packing" -> (ppPacking _),
    "pp_chunk_overlap" -> (ppChunkOverlap _),
    "pp_chunk_cdc" -> (ppChunkCdc _),
    "pp_cdc_dedup" -> (ppCdcDedup _),
    "pp_cdc_at_rest" -> (ppCdcAtRest _),
    "pp_cdc_incremental" -> (ppCdcIncremental _),
    "pp_cdc_compacted" -> (ppCdcCompacted _),
    "pp_snapshot_diff" -> (ppSnapshotDiff _),
    "ta_keywords" -> (taKeywords _),
    "ta_tag_dict" -> (taTagDict _),
    "dq_checks" -> (dqChecks _),
    "dq_incremental" -> (dqIncremental _),
    "gr_triangles" -> (grTriangles _),
    "gr_triangles_approx" -> (grTrianglesApprox _),
    "pp_nb_model" -> (ppNbModel _),
    "pp_nb_model_at_rest" -> (ppNbModelAtRest _),
    "pp_nb_incremental" -> (ppNbIncremental _),
    "pp_nb_updated" -> (ppNbUpdated _),
    "pp_nb_classify" -> (ppNbClassify _),
    "pp_nb_classify_at_rest" -> (ppNbClassifyAtRest _),
    "pp_split_clusters" -> (ppSplitClusters _),
    "pp_dedup_e2e" -> (ppDedupE2e _),
    "pp_split_decontam" -> (ppSplitDecontam _),
    "pp_split_decontam_at_rest" -> (ppSplitDecontamAtRest _),
    "pp_nb_eval" -> (ppNbEval _),
    "pp_contamination_report" -> (ppContaminationReport _),
    "ta_tokenizer_fertility" -> (taTokenizerFertility _),
    "pp_data_card" -> (ppDataCard _),
    "pp_semdedup_e2e" -> (ppSemdedupE2e _),
    "pp_semdedup_at_rest" -> (ppSemdedupAtRest _),
    "pp_jsonl_roundtrip" -> (ppJsonlRoundtrip _),
    "pp_csv_roundtrip" -> (ppCsvRoundtrip _),
    "pp_filter_e2e" -> (ppFilterE2e _),
    "pp_filter_ppl_e2e" -> (ppFilterPplE2e _),
    "pp_curation_verdicts" -> (ppCurationVerdicts _),
    "mm_features" -> (mmFeatures _),
    "mm_decode" -> (mmDecode _),
    "mm_dhash" -> (mmDhash _),
    "mm_dhash_pairs" -> (mmDhashPairs _),
    "mm_audio_decode" -> (mmAudioDecode _),
    "mm_video_decode" -> (mmVideoDecode _),
    "mm_resize_decode" -> (mmResizeDecode _))

  /** Queries whose FIRST run may pay a one-time partitioned-at-rest
    * layout write ([[ensureLayout]]) when the tmpdir cache is cold —
    * i.e. after a testdata regeneration re-fingerprints [[layoutDir]].
    * Bench warms exactly these before timing, so a cache-invalidating
    * data change can never masquerade as a query regression in the
    * recorded artifact (BENCH_r09 booked the post-regen layout rebuild
    * as an apparent 12× ann_int8_ivf_partitioned slowdown). Keep in
    * sync with the [[ensureLayout]] call sites. */
  val layoutBacked: Set[String] = Set(
    "ann_lsh_partitioned", "ann_ivf_partitioned", "ann_int8_partitioned",
    "ann_int8_ivf_partitioned", "dd_semantic_at_rest",
    "pp_semdedup_at_rest", "pp_jsonl_roundtrip", "pp_csv_roundtrip", "pp_bm25_at_rest",
    "pp_hybrid_at_rest", "ann_ivf_compacted", "ann_ivf_refreshed",
    "pp_bm25_incremental", "pp_bm25_compacted", "pp_bm25_updated",
    "dd_contamination_at_rest", "dd_contamination_incremental",
    "dd_contamination_compacted", "dd_semantic_incremental",
    "ann_int8_ivf_refreshed", "ann_pq_ivf_refined",
    "pp_shard_manifest", "pp_shard_updated",
    "ta_heavy_hitters_at_rest", "pp_hard_negatives_at_rest",
    "ann_binary_partitioned", "dd_exact_substring_at_rest",
    "dd_exact_substring_incremental", "dd_exact_substring_compacted",
    "pp_drift_incremental", "pp_cdc_at_rest", "pp_cdc_incremental",
    "pp_cdc_compacted", "q48_zorder_pruned", "q49_dpp",
    "q50_bucketed_join", "dq_incremental",
    // reconciled against the ensureLayout call graph (round 14):
    // these were layout-backed all along but missing from the warm
    // list, so a cold cache landed their one-time build in run 1
    "ann_ivf_incremental", "ann_int8_ivf_incremental",
    "ann_pq_ivf_incremental", "ann_pq_ivf_partitioned",
    "dd_triplets_at_rest", "pp_nb_model_at_rest",
    "pp_nb_classify_at_rest", "pp_nb_incremental", "pp_nb_updated",
    "pp_unigram_apply_at_rest",
    // the round-14 tokenizer model stores + smoothed-LM count store
    "pp_bpe_apply_at_rest", "pp_bpe_tokenize_at_rest",
    "pp_maxmatch_apply_at_rest", "ta_ngram_lm_at_rest",
    "ta_ngram_lm_updated", "ta_ngram_lm_kn_at_rest",
    "ta_ngram_lm_kn3_at_rest", "ta_ngram_lm_kn3_updated",
    "ta_ngram_lm_kn5_at_rest", "ta_ppl_route_at_rest",
    "ta_ngram_lm_mkn5_at_rest", "ta_ngram_lm_kn5_model_at_rest",
    "ta_ngram_lm_sb_at_rest",
    "ta_ngram_lm_mkn_at_rest",
    "ta_langid_nb_at_rest",
    // round-16: the whole kn5 family reads a cached persisted chain
    // (knChainCached) — the inline forms build it on first call
    "ta_ngram_lm_kn5", "ta_ngram_lm_mkn5", "ta_ngram_lm_kn5_pruned",
    "ta_ngram_lm_kn5_bos",
    // round-16 continuation: the trigram family rides the same cache
    "ta_ngram_lm_kn3", "ta_ngram_lm_mkn", "ta_ppl_lang_buckets",
    // round-17: the curation at-rest twins (hot-line store, split
    // val index)
    "ta_boilerplate_at_rest", "ta_boilerplate_updated",
    "pp_split_decontam_at_rest",
    // round-18: the DSIR model store + the selection gate off it
    "pp_dsir_weights_at_rest", "pp_dsir_select",
    // round-19: the streamed LSH band store (directive #4)
    "dd_minhash_incremental",
    // round-17 report gates composing layout-backed paths (the NB
    // counts store / the BPE merge store)
    "pp_nb_eval", "ta_tokenizer_fertility")

  /** Gates whose first call pays a one-time build cached OUTSIDE the
    * ensureLayout call graph (a session/fingerprint-keyed cache the
    * ContractSpec scan can't see). Bench warms these exactly like
    * [[layoutBacked]]; a gate added here and not warmed would book
    * its cold build inside timed run 1 as a fake regression — the
    * pre-round-14 layoutBacked drift failure mode. Keep additions
    * paired with their cache site. */
  val sessionCached: Set[String] = Set("xml_convert_streamed")

  /** The DOCUMENTED-BASELINE tier: inline forms kept deliberately as
    * measured baselines for an at-rest / bucketed / fast twin that is
    * the recommended path at scale (each twin shares its baseline's
    * oracle verbatim — the losslessness proof). These rebuild their
    * index/derived structure per call, so their cost grows with the
    * corpus where the twin's tracks the query; at sf10 they dominate
    * bench wall-clock (ann_pq_topk 154 s vs 5 s for the at-rest form)
    * and would drown a regression in the recommended path if summed
    * together. Bench reports `probe_total` (everything else — the
    * paths a production deployment runs) and `baseline_total` (this
    * set) as separate fields so each tier's drift is visible at a
    * glance. */
  val inlineBaseline: Set[String] = Set(
    "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_int8_topk",
    "ann_pq_topk", "ann_pq_refined", "ann_binary_topk",
    "dd_semantic", "dd_cosine", "dd_contamination", "dd_jaccard",
    "dd_triplets", "dd_exact_substring", "pp_cdc_dedup",
    "pp_semdedup_e2e",
    "pp_bm25_search", "pp_hybrid_search", "pp_hard_negatives",
    "ta_heavy_hitters", "pp_bpe_train", "pp_bpe_apply",
    "pp_bpe_tokenize", "pp_nb_model", "pp_unigram_apply",
    // round-17: the inline classifier forms TRAIN per call; their
    // at-rest twins (pp_nb_classify_at_rest, ta_langid_nb_at_rest)
    // are the recommended production paths, so probe_total tracks
    // those and the retrain-per-call cost books here
    "pp_nb_classify", "ta_langid_nb",
    // round-18: DSIR joined the train-once/apply-many families —
    // the inline form retrains both gram models per call
    "pp_dsir_weights",
    // round-19: the exact triangle count is the documented baseline
    // for the DOULION sampled estimator (gr_triangles_approx) — the
    // only genuinely super-linear gate; the sampled form is the
    // recommended path at scale
    "gr_triangles")

  val oracle: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_fingerprint" -> ddFingerprintSql,
    "dd_fingerprint_nfc" -> ddFingerprintNfcSql,
    "dd_minhash_lsh" -> ddMinhashSql,
    "dd_minhash_incremental" -> ddMinhashSql,
    "dd_minhash_agg_expr" -> ddMinhashSql,
    "dd_minhash_scalar_expr" -> ddMinhashSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_simhash_native_expr" -> ddSimhashSql,
    "dd_simhash_pairs" -> ddSimhashPairsSql,
    "dd_jaccard" -> ddJaccardSql,
    "dd_jaccard_verified" -> ddJaccardVerifiedSql,
    "dd_cosine" -> ddCosineSql,
    "dd_cosine_bucketed" -> ddCosineBucketedSql,
    "dd_components" -> ddComponentsSql,
    "dd_keep_best" -> ddKeepBestSql,
    "dd_pagerank" -> ddPagerankSql,
    "dd_triplets" -> ddTripletsSql,
    "dd_triplets_at_rest" -> ddTripletsSql,
    "dd_contamination" -> ddContaminationSql,
    // at-rest gram-index probe shares the inline oracle verbatim:
    // one replay proves probe == inline AND the layout lossless;
    // the streamed and post-compaction probes must STILL match it
    "dd_contamination_at_rest" -> ddContaminationSql,
    "dd_contamination_incremental" -> ddContaminationSql,
    "dd_contamination_compacted" -> ddContaminationSql,
    "dd_contamination_bloom" -> ddContaminationSql,
    "ann_brute_topk" -> annBruteSql,
    "ann_knn_eval" -> annKnnEvalSql,
    "ann_int8_topk" -> annInt8Sql,
    "ann_lsh_topk" -> annLshSql,
    "ann_lsh_multiprobe" -> annLshMultiProbeSql,
    "ann_ivf_topk" -> annIvfSql,
    "ann_pq_topk" -> annPqSql,
    "ann_pq_refined" -> annPqRefinedSql,
    "ann_mrl_eval" -> annMrlEvalSql,
    "ann_binary_topk" -> annBinaryTopKSql,
    "ann_binary_partitioned" -> annBinaryPartitionedSql,
    "ann_pq_ivf_refined" -> annPqIvfRefinedSql,
    "ann_pq_ivf_partitioned" -> annPqIvfSql,
    "ann_pq_ivf_incremental" -> annPqIvfSql,
    "ann_lsh_partitioned" -> annLshPartitionedSql,
    // the partitioned layout is an execution detail — the in-memory
    // IVF oracle verifies the identical (centroids, nprobe) semantics
    "ann_ivf_partitioned" -> annIvfSql,
    "ann_ivf_incremental" -> annIvfSql,
    // post-compaction probe must STILL match the full rebuild —
    // compaction is lossless or this hash diverges
    "ann_ivf_compacted" -> annIvfSql,
    // post-refresh probe with nprobe = all clusters is exact cosine
    // top-k, codebook-independent — the brute oracle proves the
    // re-clustered layout holds every vector exactly once
    "ann_ivf_refreshed" -> annBruteSql,
    // the int8 re-derivation after refresh probes all clusters —
    // exact integer scoring, so the int8-brute replay verifies it
    "ann_int8_ivf_refreshed" -> annInt8Sql,
    "ann_int8_partitioned" -> annInt8PartitionedSql,
    "ann_int8_ivf_partitioned" -> annInt8IvfPartitionedSql,
    "ann_int8_ivf_incremental" -> annInt8IvfPartitionedSql,
    "pp_retrieval" -> ppRetrievalSql,
    "pp_bm25_search" -> ppBm25SearchSql,
    // at-rest probe shares the inline oracle verbatim: one replay
    // proves probe == inline AND the postings layout lossless
    "pp_bm25_at_rest" -> ppBm25SearchSql,
    // streamed base∪delta probe and the post-compaction probe must
    // STILL match the inline form — incremental maintenance is
    // lossless or these hashes diverge
    "pp_bm25_incremental" -> ppBm25SearchSql,
    "pp_bm25_compacted" -> ppBm25SearchSql,
    // re-crawl supersede: the probe over base ∪ update-delta must
    // match the inline replay over the LATEST document versions
    "pp_bm25_updated" -> ppBm25UpdatedSql,
    "pp_hybrid_search" -> ppHybridSearchSql,
    "pp_hybrid_at_rest" -> ppHybridAtRestSql,
    "pp_dsir_weights" -> ppDsirWeightsSql,
    // store trained on the same corpus ⇒ apply-from-store == inline
    // retrain; one shared replay proves scorer + layout lossless
    "pp_dsir_weights_at_rest" -> ppDsirWeightsSql,
    "pp_dsir_select" -> ppDsirSelectSql,
    "pp_profile" -> ppProfileSql,
    "pp_weak_labels" -> ppWeakLabelsSql,
    "pp_curriculum" -> ppCurriculumSql,
    "ta_langid" -> taLangidSql,
    "ta_quality" -> taQualitySql,
    "ta_tokens" -> taTokensSql,
    "ta_repetition" -> taRepetitionSql,
    "ta_dup_ngrams" -> taDupNgramsSql,
    "ta_bigram_lm" -> taBigramLmSql,
    "ta_bigram_lm_apply" -> taBigramLmApplySql,
    "ta_ngram_lm_smoothed" -> taNgramLmSmoothedSql,
    "ta_ngram_lm_at_rest" -> taNgramLmSmoothedSql,
    "ta_ngram_lm_updated" -> taNgramLmUpdatedSql,
    "ta_ngram_lm_kn" -> taNgramLmKnSql,
    "ta_ngram_lm_kn_at_rest" -> taNgramLmKnSql,
    "ta_ngram_lm_kn3" -> taNgramLmKn3Sql,
    "ta_ngram_lm_kn5" -> taNgramLmKn5Sql,
    "ta_ngram_lm_kn5_at_rest" -> taNgramLmKn5Sql,
    "ta_ngram_lm_kn5_bos" -> taNgramLmKn5BosSql,
    "ta_ngram_lm_kn5_pruned" -> taNgramLmKn5PrunedSql,
    "ta_ngram_lm_kn5_model_at_rest" -> taNgramLmKn5Sql,
    "ta_c4_clean" -> taC4CleanSql,
    "ta_boilerplate" -> taBoilerplateSql,
    // at-rest/updated scrubs share the inline oracle VERBATIM: one
    // replay proves the folded (and superseded) hot set lossless
    "ta_boilerplate_at_rest" -> taBoilerplateSql,
    "ta_boilerplate_updated" -> taBoilerplateSql,
    "ta_gopher_rules" -> taGopherRulesSql,
    "ta_normalize" -> taNormalizeSql,
    "ta_ngram_lm_sb" -> taNgramLmSbSql,
    "ta_ngram_lm_sb_at_rest" -> taNgramLmSbSql,
    "ta_ngram_lm_mkn5" -> taNgramLmMkn5Sql,
    "ta_ngram_lm_mkn5_at_rest" -> taNgramLmMkn5Sql,
    "ta_ngram_lm_kn3_at_rest" -> taNgramLmKn3Sql,
    "ta_ngram_lm_kn3_updated" -> taNgramLmKn3UpdatedSql,
    "ta_ngram_lm_mkn" -> taNgramLmMknSql,
    "ta_ngram_lm_mkn_at_rest" -> taNgramLmMknSql,
    "ta_ppl_route" -> taPplRouteSql,
    "ta_ppl_route_at_rest" -> taPplRouteSql,
    "ta_ppl_tertiles" -> taPplTertilesSql,
    "ta_ppl_tertiles_approx" -> taPplTertilesApproxSql,
    "ta_ppl_tertiles_prod" -> taPplTertilesProdSql,
    "ta_ppl_lang_buckets" -> taPplLangBucketsSql,
    "ta_langid_nb" -> taLangidNbSql,
    "ta_langid_nb_at_rest" -> taLangidNbSql,
    "dd_exact_substring" -> ddExactSubstringSql,
    "dd_exact_substring_at_rest" -> ddExactSubstringSql,
    "dd_exact_substring_incremental" -> ddExactSubstringSql,
    "dd_exact_substring_compacted" -> ddExactSubstringSql,
    "ta_pii" -> taPiiSql,
    "dd_semantic" -> ddSemanticSql,
    // at-rest form shares the in-memory form's oracle verbatim: one
    // replay proves both paths equal AND the layout lossless
    "dd_semantic_at_rest" -> ddSemanticSql,
    // streamed-maintenance composition shares the same replay too
    "dd_semantic_incremental" -> ddSemanticSql,
    "ta_repetition_native_expr" -> taRepetitionSql,
    "ta_top_bigram" -> taTopBigramSql,
    "ta_heavy_hitters" -> taHeavyHittersSql,
    "ta_heavy_hitters_incremental" -> taHeavyHittersSql,
    "ta_heavy_hitters_at_rest" -> taHeavyHittersSql,
    "pp_bpe_train" -> ppBpeTrainSql,
    "pp_unigram_train" -> ppUnigramTrainSql,
    "pp_unigram_apply" -> ppUnigramApplySql,
    "pp_unigram_tokenize" -> ppUnigramTokenizeSql,
    "pp_maxmatch_apply" -> ppMaxmatchApplySql,
    "pp_maxmatch_apply_at_rest" -> ppMaxmatchApplySql,
    "pp_unigram_apply_at_rest" -> ppUnigramApplySql,
    "pp_bpe_train_fast" -> ppBpeTrainSql,
    "pp_bpe_apply" -> ppBpeApplySql,
    "pp_bpe_apply_fast" -> ppBpeApplySql,
    "pp_bpe_apply_at_rest" -> ppBpeApplySql,
    "pp_shard_manifest" -> ppShardManifestSql,
    "pp_shard_updated" -> ppShardManifestSql,
    "pp_bpe_tokenize" -> ppBpeTokenizeSql,
    "pp_bpe_tokenize_fast" -> ppBpeTokenizeSql,
    "pp_bpe_tokenize_at_rest" -> ppBpeTokenizeSql,
    "pp_span_corruption" -> ppSpanCorruptionSql,
    "pp_hard_negatives" -> ppHardNegativesSql,
    "pp_hard_negatives_at_rest" -> ppHardNegativesSql,
    "pp_curate_shard_e2e" -> ppCurateShardE2eSql,
    "pp_drift_psi" -> ppDriftPsiSql,
    "pp_drift_incremental" -> ppDriftPsiSql,
    "pp_embedding_drift" -> ppEmbeddingDriftSql,
    "pp_mixture" -> ppMixtureSql,
    "pp_temperature" -> ppTemperatureSql,
    "pp_length_buckets" -> ppLengthBucketsSql,
    "pp_budget_select" -> ppBudgetSelectSql,
    "pp_packing" -> ppPackingSql,
    "pp_chunk_overlap" -> ppChunkOverlapSql,
    "pp_chunk_cdc" -> ppChunkCdcSql,
    "pp_cdc_dedup" -> ppCdcDedupSql,
    // at-rest form shares the inline oracle VERBATIM — lossless-
    // layout proof; incremental replays the chain over newsnap
    "pp_cdc_at_rest" -> ppCdcDedupSql,
    "pp_cdc_incremental" -> ppCdcIncrementalSql,
    // compacted layout probes with the incremental oracle VERBATIM —
    // the fold is lossless by hash proof
    "pp_cdc_compacted" -> ppCdcIncrementalSql,
    "pp_snapshot_diff" -> ppSnapshotDiffSql,
    "ta_keywords" -> taKeywordsSql,
    "ta_tag_dict" -> taTagDictSql,
    "dq_checks" -> dqChecksSql,
    "dq_incremental" -> dqIncrementalSql,
    "gr_triangles" -> grTrianglesSql,
    "gr_triangles_approx" -> grTrianglesApproxSql,
    "pp_nb_model" -> ppNbModelSql,
    "pp_nb_model_at_rest" -> ppNbModelSql,
    "pp_nb_incremental" -> ppNbModelSql,
    "pp_nb_updated" -> ppNbUpdatedSql,
    "pp_nb_classify" -> ppNbClassifySql,
    "pp_nb_classify_at_rest" -> ppNbClassifySql,
    "pp_split_clusters" -> ppSplitClustersSql,
    "pp_dedup_e2e" -> ppDedupE2eSql,
    "pp_split_decontam" -> ppSplitDecontamSql,
    // the persisted val index must reproduce the inline split exactly
    "pp_split_decontam_at_rest" -> ppSplitDecontamSql,
    "pp_nb_eval" -> ppNbEvalSql,
    "pp_contamination_report" -> ppContaminationReportSql,
    "ta_tokenizer_fertility" -> taTokenizerFertilitySql,
    "pp_data_card" -> ppDataCardSql,
    "pp_semdedup_e2e" -> ppSemdedupE2eSql,
    // at-rest e2e shares the rebuild form's oracle verbatim — same
    // lossless-layout proof pattern as dd_semantic_at_rest
    "pp_semdedup_at_rest" -> ppSemdedupE2eSql,
    "pp_jsonl_roundtrip" -> ppJsonlRoundtripSql,
    "pp_csv_roundtrip" -> ppJsonlRoundtripSql,
    "pp_filter_e2e" -> ppFilterE2eSql,
    "pp_filter_ppl_e2e" -> ppFilterPplE2eSql,
    "pp_curation_verdicts" -> ppCurationVerdictsSql,
    "mm_features" -> mmFeaturesSql,
    "mm_decode" -> mmDecodeSql,
    "mm_dhash" -> mmDhashSql,
    "mm_dhash_pairs" -> mmDhashPairsSql,
    "mm_audio_decode" -> mmAudioDecodeSql,
    "mm_video_decode" -> mmVideoDecodeSql,
    "mm_resize_decode" -> mmResizeDecodeSql)
}
