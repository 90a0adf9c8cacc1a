package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.functions.Numerics
import graft.operators.{Dedup, Profile, Sampling, Similarity, TextAnalysis}

/** LLM-data-pipeline operators (SURVEY.md §2.3) over the `documents`
  * and `embeddings` tables. Every oracle either replays the identical
  * deterministic pipeline in DuckDB (simhash, hyperplane LSH) or is the
  * EXACT computation the LSH path approximates (all-pairs Jaccard at
  * oracle scale — the data's separation margin makes the LSH miss
  * probability negligible; SURVEY.md §5).
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  // ---- shared DuckDB fragments (kept in lockstep with graft.functions) ----

  /** words CTE: doc_id, ws (whitespace tokens of normalized text). */
  private[queries] val wordsCte =
    """w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      |      FROM documents)""".stripMargin

  /** distinct n-word shingle list expression over `ws`. */
  private[queries] def shingleExpr(n: Int): String = {
    val parts = (0 until n).map(k => s"ws[i+$k]").mkString("||' '||")
    s"list_distinct([$parts for i in generate_series(1, len(ws)-${n - 1})])"
  }

  private[queries] def jaccardPairsSql(n: Int, threshold: Double): String =
    s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(n)} AS sh FROM w),
      p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, ${Numerics.sqlFix("j", 4)} AS jaccard_sim
      FROM p WHERE j >= $threshold
      ORDER BY doc_a, doc_b"""

  /** Per-plane signature bit columns over `v` (array<double>), drawn
    * from the same md5-derived hyperplanes as
    * [[graft.operators.Similarity.hyperplaneValues]].
    */
  private def planeBitsSql(bands: Int, bitsPerBand: Int): String = {
    val nPlanes = bands * bitsPerBand
    val bitCols = (0 until nPlanes).map { p =>
      s"""(CASE WHEN list_dot_product(v,
         [('0x'||substr(md5('hp-$p-'||i),1,15))::BIGINT/576460752303423488.0 - 1.0
          for i in generate_series(0,63)]) > 0 THEN 1 ELSE 0 END) AS bit$p"""
    }.mkString(",\n        ")
    val bucketCols = (0 until bands).map { b =>
      val terms = (0 until bitsPerBand)
        .map(i => s"${1 << i}*bit${b * bitsPerBand + i}").mkString(" + ")
      s"($terms) AS k$b"
    }.mkString(", ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      bits AS (SELECT vec_id, v, $bitCols FROM e),
      sig AS (SELECT vec_id, v, $bucketCols FROM bits)"""
  }

  private val cosSql =
    "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"

  // ---- q20: exact dedup ----

  val q20 = Q(
    "q20_dedup_exact",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup.exact(d.unionAll(d), "doc_id", "text")
        .orderBy("kept_doc_id")
    },
    Some("""
      SELECT md5(lower(trim(text))) AS digest,
             CAST(min(doc_id) AS BIGINT) AS kept_doc_id,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      GROUP BY digest
      ORDER BY kept_doc_id"""))

  // ---- q21: MinHash-LSH near-dedup (3-word shingles) ----

  val q21 = Q(
    "q21_dedup_minhash",
    (s, dir) =>
      Dedup.minhashNearDup(docs(s, dir), "doc_id", "text",
          shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b"),
    Some(jaccardPairsSql(3, 0.6)))

  // ---- q22: SimHash signatures ----

  val q22 = Q(
    "q22_dedup_simhash",
    (s, dir) =>
      Dedup.simhashSignatures(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    Some {
      // bit k of the signature = bit ((14-k/4)*4 + k%4) of the 60-bit
      // numeric md5 prefix — same derivation as Hashes.md5Bits60
      val terms = (0 until 16).map { k =>
        val shift = (14 - k / 4) * 4 + k % 4
        s"""(CASE WHEN list_sum([2*((('0x'||substr(md5(x),1,15))::BIGINT
           >> $shift) & 1)-1 for x in sh]) > 0
           THEN ${1 << k} ELSE 0 END)"""
      }.mkString(" + ")
      s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST($terms AS INT) AS simhash
      FROM sh ORDER BY doc_id"""
    })

  // ---- q23: n-gram (bigram) Jaccard over LSH candidates ----

  val q23 = Q(
    "q23_ngram_jaccard",
    (s, dir) =>
      Dedup.minhashNearDup(docs(s, dir), "doc_id", "text",
          shingleWidth = 2, bands = 8, rowsPerBand = 3, threshold = 0.6)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b"),
    Some(jaccardPairsSql(2, 0.6)))

  // ---- q24: embedding-cosine near-dup via hyperplane LSH ----

  val q24 = Q(
    "q24_embed_neardup",
    (s, dir) =>
      Similarity.embeddingNearDup(embs(s, dir), "vec_id", "embedding",
          dim = 64, bands = 2, bitsPerBand = 4, threshold = 0.35)
        .withColumnRenamed("id_a", "vec_a")
        .withColumnRenamed("id_b", "vec_b")
        .orderBy("vec_a", "vec_b"),
    Some(s"""
      WITH ${planeBitsSql(2, 4)},
      pairs AS (
        SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, $cosSql AS cos
        FROM sig a JOIN sig c
          ON a.vec_id < c.vec_id AND (a.k0 = c.k0 OR a.k1 = c.k1))
      SELECT vec_a, vec_b, ${Numerics.sqlFix("cos", 4)} AS cos_sim
      FROM pairs WHERE cos >= 0.35
      ORDER BY vec_a, vec_b"""))

  // ---- q25: ANN brute-force top-k (baseline kernel) ----

  val q25 = Q(
    "q25_ann_bruteforce",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity.bruteForceTopK(
          e.where(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "nn_rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      scored AS (
        SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
        FROM (SELECT * FROM e WHERE vec_id < 10) a
        JOIN e c ON a.vec_id != c.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS INT) AS nn_rank,
               ${Numerics.sqlFix("cos", 4)} AS cos_sim
        FROM scored)
      SELECT query_id, neighbor_id, nn_rank, cos_sim
      FROM ranked WHERE nn_rank <= 5
      ORDER BY query_id, nn_rank"""))

  // ---- q26: ANN LSH-bucketed top-k (scale path) ----

  val q26 = Q(
    "q26_ann_lsh",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity.lshTopK(
          e.where(col("vec_id") < 10), e, "vec_id", "embedding",
          dim = 64, k = 3, bands = 2, bitsPerBand = 4)
        .orderBy("query_id", "nn_rank")
    },
    Some(s"""
      WITH ${planeBitsSql(2, 4)},
      cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM (SELECT * FROM sig WHERE vec_id < 10) q
        JOIN sig c
          ON q.vec_id != c.vec_id AND (q.k0 = c.k0 OR q.k1 = c.k1)),
      scored AS (
        SELECT query_id, neighbor_id, $cosSql AS cos
        FROM cand
        JOIN (SELECT vec_id, v FROM e) a ON a.vec_id = cand.query_id
        JOIN (SELECT vec_id, v FROM e) c ON c.vec_id = cand.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS INT) AS nn_rank,
               ${Numerics.sqlFix("cos", 4)} AS cos_sim
        FROM scored)
      SELECT query_id, neighbor_id, nn_rank, cos_sim
      FROM ranked WHERE nn_rank <= 3
      ORDER BY query_id, nn_rank"""))

  // ---- q27: language ID ----

  val q27 = Q(
    "q27_lang_id",
    (s, dir) =>
      TextAnalysis.langId(docs(s, dir), "doc_id", "text").orderBy("doc_id"),
    Some {
      def inList(vocab: Seq[String]) =
        vocab.map(v => s"'$v'").mkString("(", ",", ")")
      val profs = TextAnalysis.StopwordProfiles.toMap
      s"""
      WITH $wordsCte,
      h AS (SELECT doc_id, ws,
        len(list_filter(ws, x -> x IN ${inList(profs("en"))})) AS en,
        len(list_filter(ws, x -> x IN ${inList(profs("de"))})) AS de,
        len(list_filter(ws, x -> x IN ${inList(profs("fr"))})) AS fr,
        len(list_filter(ws, x -> x IN ${inList(profs("es"))})) AS es
        FROM w)
      SELECT doc_id,
             CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                  WHEN de >= fr AND de >= es THEN 'de'
                  WHEN fr >= es THEN 'fr'
                  ELSE 'es' END AS pred_lang,
             ${Numerics.sqlFix("CAST(en AS DOUBLE) / len(ws)", 4)} AS en_stop_ratio
      FROM h ORDER BY doc_id"""
    })

  // ---- q28: quality scoring ----

  val q28 = Q(
    "q28_quality_score",
    (s, dir) =>
      TextAnalysis.qualityScore(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
    Some {
      val en = TextAnalysis.StopwordProfiles.head._2
        .map(v => s"'$v'").mkString("(", ",", ")")
      val scoreExpr = "0.4 * least(t / 100.0, 1.0) " +
        "+ 0.3 * (1.0 - st / t) " +
        "+ 0.3 * least((c / t) / 10.0, 1.0)"
      s"""
      WITH $wordsCte,
      m AS (SELECT doc_id,
              CAST(len(ws) AS DOUBLE) AS t,
              CAST(list_sum([len(x) for x in ws]) AS DOUBLE) AS c,
              CAST(len(list_filter(ws, x -> x IN $en)) AS DOUBLE) AS st
            FROM w)
      SELECT doc_id,
             CAST(t AS BIGINT) AS n_tokens,
             ${Numerics.sqlFix("c / t", 4)} AS avg_token_len,
             ${Numerics.sqlFix("st / t", 4)} AS stop_ratio,
             ${Numerics.sqlFix(scoreExpr, 4)} AS quality_score
      FROM m ORDER BY doc_id"""
    })

  // ---- q29: token counting ----

  val q29 = Q(
    "q29_token_count",
    (s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
    Some(s"""
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS ws_tokens,
             CAST(len(regexp_extract_all(lower(trim(text)),
               '${TextAnalysis.BpeishPattern}')) AS BIGINT)
               AS bpeish_tokens
      FROM documents ORDER BY doc_id"""))

  // ---- q30: document fingerprinting ----

  val q30 = Q(
    "q30_fingerprint",
    (s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""
      WITH g AS (SELECT doc_id, lower(trim(text)) AS tx FROM documents),
      gr AS (SELECT doc_id, tx,
               list_distinct([tx[i:i+4] for i in generate_series(1, len(tx)-4)])
                 AS grams
             FROM g)
      SELECT doc_id,
             md5(tx) AS content_md5,
             list_min([substr(md5('0|'||x),1,15) for x in grams]) AS gram_min_hash,
             list_max([substr(md5('0|'||x),1,15) for x in grams]) AS gram_max_hash
      FROM gr ORDER BY doc_id"""))

  // ---- q31: top n-gram statistics ----

  val q31 = Q(
    "q31_ngram_stats",
    (s, dir) =>
      TextAnalysis.topNgrams(docs(s, dir), "text", n = 3, topK = 20),
    Some("""
      WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents),
      g AS (SELECT unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
                           for i in generate_series(1, len(ws)-2)]) AS gram
            FROM w)
      SELECT gram, CAST(count(*) AS BIGINT) AS freq
      FROM g GROUP BY gram
      ORDER BY freq DESC, gram ASC
      LIMIT 20"""))

  // ---- q32: multimodal binary plumbing (deterministic features) ----

  val q32 = Q(
    "q32_multimodal_meta",
    (s, dir) =>
      // pure codegen'd Column features — the typed decode pass
      // (extractFeatures, stubbed codec) is exercised in MultimodalSpec
      Multimodal.deterministicFeatures(
          Multimodal.packText(docs(s, dir), "doc_id", "text"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             upper(substr(hex(encode(text)), 1, 8)) AS header_hex,
             sha256(text) AS content_sha
      FROM documents ORDER BY doc_id"""))

  // ---- q49: incremental near-dedup (fresh batch vs existing corpus) ----

  val q49 = Q(
    "q49_dedup_incremental",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalNearDup(
          base = d.where(col("doc_id") % 10 =!= 0),
          fresh = d.where(col("doc_id") % 10 === 0),
          "doc_id", "text",
          shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      SELECT doc_a, doc_b, jaccard_sim
      FROM (${jaccardPairsSql(3, 0.6)})
      WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
      ORDER BY doc_a, doc_b"""))

  // ---- q53: TF-IDF top terms per document ----

  val q53 = Q(
    "q53_tfidf_topterms",
    (s, dir) =>
      TextAnalysis.tfidfTopTerms(docs(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "term_rank"),
    Some(s"""
      WITH $wordsCte,
      t AS (SELECT doc_id, unnest(ws) AS term FROM w),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM t GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, term, tf, df,
               tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term,
               CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY ${Numerics.sqlFix("s", 4)} DESC, term ASC)
                 AS INT) AS term_rank,
               tf, df, ${Numerics.sqlFix("s", 4)} AS tfidf_score
        FROM scored)
      SELECT doc_id, term, term_rank, tf, df, tfidf_score
      FROM ranked WHERE term_rank <= 3
      ORDER BY doc_id, term_rank"""))

  // ---- q54: within-doc n-gram repetition ratio ----

  val q54 = Q(
    "q54_repetition_ratio",
    (s, dir) =>
      TextAnalysis.repetitionRatio(docs(s, dir), "doc_id", "text", n = 3)
        .orderBy("doc_id"),
    Some(s"""
      WITH $wordsCte,
      m AS (SELECT doc_id,
              CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_grams,
              CAST(len(${shingleExpr(3)}) AS BIGINT) AS n_distinct_grams
            FROM w)
      SELECT doc_id, n_grams, n_distinct_grams,
             ${Numerics.sqlFix(
               "CASE WHEN n_grams > 0 THEN 1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams ELSE 0.0 END",
               4)} AS repetition_ratio
      FROM m ORDER BY doc_id"""))

  // ---- q55: PII scrubbing (emails + long digit runs) ----

  /** The source docs carry no planted PII, so the query splices a
    * synthetic email + id number into each text before scrubbing — the
    * oracle does the identical splice, and the md5 of the scrubbed text
    * verifies every replacement byte-for-byte.
    */
  val q55 = Q(
    "q55_pii_scrub",
    (s, dir) => {
      val withPii = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com id 1234567890123")).as("text"))
      TextAnalysis.scrubPii(withPii, "doc_id", "text")
        .select(col("doc_id"), col("n_emails"), col("n_long_numbers"),
          md5(col("text_scrubbed")).as("scrubbed_md5"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH p AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
                 '@example.com id 1234567890123' AS text
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(text,
               '${TextAnalysis.LongNumberPattern}')) AS BIGINT)
               AS n_long_numbers,
             md5(regexp_replace(regexp_replace(text,
               '${TextAnalysis.EmailPattern}', '[EMAIL]', 'g'),
               '${TextAnalysis.LongNumberPattern}', '[NUM]', 'g'))
               AS scrubbed_md5
      FROM p ORDER BY doc_id"""))

  // ---- q57: document chunking (token windows with overlap) ----

  private val ChunkTokens = 64
  private val ChunkOverlap = 16
  private val ChunkStride = ChunkTokens - ChunkOverlap

  val q57 = Q(
    "q57_chunk_documents",
    (s, dir) =>
      TextAnalysis.chunkDocuments(docs(s, dir), "doc_id", "text",
          chunkTokens = ChunkTokens, overlap = ChunkOverlap)
        .orderBy("doc_id", "chunk_seq"),
    Some(s"""
      WITH $wordsCte,
      c AS (SELECT doc_id, ws, len(ws) AS n,
              CAST(ceil(CAST(greatest(len(ws) - $ChunkOverlap, 1) AS DOUBLE)
                / $ChunkStride) AS INT) AS n_chunks
            FROM w),
      x AS (SELECT doc_id, ws, n,
              unnest(generate_series(0, n_chunks - 1)) AS i
            FROM c)
      SELECT doc_id,
             CAST(i + 1 AS BIGINT) AS chunk_seq,
             array_to_string(
               ws[i*$ChunkStride + 1 : i*$ChunkStride + $ChunkTokens], ' ')
               AS chunk_text,
             CAST(least(n - i*$ChunkStride, $ChunkTokens) AS BIGINT)
               AS chunk_tokens
      FROM x ORDER BY doc_id, chunk_seq"""))

  // ---- q68: fuzzy dedup — edit-distance cap on LSH-verified pairs ----
  // maxDist=6 keeps the planted 4-edit near-dups and drops the one
  // 8-edit pair the Jaccard gate alone admits: the cap demonstrably
  // refines, not rubber-stamps, the q21 pair set.

  val q68 = Q(
    "q68_edit_distance_dedup",
    (s, dir) =>
      Dedup.editDistanceNearDup(docs(s, dir), "doc_id", "text",
          shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6,
          maxDist = 6)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $wordsCte,
      t AS (SELECT doc_id, text FROM documents),
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      v AS (SELECT doc_a, doc_b FROM p WHERE j >= 0.6)
      SELECT doc_a, doc_b,
             CAST(levenshtein(ta.text, tb.text) AS INT) AS edit_dist
      FROM v JOIN t ta ON ta.doc_id = doc_a
             JOIN t tb ON tb.doc_id = doc_b
      WHERE levenshtein(ta.text, tb.text) <= 6
      ORDER BY doc_a, doc_b"""))

  // ---- q71: media dimension decode end-to-end (.png/.gif/.jpg files) ----

  /** Fixture files planted with known dimensions; the query must derive
    * them back from raw bytes — PNG/GIF via the codegen'd header
    * Columns, JPEG via the SOF marker scan in the typed pass.
    */
  private val mediaFixtures: Seq[(String, Array[Byte])] = {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = bytes( // 8-byte signature + IHDR head + 640x480 (BE u32s)
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x02, 0x80, 0x00, 0x00, 0x01, 0xE0)
    // GIF89a, 320x200 (LE u16s)
    val gif = bytes('G', 'I', 'F', '8', '9', 'a', 0x40, 0x01, 0xC8, 0x00)
    // SOI + 16-byte JFIF APP0 the scan must skip + SOF0 240x320
    val jpeg = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10) ++
      Array.fill[Byte](14)(0) ++
      bytes(0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0xF0, 0x01, 0x40)
    // canonical PCM WAV: byteRate 16000 B/s, 4000 data bytes -> 250 ms
    val wav = {
      def le32(v: Int) = Array[Byte]((v & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 24) & 0xFF).toByte)
      def le16(v: Int) = Array[Byte]((v & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte)
      "RIFF".getBytes("US-ASCII") ++ le32(36 + 4000) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
        "data".getBytes("US-ASCII") ++ le32(4000) ++
        Array.fill[Byte](4000)(0)
    }
    // CBR MP3 behind an ID3v2 tag: MPEG1 Layer3 128 kbps (header
    // FFFB90..), 4000 audio bytes -> 4000·8/128000 s = 250 ms; the
    // 22-byte ID3 payload must be skipped via its syncsafe size
    val mp3Cbr = "ID3".getBytes("US-ASCII") ++
      bytes(0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 22) ++
      Array.fill[Byte](22)(0) ++
      bytes(0xFF, 0xFB, 0x90, 0x00) ++ Array.fill[Byte](3996)(0)
    // VBR MP3: same first header (stereo -> side info 32), "Xing" tag
    // at frame offset 36 with the frames flag and a BE u32 count of
    // 441 frames -> 441·1152/44100 s = 11520 ms exactly
    val mp3Vbr = bytes(0xFF, 0xFB, 0x90, 0x00) ++
      Array.fill[Byte](32)(0) ++
      "Xing".getBytes("US-ASCII") ++
      bytes(0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x01, 0xB9) ++
      Array.fill[Byte](148)(0)
    // MP4 (ISO-BMFF): ftyp + moov{mvhd v0 (timescale 90000, duration
    // 270000 -> 3000 ms), trak{tkhd v0 (1920x1080 as 16.16 fixed)}};
    // the box walk must recover dims + duration from bytes alone
    val mp4 = {
      def be32(v: Long) = Array[Byte](((v >> 24) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        (v & 0xFF).toByte)
      def box(tp: String, payload: Array[Byte]) =
        be32(payload.length + 8L) ++ tp.getBytes("US-ASCII") ++ payload
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200))
      val mvhd = box("mvhd", bytes(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(90000) ++ be32(270000) ++ Array.fill[Byte](80)(0))
      val tkhd = box("tkhd", bytes(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1) ++ be32(0) ++ be32(270000) ++ Array.fill[Byte](52)(0) ++
        be32(1920L << 16) ++ be32(1080L << 16))
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    }
    Seq("img_1.png" -> png, "img_2.gif" -> gif, "img_3.jpg" -> jpeg,
      "clip_4.wav" -> wav, "clip_5.mp3" -> mp3Cbr, "clip_6.mp3" -> mp3Vbr,
      "vid_7.mp4" -> mp4,
      // truncated moov: the declared box size overruns EOF, so the
      // bounded walk must reject the WHOLE decode (all nulls) — even
      // though the intact mvhd sits before the cut, partial metadata
      // from a desynced file is overstated metadata
      "vid_8.mp4" -> mp4.dropRight(40))
  }

  val q71 = Q(
    "q71_media_dimensions",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q71_media_")
      mediaFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.extractFeatures(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
          col("duration_ms"))
        .orderBy("doc_id")
    },
    // the oracle states the PLANTED ground truth; Spark must recover it
    // from the bytes alone
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(24 AS BIGINT),
         CAST(640 AS INTEGER), CAST(480 AS INTEGER),
         CAST(NULL AS BIGINT)),
        (2, 10, 320, 200, NULL),
        (3, 29, 320, 240, NULL),
        (4, 4044, NULL, NULL, 250),
        (5, 4032, NULL, NULL, 250),
        (6, 196, NULL, NULL, 11520),
        (7, 232, 1920, 1080, 3000),
        (8, 192, NULL, NULL, NULL))
        AS t(doc_id, byte_len, width, height, duration_ms)
      ORDER BY doc_id"""))

  // ---- q72: grouped approximate top-k terms (candidate-pruned) ----

  val q72 = Q(
    "q72_approx_top_terms",
    (s, dir) =>
      // Misra-Gries candidates + exact recount: the oracle is the exact
      // grouped top-k; equality holds because every true top-5 term
      // clears the sketch's N_p/(capacity+1) survival bound by orders
      // of magnitude (TextAnalysisSpec proves containment under a
      // deliberately tiny capacity)
      TextAnalysis.approxTopTerms(docs(s, dir), "lang", "text", k = 5)
        .orderBy("lang", "rk"),
    Some("""
      WITH w AS (SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents),
      tok AS (SELECT lang, unnest(ws) AS term FROM w),
      c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS freq
            FROM tok WHERE term <> '' GROUP BY 1, 2),
      r AS (SELECT lang, term, freq,
                   CAST(row_number() OVER (
                     PARTITION BY lang ORDER BY freq DESC, term ASC) AS INT)
                     AS rk
            FROM c)
      SELECT lang, term, freq, rk FROM r WHERE rk <= 5
      ORDER BY lang, rk"""))

  // ---- q75: per-label vector centroids (the k-means update step) ----

  val q75 = Q(
    "q75_label_centroids",
    (s, dir) =>
      Similarity.labelCentroids(embs(s, dir), "label", "embedding")
        .orderBy("label", "pos"),
    Some(s"""
      WITH e AS (SELECT label,
                        generate_subscripts(embedding, 1) - 1 AS pos,
                        CAST(unnest(embedding) AS DOUBLE) AS x
                 FROM embeddings)
      SELECT CAST(label AS INTEGER) AS label, CAST(pos AS INTEGER) AS pos,
             ${Numerics.sqlFix("avg(x)", 4)} AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY label, pos
      ORDER BY label, pos"""))

  // ---- q76: curation filter cascade (Gopher-style rule funnel) ----

  val q76 = Q(
    "q76_filter_cascade",
    (s, dir) => TextAnalysis.filterCascade(docs(s, dir), "text"),
    Some("""
      WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
                 FROM documents),
      m AS (SELECT len(ws) AS ntok,
                   list_sum(list_transform(ws, t -> len(t))) * 1.0
                     / len(ws) AS mwl,
                   len(list_distinct(ws)) * 1.0 / len(ws) AS dr,
                   len(list_filter(ws, t -> t IN
                     ('the','a','of','and','to','in','is'))) * 1.0
                     / len(ws) AS sr
            FROM w),
      f AS (SELECT ntok >= 30 AS r1,
                   mwl >= 3.0 AND mwl <= 12.0 AS r2,
                   dr >= 0.3 AS r3,
                   sr >= 0.01 AS r4
            FROM m),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
                   CAST(count_if(r1) AS BIGINT) AS s1,
                   CAST(count_if(r1 AND r2) AS BIGINT) AS s2,
                   CAST(count_if(r1 AND r2 AND r3) AS BIGINT) AS s3,
                   CAST(count_if(r1 AND r2 AND r3 AND r4) AS BIGINT) AS s4
            FROM f)
      SELECT CAST(0 AS INTEGER) AS stage, 'input' AS rule, n0 AS n_pass FROM a
      UNION ALL SELECT 1, 'min_tokens', s1 FROM a
      UNION ALL SELECT 2, 'mean_word_len', s2 FROM a
      UNION ALL SELECT 3, 'distinct_ratio', s3 FROM a
      UNION ALL SELECT 4, 'stopword_presence', s4 FROM a
      ORDER BY stage"""))

  // ---- q77: embedding L2-norm histogram (array-fold analytics) ----
  // The norm is a strictly sequential left fold over the array in BOTH
  // engines (Spark `aggregate`, DuckDB `list_sum(list_transform(...))`
  // over doubles in list order), so the bucket edges are not a float
  // hazard: identical inputs, identical operation order, identical
  // IEEE result.

  val q77 = Q(
    "q77_norm_histogram",
    (s, dir) =>
      graft.SparkUtil.ensureParallelism(embs(s, dir))
        .select(sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as("nrm"))
        .select(least(floor(col("nrm") * 4.0), lit(19.0))
          .cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
    Some("""
      WITH n AS (SELECT sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                 FROM embeddings)
      SELECT CAST(least(floor(nrm * 4.0), 19.0) AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM n GROUP BY 1 ORDER BY bucket"""))

  // ---- q84: simhash radius retrieval (completes the q22 story) ----
  // Banded search is EXACT here, not approximate: ≤1 differing bit
  // must leave ≥3 of the 4 nibble bands identical, so the oracle is
  // the full all-pairs hamming scan and the hash must match it.

  val q84 = Q(
    "q84_simhash_radius",
    (s, dir) =>
      Dedup.simhashNearDup(docs(s, dir), "doc_id", "text", maxHamming = 1)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b"),
    Some {
      val terms = (0 until 16).map { k =>
        val shift = (14 - k / 4) * 4 + k % 4
        s"""(CASE WHEN list_sum([2*((('0x'||substr(md5(x),1,15))::BIGINT
           >> $shift) & 1)-1 for x in sh]) > 0
           THEN ${1 << k} ELSE 0 END)"""
      }.mkString(" + ")
      s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      sig AS (SELECT doc_id, CAST($terms AS INT) AS simhash FROM sh)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
      ORDER BY doc_a, doc_b"""
    })

  // ---- q93: chunk-level exact dedup (the paragraph-dedup pass) ----
  // Composes q57's chunking with q20's digest-aggregate shape: one
  // Generate, one hash-partitioned aggregate keyed by chunk digest;
  // overlapping near-dup docs share byte-identical chunks, which is
  // exactly what this pass removes at scale.

  val q93 = Q(
    "q93_chunk_dedup",
    (s, dir) =>
      Dedup.chunkExact(
          TextAnalysis.chunkDocuments(docs(s, dir), "doc_id", "text",
            chunkTokens = ChunkTokens, overlap = ChunkOverlap),
          "doc_id", "chunk_seq", "chunk_text")
        .orderBy("kept_doc_id", "kept_chunk_seq"),
    Some(s"""
      WITH $wordsCte,
      c AS (SELECT doc_id, ws, len(ws) AS n,
              CAST(ceil(CAST(greatest(len(ws) - $ChunkOverlap, 1) AS DOUBLE)
                / $ChunkStride) AS INT) AS n_chunks
            FROM w),
      x AS (SELECT doc_id, ws, n,
              unnest(generate_series(0, n_chunks - 1)) AS i
            FROM c),
      ch AS (SELECT doc_id, i + 1 AS chunk_seq,
               array_to_string(
                 ws[i*$ChunkStride + 1 : i*$ChunkStride + $ChunkTokens], ' ')
                 AS chunk_text
             FROM x),
      d AS (SELECT md5(chunk_text) AS chunk_digest, doc_id, chunk_seq
            FROM ch),
      r AS (SELECT chunk_digest, doc_id, chunk_seq,
                   row_number() OVER (PARTITION BY chunk_digest
                     ORDER BY doc_id, chunk_seq) AS rn,
                   count(*) OVER (PARTITION BY chunk_digest) AS n_copies
            FROM d)
      SELECT chunk_digest,
             CAST(doc_id AS BIGINT) AS kept_doc_id,
             CAST(chunk_seq AS BIGINT) AS kept_chunk_seq,
             CAST(n_copies AS BIGINT) AS n_copies
      FROM r WHERE rn = 1
      ORDER BY kept_doc_id, kept_chunk_seq"""))

  // ---- q112: maximal duplicated substring spans ----
  // The variable-length sibling of q93: chunk dedup catches aligned
  // paragraphs, this catches repeated substrings starting ANYWHERE —
  // the near-dup corpus shares long prefixes/suffixes that fixed
  // chunks split. k-gram digests count corpus-wide; runs of adjacent
  // duplicated positions fold into maximal spans (gaps-and-islands).

  val q112 = Q(
    "q112_duplicated_spans",
    (s, dir) =>
      Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text",
          k = 30, minSpan = 60)
        .orderBy("doc_id", "span_start"),
    Some("""
      WITH d AS (SELECT doc_id, text FROM documents
                 WHERE length(text) >= 30),
      p AS (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - 29)) AS pos
            FROM d),
      g AS (SELECT doc_id, pos, md5(substr(text, pos, 30)) AS gd FROM p),
      c AS (SELECT gd FROM g GROUP BY gd HAVING count(*) >= 2),
      dup AS (SELECT doc_id, pos FROM g JOIN c USING (gd)),
      i AS (SELECT doc_id, pos,
                   pos - row_number() OVER (
                     PARTITION BY doc_id ORDER BY pos) AS island
            FROM dup)
      SELECT doc_id,
             CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) - min(pos) + 30 AS BIGINT) AS span_len
      FROM i GROUP BY doc_id, island
      HAVING CAST(max(pos) - min(pos) + 30 AS BIGINT) >= 60
      ORDER BY doc_id, span_start"""))

  // ---- q97: term document-frequency histogram ----

  val q97 = Q(
    "q97_df_histogram",
    (s, dir) =>
      TextAnalysis.dfHistogram(docs(s, dir), "doc_id", "text"),
    Some(s"""
      WITH $wordsCte,
      tok AS (SELECT doc_id, unnest(list_distinct(ws)) AS term FROM w),
      d AS (SELECT term, count(*) AS df FROM tok WHERE term <> ''
            GROUP BY 1)
      SELECT CAST(df AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS n_terms
      FROM d GROUP BY df ORDER BY df"""))

  // ---- q98: fuzzy decontamination (per-pair n-gram overlap) ----
  // q43 answers "how many probe grams does this doc share"; q98 makes
  // the per-example decision: which (train doc, benchmark item) pairs
  // exceed an overlap FRACTION of the benchmark item's gram set. Probe
  // side broadcasts; both engines threshold the fix4-rounded fraction.

  val q98 = Q(
    "q98_fuzzy_decontamination",
    (s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.fuzzyContamination(
          corpus = d.where(col("doc_id") >= 20),
          probe = d.where(col("doc_id") < 20),
          idCol = "doc_id", textCol = "text", n = 8, minOverlap = 0.2)
        .orderBy("doc_id", "probe_id")
    },
    Some(s"""
      WITH $wordsCte,
      g AS (SELECT doc_id, ${shingleExpr(8)} AS gs FROM w),
      pg AS (SELECT doc_id AS probe_id, unnest(gs) AS gram FROM g
             WHERE doc_id < 20),
      pn AS (SELECT probe_id, count(*) AS n_pg FROM pg GROUP BY 1),
      cg AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id >= 20),
      j AS (SELECT cg.doc_id, pg.probe_id, count(*) AS shared
            FROM cg JOIN pg USING (gram) GROUP BY 1, 2),
      f AS (SELECT j.doc_id, j.probe_id,
                   ${Numerics.sqlFix("CAST(shared AS DOUBLE) / n_pg", 4)}
                     AS overlap_frac
            FROM j JOIN pn USING (probe_id))
      SELECT doc_id, CAST(probe_id AS BIGINT) AS probe_id, overlap_frac
      FROM f WHERE overlap_frac >= 0.2
      ORDER BY doc_id, probe_id"""))

  // ---- q99: bigram LM negative log-likelihood (perplexity proxy) ----

  val q99 = Q(
    "q99_bigram_logloss",
    (s, dir) =>
      TextAnalysis.bigramLogLoss(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
    Some(s"""
      WITH $wordsCte,
      x AS (SELECT doc_id, ws,
              unnest(generate_series(1, len(ws) - 1)) AS i
            FROM w),
      b AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM x),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
      c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             ${Numerics.sqlFix(
      "avg(ln(CAST(c1 AS DOUBLE)) - ln(CAST(c2 AS DOUBLE)))", 4)}
               AS avg_nll
      FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---- q100: int8 embedding-quantization reconstruction error ----

  val q100 = Q(
    "q100_quantization_error",
    (s, dir) =>
      Similarity.quantizationError(embs(s, dir), "vec_id", "embedding")
        .orderBy("vec_id"),
    Some(s"""
      WITH e AS (SELECT vec_id,
                        generate_subscripts(embedding, 1) - 1 AS pos,
                        CAST(unnest(embedding) AS DOUBLE) AS x
                 FROM embeddings),
      bo AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
      q AS (SELECT vec_id, x, mn, mx,
                   CASE WHEN mx > mn
                     THEN floor((x - mn) / (mx - mn) * 255 + 0.5)
                     ELSE 0.0 END AS code
            FROM e JOIN bo USING (pos)),
      d AS (SELECT vec_id,
                   abs(x - (mn + code * (mx - mn) / 255)) AS err
            FROM q)
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             ${Numerics.sqlFix("max(err)", 4)} AS max_abs_err,
             ${Numerics.sqlFix("avg(err)", 4)} AS avg_abs_err,
             CAST(count(*) AS BIGINT) AS n_dims
      FROM d GROUP BY vec_id ORDER BY vec_id"""))

  // ---- q104: BM25 retrieval top-k for a probe query set ----
  // The quality-targeted selection primitive. Oracle note: every
  // constant is kept in DOUBLE arithmetic on both sides (a bare
  // DuckDB decimal literal would drag the math into DECIMAL), and
  // operation ORDER matches the Column expression exactly so both
  // engines round identically; ranking compares the fix4 score.

  private val Bm25Queries = Seq(
    (1L, "spark window agg"),
    (2L, "fast filter scan"),
    (3L, "customer join query"))

  val q104 = Q(
    "q104_bm25_topk",
    (s, dir) => {
      import s.implicits._
      TextAnalysis.bm25TopK(
          docs(s, dir), "doc_id", "text",
          Bm25Queries.toDF("query_id", "query_text"), k = 5)
        .orderBy("query_id", "bm25_rank")
    },
    Some {
      val qvals = Bm25Queries
        .flatMap { case (id, text) =>
          text.split("\\s+").distinct.map(t => s"(CAST($id AS BIGINT), '$t')")
        }
        .mkString(", ")
      s"""
      WITH $wordsCte,
      tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             FROM tf GROUP BY 1),
      dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
      sc AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
             FROM dl),
      q AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
      s AS (SELECT q.query_id, tf.doc_id,
                   ${Numerics.sqlFix(
        "sum(ln(1 + (CAST(n_docs - df AS DOUBLE) + 0.5) " +
          "/ (CAST(df AS DOUBLE) + 0.5)) " +
          "* tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))", 4)}
                     AS score
            FROM tf JOIN q USING (term) JOIN dfq USING (term)
                 JOIN dl USING (doc_id) CROSS JOIN sc
            GROUP BY 1, 2),
      r AS (SELECT query_id, doc_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id ASC) AS INT) AS bm25_rank,
                   score
            FROM s)
      SELECT query_id, doc_id, bm25_rank, score
      FROM r WHERE bm25_rank <= 5
      ORDER BY query_id, bm25_rank"""
    })

  // ---- q106: triangle census of the near-dup graph ----
  // CC (q41) says which docs group; triangle density says how
  // clique-like the groups are. Edges = the q84 simhash-radius pairs;
  // the count uses the degree-oriented algorithm (wedges enumerate at
  // each triangle's unique lowest-degree apex).

  val q106 = Q(
    "q106_triangle_census",
    (s, dir) =>
      graft.operators.Graphs.triangleStats(
        Dedup.simhashNearDup(docs(s, dir), "doc_id", "text", maxHamming = 1),
        "id_a", "id_b"),
    Some {
      val terms = (0 until 16).map { k =>
        val shift = (14 - k / 4) * 4 + k % 4
        s"""(CASE WHEN list_sum([2*((('0x'||substr(md5(x),1,15))::BIGINT
           >> $shift) & 1)-1 for x in sh]) > 0
           THEN ${1 << k} ELSE 0 END)"""
      }.mkString(" + ")
      s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      sig AS (SELECT doc_id, CAST($terms AS INT) AS simhash FROM sh),
      e AS (SELECT a.doc_id AS a, b.doc_id AS b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
      d AS (SELECT n, count(*) AS deg FROM
              (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
            GROUP BY 1),
      o AS (SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                     THEN e.a ELSE e.b END AS u,
                   CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                     THEN e.b ELSE e.a END AS v
            FROM e JOIN d da ON da.n = e.a JOIN d db ON db.n = e.b),
      wd AS (SELECT o1.u, o1.v AS x, o2.v AS y
             FROM o o1 JOIN o o2 USING (u) WHERE o1.v < o2.v),
      c AS (SELECT least(u, v) AS x, greatest(u, v) AS y FROM o)
      SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
             CAST((SELECT sum((deg * (deg - 1)) // 2) FROM d) AS BIGINT)
               AS n_wedges,
             CAST((SELECT count(*) FROM wd JOIN c USING (x, y)) AS BIGINT)
               AS n_triangles"""
    })

  // ---- q127: reciprocal-rank fusion (BM25 + term overlap) ----
  // Hybrid retrieval: the q104 BM25 ranking (top 10) fused with a
  // distinct-term-overlap ranking via RRF (k=60), top 5 out. Both
  // source rankings and the fusion are re-derived in SQL; ranks
  // compare on fix4-rounded scores with id tiebreaks at every stage,
  // so no float ordering ambiguity exists anywhere.

  val q127 = Q(
    "q127_rrf_fusion",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val queries = Bm25Queries.toDF("query_id", "query_text")
      val bm25 = TextAnalysis.bm25TopK(d, "doc_id", "text", queries, k = 10)
        .select(col("query_id"), col("doc_id"),
          col("bm25_rank").as("rank"))
      val qterms = queries.select(col("query_id"),
        explode(array_distinct(graft.functions.Texts.words(
          col("query_text")))).as("term"))
      val overlap = d
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.Texts.words(col("text")))).as("term"))
        .join(broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).as("ov"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("ov").desc, col("doc_id").asc)))
        .where(col("rank") <= 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      TextAnalysis.rrfFuse(Seq(bm25, overlap),
          "query_id", "doc_id", "rank", topK = 5)
        .orderBy("query_id", "rrf_rank")
    },
    Some {
      val qvals = Bm25Queries
        .flatMap { case (id, text) =>
          text.split("\\s+").distinct.map(t => s"(CAST($id AS BIGINT), '$t')")
        }
        .mkString(", ")
      s"""
      WITH $wordsCte,
      tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             FROM tf GROUP BY 1),
      dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
      sc AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
             FROM dl),
      q AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
      s AS (SELECT q.query_id, tf.doc_id,
                   ${Numerics.sqlFix(
        "sum(ln(1 + (CAST(n_docs - df AS DOUBLE) + 0.5) " +
          "/ (CAST(df AS DOUBLE) + 0.5)) " +
          "* tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))", 4)}
                     AS score
            FROM tf JOIN q USING (term) JOIN dfq USING (term)
                 JOIN dl USING (doc_id) CROSS JOIN sc
            GROUP BY 1, 2),
      bm AS (SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, doc_id ASC) AS rnk
             FROM s),
      ov AS (SELECT q.query_id, dt.doc_id, CAST(count(*) AS BIGINT) AS ov
             FROM (SELECT DISTINCT doc_id, term FROM tok) dt
             JOIN q ON q.term = dt.term
             GROUP BY 1, 2),
      ovr AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ov DESC, doc_id ASC) AS rnk
              FROM ov),
      u AS (SELECT query_id, doc_id, rnk FROM bm WHERE rnk <= 10
            UNION ALL
            SELECT query_id, doc_id, rnk FROM ovr WHERE rnk <= 10),
      f AS (SELECT query_id, doc_id,
                   ${Numerics.sqlFix(
        "sum(CAST(1 AS DOUBLE) / (60 + rnk))", 4)} AS rrf_score
            FROM u GROUP BY 1, 2),
      r AS (SELECT query_id, doc_id, rrf_score,
                   CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY rrf_score DESC, doc_id ASC) AS INT)
                     AS rrf_rank
            FROM f)
      SELECT query_id, doc_id, rrf_rank, rrf_score
      FROM r WHERE rrf_rank <= 5
      ORDER BY query_id, rrf_rank"""
    })

  // ---- q126: ANN recall@k audit (LSH vs exact brute force) ----
  // The index-quality readout: same query set, same k, the LSH result
  // scored against the exact top-5. Both sub-searches are the already
  // oracle-gated q25/q26 pipelines, so the audit's correctness rides
  // on composing their CTE chains and counting id overlaps.

  val q126 = Q(
    "q126_ann_recall",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity.recallAtK(
          Similarity.bruteForceTopK(
            e.where(col("vec_id") < 10), e, "vec_id", "embedding", k = 5),
          Similarity.lshTopK(
            e.where(col("vec_id") < 10), e, "vec_id", "embedding",
            dim = 64, k = 5, bands = 2, bitsPerBand = 4),
          "query_id", "neighbor_id")
        .orderBy("query_id")
    },
    Some(s"""
      WITH ${planeBitsSql(2, 4)},
      tscored AS (
        SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos
        FROM (SELECT * FROM e WHERE vec_id < 10) a
        JOIN e c ON a.vec_id != c.vec_id),
      truth AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id ASC) AS rnk
          FROM tscored) WHERE rnk <= 5),
      cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM (SELECT * FROM sig WHERE vec_id < 10) q
        JOIN sig c
          ON q.vec_id != c.vec_id AND (q.k0 = c.k0 OR q.k1 = c.k1)),
      ascored AS (
        SELECT cand.query_id, cand.neighbor_id, $cosSql AS cos
        FROM cand
        JOIN (SELECT vec_id, v FROM e) a ON a.vec_id = cand.query_id
        JOIN (SELECT vec_id, v FROM e) c ON c.vec_id = cand.neighbor_id),
      approx AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id ASC) AS rnk
          FROM ascored) WHERE rnk <= 5)
      SELECT t.query_id,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
             ${Numerics.sqlFix(
        "CAST(count(a.neighbor_id) AS DOUBLE) / count(*)", 4)} AS recall
      FROM truth t
      LEFT JOIN approx a
        ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
      GROUP BY 1 ORDER BY 1"""))

  // ---- q125: k-core of the near-dup graph ----
  // k=2 over the simhash radius-1 graph: the 2-core keeps only nodes
  // inside cycles/cliques of duplication (template families), peeling
  // pendant chains and isolated pairs. The oracle chains 18 idempotent
  // peel steps — the measured peel depth is 2 at sf0.01 and 12 at
  // sf0.1, and a step past the fixpoint is the identity, so any chain
  // >= the true depth yields THE k-core (which is unique and
  // order-independent).

  val q125 = Q(
    "q125_kcore",
    (s, dir) =>
      graft.operators.Graphs.kcoreDegrees(
          Dedup.simhashNearDup(docs(s, dir), "doc_id", "text", maxHamming = 1),
          "id_a", "id_b", k = 2)
        .withColumnRenamed("node", "doc_id")
        .orderBy("doc_id"),
    Some {
      val terms = (0 until 16).map { k =>
        val shift = (14 - k / 4) * 4 + k % 4
        s"""(CASE WHEN list_sum([2*((('0x'||substr(md5(x),1,15))::BIGINT
           >> $shift) & 1)-1 for x in sh]) > 0
           THEN ${1 << k} ELSE 0 END)"""
      }.mkString(" + ")
      def peel(prev: String, cur: String) =
        s"""$cur AS (SELECT src, dst FROM (
             SELECT src, dst,
               count(*) OVER (PARTITION BY src) AS sd,
               count(*) OVER (PARTITION BY dst) AS dd
             FROM $prev) WHERE sd >= 2 AND dd >= 2)"""
      val chain = (1 to 18)
        .map(i => peel(s"s${i - 1}", s"s$i")).mkString(",\n      ")
      s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      sig AS (SELECT doc_id, CAST($terms AS INT) AS simhash FROM sh),
      e AS (SELECT a.doc_id AS a, b.doc_id AS b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
      s0 AS (SELECT a AS src, b AS dst FROM e
             UNION ALL SELECT b, a FROM e),
      $chain
      SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
      FROM s18 GROUP BY 1 ORDER BY doc_id"""
    })

  // ---- q113: concatenation-packing sequence-boundary map ----
  // Docs lie in the deterministic q64 shuffle order, the token stream
  // cuts at 2048-token boundaries (docs cross boundaries, GPT-style);
  // the map gives each doc its offset and sequence span. The Spark
  // side is a distributed prefix sum (range partition + local window
  // + broadcast partition prefixes) whose output is partition-count
  // independent — which is exactly what the single-window oracle
  // checks.

  val q113 = Q(
    "q113_packing_map",
    (s, dir) => {
      // Run + stage + release (the q175/q182 pattern): a production
      // packing job materializes the map anyway; staging it lets the
      // cached cumsum rows release before the query returns
      val run = Sampling.packingMapRun(
        docs(s, dir), "doc_id", "n_chars", seqLen = 2048)
      val p = s"${Scratch.dir(s, "q113_pack_")}/m"
      run.result.write.mode("overwrite").parquet(p)
      run.release()
      s.read.parquet(p).orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens,
                        ('0x'||substr(md5('0|'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                          AS ord
                 FROM documents WHERE n_chars > 0),
      c AS (SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY ord, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
            FROM t)
      SELECT doc_id, n_tokens,
             CAST(e - n_tokens AS BIGINT) AS start_offset,
             CAST((e - n_tokens) // 2048 AS BIGINT) AS first_seq,
             CAST((e - 1) // 2048 AS BIGINT) AS last_seq,
             CAST((e - 1) // 2048 - (e - n_tokens) // 2048 + 1 AS BIGINT)
               AS n_seqs
      FROM c ORDER BY doc_id"""))

  // ---- q114: temperature-based source mixture reweighting ----
  // The alpha=0.5 temperature rule (sqrt counts, renormalized) that
  // multilingual/multi-source training mixes use to upweight small
  // sources; sampling_factor is the realized per-source rate. sqrt is
  // IEEE-correctly-rounded, so both engines derive identical weights
  // before the fix4 rounding.

  val q114 = Q(
    "q114_mixture_weights",
    (s, dir) =>
      Sampling.mixtureWeights(docs(s, dir), "source", alpha = 0.5)
        .orderBy("source"),
    Some(s"""
      WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY 1),
      t AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w FROM c),
      s AS (SELECT CAST(sum(w) AS DOUBLE) AS tw,
                   CAST(sum(n_docs) AS BIGINT) AS tn
            FROM t)
      SELECT source, n_docs,
             ${Numerics.sqlFix("w / tw", 4)} AS weight,
             ${Numerics.sqlFix("w / tw * tn / n_docs", 4)} AS sampling_factor
      FROM t, s ORDER BY source"""))

  // ---- q115: PageRank centrality of the near-dup graph ----
  // Same simhash pair source as q106; three fix4-stabilized power
  // iterations (each iteration's rounding hands both engines
  // bit-identical inputs for the next); singleton docs take the
  // teleport-only fixed point.

  val q115 = Q(
    "q115_pagerank",
    (s, dir) =>
      graft.operators.Graphs.pagerank(
          docs(s, dir), "doc_id",
          Dedup.simhashNearDup(docs(s, dir), "doc_id", "text", maxHamming = 1),
          "id_a", "id_b", iters = 3)
        .orderBy("doc_id"),
    Some {
      val terms = (0 until 16).map { k =>
        val shift = (14 - k / 4) * 4 + k % 4
        s"""(CASE WHEN list_sum([2*((('0x'||substr(md5(x),1,15))::BIGINT
           >> $shift) & 1)-1 for x in sh]) > 0
           THEN ${1 << k} ELSE 0 END)"""
      }.mkString(" + ")
      // the fixed-point integer recurrence (see Graphs.pagerankRun):
      // order-independent BIGINT sums, bit-identical across engines
      def iterCte(prev: String, cur: String) =
        s"""$cur AS (SELECT s.dst AS id,
                   CAST(1500 AS BIGINT) +
                     (85 * CAST(sum((p.r * 10000) // dg.outdeg) AS BIGINT)
                       + 500000) // 1000000 AS r
             FROM sym s JOIN dg ON dg.src = s.src
                  JOIN $prev p ON p.id = s.src
             GROUP BY s.dst)"""
      s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      sig AS (SELECT doc_id, CAST($terms AS INT) AS simhash FROM sh),
      e AS (SELECT a.doc_id AS a, b.doc_id AS b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
      sym AS (SELECT a AS src, b AS dst FROM e
              UNION ALL SELECT b, a FROM e),
      dg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
             FROM sym GROUP BY 1),
      r0 AS (SELECT src AS id, CAST(10000 AS BIGINT) AS r FROM dg),
      ${iterCte("r0", "r1")},
      ${iterCte("r1", "r2")},
      ${iterCte("r2", "r3")}
      SELECT d.doc_id,
             CAST(coalesce(r3.r, 1500) AS DOUBLE) / 10000.0 AS rank
      FROM documents d LEFT JOIN r3 ON r3.id = d.doc_id
      ORDER BY d.doc_id"""
    })

  // ---- q116: top-k PMI collocations (phrase mining) ----
  // All counts exact longs; the PMI double derives identically in both
  // engines before the fix4 ranking value, and ties break on the
  // bigram text so the LIMIT is deterministic.

  val q116 = Q(
    "q116_pmi_collocations",
    (s, dir) =>
      TextAnalysis.pmiCollocations(docs(s, dir), "text", minCount = 5, k = 20),
    Some(s"""
      WITH $wordsCte,
      x AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM w),
      b AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM x),
      c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
             FROM b GROUP BY 1, 2 HAVING count(*) >= 5),
      l AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_a FROM b GROUP BY 1),
      r AS (SELECT w2, CAST(count(*) AS BIGINT) AS c_b FROM b GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_bigrams FROM b)
      SELECT w1, w2, c_ab,
             ${Numerics.sqlFix(
        "ln(CAST(c_ab AS DOUBLE) * n_bigrams / (CAST(c_a AS DOUBLE) * c_b))",
        4)} AS pmi
      FROM c2 JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
      ORDER BY pmi DESC, w1, w2 LIMIT 20"""))

  // ---- q120: prefix-filtered Jaccard join (exact-recall PPJoin) ----
  // Same pair semantics as q23 (bigram-set Jaccard >= 0.6) but found
  // by prefix filtering instead of MinHash-LSH: the oracle is the
  // identical exact all-pairs SQL, and because prefix filtering has
  // guaranteed recall, any pair LSH banding could theoretically miss
  // would show up here as an oracle diff.

  val q120 = Q(
    "q120_prefix_jaccard_join",
    (s, dir) =>
      Dedup.prefixFilterJaccard(docs(s, dir), "doc_id", "text",
          shingleWidth = 2, threshold = 0.6)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b"),
    Some(jaccardPairsSql(2, 0.6)))

  // ---- q110: per-source language-distribution entropy ----

  val q110 = Q(
    "q110_source_entropy",
    (s, dir) =>
      TextAnalysis.categoryEntropy(docs(s, dir), "source", "lang")
        .orderBy("source"),
    Some(s"""
      WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
                 FROM documents GROUP BY 1, 2),
      t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
            FROM c GROUP BY 1),
      p AS (SELECT c.source, CAST(c.c AS DOUBLE) / t.n AS p, t.n
            FROM c JOIN t USING (source))
      SELECT source,
             CAST(any_value(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_categories,
             ${Numerics.sqlFix("-sum(p * ln(p))", 4)} AS entropy
      FROM p GROUP BY source
      ORDER BY source"""))

  // ---- q128: BPE merge induction (tokenizer-trainer steps) ----
  // Two merge iterations over the word-frequency table: iteration 1's
  // winning pair is replaced by chr(1) (left-to-right non-overlapping
  // `replace` in BOTH engines), iteration 2 recounts. Exact long
  // counts + pair-string tie-breaks make the merge decisions and both
  // top-10 tables engine-identical; placeholders expand back to
  // readable symbols in the output.

  val q128 = Q(
    "q128_bpe_merges",
    (s, dir) =>
      TextAnalysis.bpeMergeSteps(docs(s, dir), "text", iters = 2, topK = 10),
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT unnest(ws) AS word FROM w),
      wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
             FROM occ WHERE len(word) >= 2 GROUP BY 1),
      x1 AS (SELECT word, freq, unnest(range(1, len(word))) AS i FROM wf),
      p1 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x1 GROUP BY 1),
      b1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      t1 AS (SELECT 1 AS iter, pair, cnt FROM p1
             ORDER BY cnt DESC, pair LIMIT 10),
      w2 AS (SELECT replace(word, (SELECT pair FROM b1), chr(1)) AS word,
                    freq
             FROM wf),
      x2 AS (SELECT word, freq, unnest(range(1, len(word))) AS i
             FROM w2 WHERE len(word) >= 2),
      p2 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x2 GROUP BY 1),
      t2 AS (SELECT 2 AS iter, pair, cnt FROM p2
             ORDER BY cnt DESC, pair LIMIT 10),
      u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2)
      SELECT iter,
             replace(substr(pair, 1, 1), chr(1),
                     (SELECT pair FROM b1)) AS symbol_a,
             replace(substr(pair, 2, 1), chr(1),
                     (SELECT pair FROM b1)) AS symbol_b,
             cnt AS pair_count
      FROM u
      ORDER BY iter, pair_count DESC, symbol_a, symbol_b"""))

  // ---- q129: bloom-prefiltered exact decontamination ----
  // Same probe/corpus split as q43; the result is REQUIRED to equal
  // the plain exact anti-join (the oracle), which is exactly the
  // operator's guarantee: the bloom only routes rows, never decides.

  val q129 = Q(
    "q129_bloom_decontaminate",
    (s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.bloomDecontaminate(
          corpus = d.where(col("doc_id") >= 20),
          probe = d.where(col("doc_id") < 20),
          textCol = "text")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id FROM documents
      WHERE doc_id >= 20
        AND md5(lower(trim(text))) NOT IN
          (SELECT md5(lower(trim(text))) FROM documents WHERE doc_id < 20)
      ORDER BY doc_id"""))

  // ---- q131: MinHash calibration audit (est vs exact Jaccard) ----
  // The estimator-honesty companion to q126's ANN recall audit: the
  // md5-family minhash estimate is itself oracle-replicated, so the
  // error column is engine-exact, not asserted.

  val q131 = Q(
    "q131_minhash_calibration",
    (s, dir) =>
      Dedup.minhashCalibration(docs(s, dir), "doc_id", "text",
          shingleWidth = 3, threshold = 0.6, numHashes = 16)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy("doc_a", "doc_b"),
    Some {
      val minCols = (0 until 16)
        .map(i => s"list_min([substr(md5('$i|'||x),1,15) for x in sh]) AS m$i")
        .mkString(",\n             ")
      val matchSum = (0 until 16)
        .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      sig AS (SELECT doc_id,
             $minCols
             FROM sh),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh))) AS j
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      v AS (SELECT doc_a, doc_b, ${Numerics.sqlFix("j", 4)} AS exact_sim
            FROM p WHERE j >= 0.6),
      c AS (SELECT doc_a, doc_b, exact_sim,
                   ${Numerics.sqlFix(
        s"CAST($matchSum AS DOUBLE) / 16.0", 4)} AS est_sim
            FROM v JOIN sig sa ON sa.doc_id = doc_a
                   JOIN sig sb ON sb.doc_id = doc_b)
      SELECT doc_a, doc_b, exact_sim, est_sim,
             ${Numerics.sqlFix("abs(exact_sim - est_sim)", 4)} AS abs_err
      FROM c ORDER BY doc_a, doc_b"""
    })

  // ---- q133: cross-source duplication matrix ----
  // Data-governance readout over the near-dup graph: which source
  // pairs share content, how much, and how similar. Mean similarity
  // sums fix4-scaled exact longs (order-independent) before the one
  // float division.

  val q133 = Q(
    "q133_source_dup_matrix",
    (s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      Dedup.minhashNearDup(docs(s, dir), "doc_id", "text",
          shingleWidth = 3, threshold = 0.6)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("s_a")),
          "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("s_b")),
          "id_b")
        .select(least(col("s_a"), col("s_b")).as("source_a"),
          greatest(col("s_a"), col("s_b")).as("source_b"),
          floor(col("jaccard_sim") * 10000 + 0.5).cast("long").as("jc"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"),
          Numerics.fix4(sum(col("jc")).cast("double") /
            (count(lit(1)) * 10000.0)).as("mean_sim"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh))) AS j
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      v AS (SELECT doc_a, doc_b, ${Numerics.sqlFix("j", 4)} AS js
            FROM p WHERE j >= 0.6),
      m AS (SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(floor(js * 10000 + 0.5) AS BIGINT) AS jc
            FROM v JOIN documents da ON da.doc_id = doc_a
                   JOIN documents db ON db.doc_id = doc_b)
      SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
             ${Numerics.sqlFix(
      "CAST(sum(jc) AS DOUBLE) / (count(*) * 10000.0)", 4)} AS mean_sim
      FROM m GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---- q141: semantic (embedding-level) duplicate clusters ----
  // The embedding companion to q41's text CC: hyperplane-LSH cosine
  // pairs (q24's candidate shape) resolve into connected components —
  // "semantic dedup" keeps one representative per meaning cluster even
  // when the texts share no n-grams. Same scale shape as q41: banded
  // candidates (never all-pairs) + the linear-plan CC loop.

  val q141 = Q(
    "q141_embedding_dup_clusters",
    (s, dir) => {
      val e = embs(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      // Exact-replica collapse BEFORE the component loop: replicated
      // corpora (the 100x sweep shape, and any real crawl) explode the
      // near-dup pair set quadratically per replica group — measured
      // 1288 s warm at 100x for the CC loop over the expanded graph.
      // Identical non-zero vectors always share every LSH bucket and
      // score cos = 1 >= threshold, so each replica group is
      // intra-connected and components over DISTINCT vectors expand to
      // exactly the same clusters (the group's min id is its
      // representative, and the cluster's global min id is itself a
      // representative). Zero-norm vectors never get edges (cosine is
      // undefined; embeddingNearDup excludes them), so they must NOT
      // collapse — each keeps a unique digest and stays a singleton.
      val nonzero = exists(col("embedding"), x => x =!= lit(0.0f))
      val keyed = e.withColumn("digest",
        when(nonzero, md5(to_json(col("embedding"))))
          .otherwise(concat(lit("z#"), col("vec_id").cast("string"))))
      val reps = keyed.groupBy("digest").agg(min(col("vec_id")).as("rep"))
      val mapping = keyed.join(reps, "digest")
        .select(col("vec_id"), col("rep"))
      val repVecs = e.join(reps.select(col("rep").as("vec_id")), "vec_id")
      val pairs = Similarity.embeddingNearDup(repVecs, "vec_id",
        "embedding", dim = 64, bands = 2, bitsPerBand = 4, threshold = 0.35)
      // semantic components CHAIN (a low cosine threshold strings
      // same-topic vectors into long paths), so the diameter bound is
      // looser than near-clique text dups — give the CC loop headroom
      val labels = Dedup.clustersFromPairs(
        repVecs.select(col("vec_id")), "vec_id", pairs, maxIter = 50)
      mapping
        .join(labels.withColumnRenamed("vec_id", "rep"), "rep")
        .select(col("vec_id"), col("cluster_id"))
        .orderBy("vec_id")
    },
    Some(s"""
      WITH RECURSIVE ${planeBitsSql(2, 4)},
      p AS (
        SELECT a.vec_id AS va, c.vec_id AS vb
        FROM sig a JOIN sig c
          ON a.vec_id < c.vec_id AND (a.k0 = c.k0 OR a.k1 = c.k1)
        WHERE $cosSql >= 0.35),
      edges AS (SELECT va AS src, vb AS dst FROM p
                UNION ALL
                SELECT vb, va FROM p),
      reach(a, b) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.b = ed.src)
      SELECT a AS vec_id, min(b) AS cluster_id
      FROM reach GROUP BY a ORDER BY vec_id"""))

  // ---- q146: count-min sketch term frequencies + exact error audit ----
  // The constant-memory frequency structure for unbounded vocabularies
  // (shuffle keyed by depth·width cells, never by term), audited here
  // against exact counts for the top-20 terms. Estimates are
  // deterministic (md5-derived cell hashing both engines compute
  // bit-identically), so est_cnt/over_est hash-match, not just bound.

  private val cmsWidth = 1024
  private val cmsDepth = 4
  private val cmsTopN = 20

  val q146 = Q(
    "q146_cms_frequency",
    (s, dir) =>
      TextAnalysis.cmsTermFrequency(
          Tables(s, dir, "documents"), "text",
          width = cmsWidth, depth = cmsDepth, topN = cmsTopN)
        .orderBy(col("exact_cnt").desc, col("term")),
    Some(raw"""
      WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)),
                      '\s+')) AS term
                    FROM documents),
      t AS (SELECT term FROM toks WHERE len(term) > 0),
      rs AS (SELECT unnest(range($cmsDepth)) AS r),
      cells AS (SELECT r,
                       ('0x' || substr(md5(CAST(r AS VARCHAR)||'|'||term),
                         1, 15))::BIGINT % $cmsWidth AS cell
                FROM t, rs),
      sk AS (SELECT r, cell, CAST(count(*) AS BIGINT) AS cell_cnt
             FROM cells GROUP BY r, cell),
      ex AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
             FROM t GROUP BY term
             ORDER BY exact_cnt DESC, term LIMIT $cmsTopN),
      pr AS (SELECT term, exact_cnt, r,
                    ('0x' || substr(md5(CAST(r AS VARCHAR)||'|'||term),
                      1, 15))::BIGINT % $cmsWidth AS cell
             FROM ex, rs)
      SELECT p.term,
             max(p.exact_cnt) AS exact_cnt,
             min(s.cell_cnt) AS est_cnt,
             min(s.cell_cnt) - max(p.exact_cnt) AS over_est
      FROM pr p JOIN sk s ON s.r = p.r AND s.cell = p.cell
      GROUP BY p.term ORDER BY exact_cnt DESC, term"""))

  // ---- q151: hard-negative mining ----
  // Per probe, top-5 candidates with exact cosine in [0.1, 0.35) —
  // informative contrastive negatives below q24's near-dup band
  // (>= 0.35). Candidates come from the same LSH (band, bucket)
  // equi-join as q26; the oracle replays the bucket join and band
  // filter in SQL.

  val q151 = Q(
    "q151_hard_negatives",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity.hardNegatives(
          e.where(col("vec_id") < 10), e, "vec_id", "embedding",
          dim = 64, k = 5, lo = 0.1, hi = 0.35,
          bands = 2, bitsPerBand = 4)
        .orderBy("query_id", "nn_rank")
    },
    Some(s"""
      WITH ${planeBitsSql(2, 4)},
      cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM (SELECT * FROM sig WHERE vec_id < 10) q
        JOIN sig c
          ON q.vec_id != c.vec_id AND (q.k0 = c.k0 OR q.k1 = c.k1)),
      scored AS (
        SELECT query_id, neighbor_id, $cosSql AS cos
        FROM cand
        JOIN (SELECT vec_id, v FROM e) a ON a.vec_id = cand.query_id
        JOIN (SELECT vec_id, v FROM e) c ON c.vec_id = cand.neighbor_id),
      banded AS (SELECT * FROM scored WHERE cos >= 0.1 AND cos < 0.35),
      ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS INT) AS nn_rank,
               ${Numerics.sqlFix("cos", 4)} AS cos_sim
        FROM banded)
      SELECT query_id, neighbor_id, nn_rank, cos_sim
      FROM ranked WHERE nn_rank <= 5
      ORDER BY query_id, nn_rank"""))

  // ---- q152: source-concentration Gini audit ----
  // Token mass per (lang, source): a mix that is diverse by source
  // count can still be one domain by mass — Gini + top-share is the
  // one-pass readout. All-integer numerator, fixed-point output.

  val q152 = Q(
    "q152_gini_source",
    (s, dir) =>
      Profile.giniConcentration(
          Tables(s, dir, "documents"), "lang", "source",
          size(graft.functions.Texts.words(col("text"))).cast("long"))
        .orderBy("lang"),
    Some(raw"""
      WITH d AS (SELECT lang, source,
                        CAST(len(string_split_regex(lower(trim(text)),
                          '\s+')) AS BIGINT) AS wt
                 FROM documents),
      u AS (SELECT lang, source, CAST(sum(wt) AS BIGINT) AS w
            FROM d GROUP BY lang, source),
      r AS (SELECT lang, source, w,
                   CAST(row_number() OVER (PARTITION BY lang
                     ORDER BY w, source) AS BIGINT) AS i
            FROM u),
      a AS (SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_units,
                   CAST(sum(w) AS BIGINT) AS total_w,
                   CAST(sum(i*w) AS BIGINT) AS iw,
                   CAST(max(w) AS BIGINT) AS max_w
            FROM r GROUP BY lang)
      SELECT lang, n_units, total_w,
             ${Numerics.sqlFix(
               "(2.0*CAST(iw AS DOUBLE) - CAST(n_units + 1 AS DOUBLE)" +
                 "*CAST(total_w AS DOUBLE))" +
                 "/(CAST(n_units AS DOUBLE)*CAST(total_w AS DOUBLE))", 4)}
               AS gini,
             ${Numerics.sqlFix(
               "CAST(max_w AS DOUBLE)/CAST(total_w AS DOUBLE)", 4)}
               AS top_share
      FROM a ORDER BY lang"""))

  // ---- q154: sparse-cosine similarity join via inverted index ----
  // Integer shingle-TF vectors, postings self-join on the term, exact
  // int64 dots — the search-engine formulation of text similarity
  // (weighted, vs q23's set Jaccard). The df cap [2, 50] is the scale
  // control: it prunes quadratic stop-term postings exactly as search
  // engines prune their longest lists.

  val q154 = Q(
    "q154_sparse_cosine",
    (s, dir) =>
      Similarity.sparseCosinePairs(
          docs(s, dir), "doc_id", "text",
          shingleN = 3, dfCap = 50, threshold = 0.6)
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id AS doc,
                    unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
                            for i in generate_series(1, len(ws)-2)]) AS term
             FROM w),
      tf AS (SELECT doc, term, CAST(count(*) AS BIGINT) AS tf
             FROM sh GROUP BY doc, term),
      kept AS (SELECT term FROM (
                 SELECT term, count(DISTINCT doc) AS df
                 FROM tf GROUP BY term)
               WHERE df >= 2 AND df <= 50),
      p AS (SELECT tf.doc, tf.term, tf.tf
            FROM tf JOIN kept ON kept.term = tf.term),
      nrm AS (SELECT doc, CAST(sum(tf*tf) AS BIGINT) AS nsq
              FROM p GROUP BY doc),
      d AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
                   CAST(sum(a.tf*b.tf) AS BIGINT) AS dot
            FROM p a JOIN p b ON a.term = b.term AND a.doc < b.doc
            GROUP BY 1, 2),
      sc AS (SELECT doc_a, doc_b,
                    CAST(dot AS DOUBLE) /
                      (sqrt(CAST(na.nsq AS DOUBLE)) *
                       sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
             FROM d
             JOIN nrm na ON na.doc = d.doc_a
             JOIN nrm nb ON nb.doc = d.doc_b)
      SELECT doc_a, doc_b, ${Numerics.sqlFix("cos", 4)} AS cos_sim
      FROM sc WHERE cos >= 0.6
      ORDER BY doc_a, doc_b"""))

  // ---- q159: survivor selection (keep-BEST dedup policy) ----
  // q20 keeps first, q35 keeps latest; production keeps the
  // highest-quality replica. Rank within each exact-dup digest group
  // by (fix4 quality score desc, doc_id) — rounding makes the
  // cross-engine argmax deterministic.

  val q159 = Q(
    "q159_survivor_selection",
    (s, dir) =>
      Dedup.survivorByScore(
          docs(s, dir), "doc_id", "text",
          TextAnalysis.qualityScoreCol(col("text")))
        .orderBy("digest"),
    Some {
      val en = TextAnalysis.StopwordProfiles.head._2
        .map(v => s"'$v'").mkString("(", ",", ")")
      val scoreExpr = "0.4 * least(t / 100.0, 1.0) " +
        "+ 0.3 * (1.0 - st / t) " +
        "+ 0.3 * least((c / t) / 10.0, 1.0)"
      s"""
      WITH d AS (SELECT doc_id, md5(lower(trim(text))) AS digest,
                        string_split_regex(lower(trim(text)), '\\s+') AS ws
                 FROM documents),
      m AS (SELECT doc_id, digest,
                   CAST(len(ws) AS DOUBLE) AS t,
                   CAST(list_sum([len(x) for x in ws]) AS DOUBLE) AS c,
                   CAST(len(list_filter(ws, x -> x IN $en)) AS DOUBLE) AS st
            FROM d),
      sc AS (SELECT doc_id, digest,
                    ${Numerics.sqlFix(scoreExpr, 4)} AS sc
             FROM m),
      r AS (SELECT doc_id, digest, sc,
                   row_number() OVER (PARTITION BY digest
                     ORDER BY sc DESC, doc_id) AS rn
            FROM sc)
      SELECT digest,
             CAST(count(*) AS BIGINT) AS n_docs,
             max(sc) AS best_quality,
             max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc_id
      FROM r GROUP BY digest ORDER BY digest"""
    })

  // ---- q160: n-gram novelty score ----
  // Fraction of each doc's distinct 3-word shingles first seen (min
  // doc_id) in that doc: replicas score 0, boilerplate surfaces as low
  // novelty mass. Term-grain min-agg + one equi-join — Σ df, never df².

  val q160 = Q(
    "q160_novelty_score",
    (s, dir) =>
      TextAnalysis.noveltyScore(docs(s, dir), "doc_id", "text", n = 3)
        .orderBy("doc_id"),
    Some(s"""
      WITH $wordsCte,
      sh AS (SELECT doc_id,
                    unnest(list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2]
                      for i in generate_series(1, len(ws)-2)])) AS term
             FROM w),
      f AS (SELECT term, min(doc_id) AS first_id FROM sh GROUP BY term),
      j AS (SELECT sh.doc_id,
                   CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN f.first_id = sh.doc_id
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
            FROM sh JOIN f ON f.term = sh.term
            GROUP BY sh.doc_id)
      SELECT doc_id, n_shingles, n_novel,
             ${Numerics.sqlFix(
               "CAST(n_novel AS DOUBLE)/CAST(n_shingles AS DOUBLE)", 4)}
               AS novelty
      FROM j ORDER BY doc_id"""))

  // ---- q165: vocabulary coverage curve ----
  // What fraction of token mass the top-k terms cover, per k — the
  // exact curve behind tokenizer vocabulary sizing. One TF shuffle to
  // vocabulary grain; rank/cumulative windows run over the vocabulary
  // only, never the corpus.

  val q165 = Q(
    "q165_vocab_coverage",
    (s, dir) =>
      TextAnalysis.vocabCoverage(
          Tables(s, dir, "documents"), "text", ks = Seq(5, 10, 20, 100))
        .orderBy("k"),
    Some(raw"""
      WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)),
                   '\s+')) AS term
                 FROM documents),
      tf AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
             FROM t WHERE len(term) > 0 GROUP BY term),
      c AS (SELECT row_number() OVER (ORDER BY cnt DESC, term) AS rk,
                   CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER () AS BIGINT) AS tot,
                   CAST(count(*) OVER () AS BIGINT) AS nvocab
            FROM tf),
      ks AS (SELECT unnest([5, 10, 20, 100]) AS k)
      SELECT ks.k, c.nvocab AS vocab_size, c.tot AS total_tokens,
             c.cum AS covered_tokens,
             ${Numerics.sqlFix(
               "CAST(c.cum AS DOUBLE)/CAST(c.tot AS DOUBLE)", 4)}
               AS coverage
      FROM ks JOIN c ON c.rk = least(ks.k, c.nvocab)
      ORDER BY ks.k"""))

  // ---- q166: sequence-length histogram ----
  // Token counts per doc, bucketed, with cumulative doc and token-mass
  // shares — "what max length keeps 99% of docs / 95% of tokens", the
  // truncation decision every training run makes.

  val q166 = Q(
    "q166_seqlen_histogram",
    (s, dir) =>
      TextAnalysis.seqLenHistogram(
          Tables(s, dir, "documents"), "text", bucket = 32)
        .orderBy("len_lo"),
    Some(s"""
      WITH $wordsCte,
      p AS (SELECT CAST(len(ws) AS BIGINT) AS n_tokens FROM w),
      h AS (SELECT n_tokens // 32 AS b,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens
            FROM p GROUP BY b)
      SELECT b*32 AS len_lo, n_docs, tokens,
             ${Numerics.sqlFix(
               "CAST(sum(n_docs) OVER (ORDER BY b " +
                 "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
                 "AS DOUBLE)/CAST(sum(n_docs) OVER () AS DOUBLE)", 4)}
               AS cum_docs,
             ${Numerics.sqlFix(
               "CAST(sum(tokens) OVER (ORDER BY b " +
                 "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
                 "AS DOUBLE)/CAST(sum(tokens) OVER () AS DOUBLE)", 4)}
               AS cum_tokens
      FROM h ORDER BY len_lo"""))

  // ---- q167: PNG pixel decode (inflate + defilter + RGBA stats) ----

  /** Pixel-exact planted rasters: PNG (one per color type, every
    * filter type 0-4 exercised across rows) and GIF (LZW index
    * streams, with and without transparency); each corrupt file must
    * decode to nulls, not crash. Channel sums are analytic ground
    * truth.
    */
  private val pngFixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.PngEncoder.encode
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // A: RGB 4x4, pixel(x,y) = (16x+y, 8y, 4(x+y)); filters 0,1,2,4
    val rgb = encode(4, 4, 2,
      (for (y <- 0 until 4; x <- 0 until 4;
            v <- Seq(16 * x + y, 8 * y, 4 * (x + y))) yield v.toByte).toArray,
      rowFilters = Seq(0, 1, 2, 4))
    // B: grayscale 3x5, pixel = 10x+y; all rows filter 3 (Average)
    val gray = encode(3, 5, 0,
      (for (y <- 0 until 5; x <- 0 until 3) yield (10 * x + y).toByte).toArray,
      rowFilters = Seq(3))
    // C: palette 2x2 over 4 entries; filter 1 (Sub) on index bytes
    val pal = encode(2, 2, 3, b(0, 1, 2, 3),
      rowFilters = Seq(1),
      palette = b(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30))
    // D: RGBA 2x3, pixel(x,y) = (100x, 50y, x+y, 200); filters 2,4,0
    val rgba = encode(2, 3, 6,
      (for (y <- 0 until 3; x <- 0 until 2;
            v <- Seq(100 * x, 50 * y, x + y, 200)) yield v.toByte).toArray,
      rowFilters = Seq(2, 4, 0))
    // F: gray+alpha 2x2, g = 7(x+y+1) (alpha never enters the sums)
    val graya = encode(2, 2, 4,
      (for (y <- 0 until 2; x <- 0 until 2;
            v <- Seq(7 * (x + y + 1), 100 + 10 * x + y)) yield v.toByte)
        .toArray,
      rowFilters = Seq(1, 3))
    // G: Adam7-interlaced RGB 9x5, pixel(x,y) = (10x+y, 5(x+y),
    // 255-10x) — all 7 passes non-empty; filters cycle across the
    // pass scanline sequence
    val adam7 = encode(9, 5, 2,
      (for (y <- 0 until 5; x <- 0 until 9;
            v <- Seq(10 * x + y, 5 * (x + y), 255 - 10 * x)) yield v.toByte)
        .toArray,
      rowFilters = Seq(0, 1, 2, 3, 4), interlaced = true)
    Seq(
      "px_1.png" -> rgb, "px_2.png" -> gray, "px_3.png" -> pal,
      "px_4.png" -> rgba,
      // E: structurally desynced (tail cut removes IEND and part of
      // IDAT) -> whole decode refuses with nulls
      "px_5.png" -> rgb.dropRight(10),
      "px_6.png" -> graya,
      "px_7.png" -> adam7)
  }

  /** GIF fixtures for q180 — LZW index streams the decoder must
    * expand (own gate since round 12: a GIF regression must not hide
    * behind q167's PNG rows — VERDICT r11 missing item 3).
    */
  private val gifFixtures: Seq[(String, Array[Byte])] = {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    import graft.multimodal.GifDecoder
    val gif = GifDecoder.encode(3, 2,
      b(255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 11, 13),
      b(0, 1, 2, 3, 0, 1))
    val gifT = GifDecoder.encode(2, 2,
      b(10, 20, 30, 40, 50, 60),
      b(0, 1, 1, 0), transparentIndex = 1)
    // interlaced 3x9 (all four passes non-empty), idx(x,y) = (x+y)%4
    val gifI = GifDecoder.encode(3, 9,
      b(10, 20, 30, 40, 50, 60, 70, 80, 90, 5, 6, 7),
      (for (y <- 0 until 9; x <- 0 until 3) yield ((x + y) % 4).toByte)
        .toArray,
      interlaced = true)
    Seq(
      // transparency only touches alpha, never the channel sums;
      // truncated GIF refuses with nulls
      "px_1.gif" -> gif,
      "px_2.gif" -> gifT,
      "px_3.gif" -> gif.dropRight(8),
      "px_4.gif" -> gifI)
  }

  val q167 = Q(
    "q167_png_pixels",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q167_png_")
      pngFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.decodePixelStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .orderBy("doc_id")
    },
    // planted ground truth: channel sums are analytic (e.g. doc 1:
    // sum_r = SUM(16x+y) over 4x4 = 408); Spark must recover them from
    // compressed bytes alone via inflate + defilter + RGBA expansion
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(4 AS INTEGER), CAST(4 AS INTEGER),
         CAST(16 AS BIGINT), CAST(408 AS BIGINT), CAST(192 AS BIGINT),
         CAST(192 AS BIGINT)),
        (2, 3, 5, 15, 180, 180, 180),
        (3, 2, 2, 4, 265, 275, 285),
        (4, 2, 3, 6, 300, 300, 9),
        (5, NULL, NULL, NULL, NULL, NULL, NULL),
        (6, 2, 2, 4, 56, 56, 56),
        (7, 9, 5, 45, 1890, 1350, 9675))
        AS t(doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b)
      ORDER BY doc_id"""))

  /** JPEG fixtures for q181 — real baseline Huffman decode. JPEG is
    * lossy, so the planted oracle uses only ANALYTICALLY-exact
    * content: flat 8x8 tiles (DC-only blocks decode to an exact
    * constant under any conformant IDCT) and neutral-chroma color
    * (Cb=Cr=128 -> R=G=B=Y exactly). AC energy and saturated color
    * are covered by JpegSpec's tolerance round-trips instead.
    */
  private val jpegFixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.JpegEncoder
    def tiles(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => f((i % w) / 8, (i / w) / 8).toByte)
    def grayAsRgb(g: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](3 * g.length)
      var i = 0
      while (i < g.length) {
        out(3 * i) = g(i); out(3 * i + 1) = g(i); out(3 * i + 2) = g(i)
        i += 1
      }
      out
    }
    val vals = Array(Array(32, 96, 200), Array(255, 0, 128))
    val g1 = JpegEncoder.encode(24, 16,
      tiles(24, 16, (tx, ty) => vals(ty)(tx)), gray = true)
    val c444 = JpegEncoder.encode(16, 8,
      grayAsRgb(tiles(16, 8, (tx, _) => if (tx == 0) 10 else 250)),
      gray = false)
    val c420 = JpegEncoder.encode(32, 24,
      grayAsRgb(tiles(32, 24, (tx, ty) => 20 + 30 * ((tx + ty) % 7))),
      gray = false, chromaSub = 2)
    val rst = JpegEncoder.encode(48, 8,
      tiles(48, 8, (tx, _) => 20 + 40 * tx), gray = true,
      restartInterval = 2)
    // progressive (SOF2) twins: DC-only content stays analytically
    // exact through spectral selection + successive approximation
    // (the AC scans over flat tiles are pure EOB-run streams, and the
    // DC refinement restores the low bit the first scan withheld)
    val prog = JpegEncoder.encodeProgressive(24, 16,
      tiles(24, 16, (tx, ty) => vals(ty)(tx)), gray = true,
      alShift = 1, restartInterval = 2)
    val prog420 = JpegEncoder.encodeProgressive(32, 24,
      grayAsRgb(tiles(32, 24, (tx, ty) => 20 + 30 * ((tx + ty) % 7))),
      gray = false, chromaSub = 2, alShift = 1)
    Seq(
      "jp_1.jpg" -> g1,
      "jp_2.jpg" -> c444,
      "jp_3.jpg" -> c420,
      "jp_4.jpg" -> rst,
      // truncated mid-entropy-stream -> whole decode refuses with nulls
      "jp_5.jpg" -> g1.dropRight(40),
      "jp_6.jpg" -> prog,
      "jp_7.jpg" -> prog420,
      // progressive truncated mid-scan -> nulls
      "jp_8.jpg" -> prog.dropRight(30))
  }

  val q181 = Q(
    "q181_jpeg_pixels",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q181_jpg_")
      jpegFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.decodePixelStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .orderBy("doc_id")
    },
    // analytic sums: doc 1 = 64*(32+96+200+255+0+128) on all channels;
    // doc 2 = 64*10 + 64*250; doc 3 = sum over 4x3 tiles of
    // 64*(20+30*((tx+ty)%7)); doc 4 = 64*(20+60+100+140+180+220),
    // decoded THROUGH the DRI/RSTn restart path; doc 5 truncated;
    // doc 6/7 = doc 1/3's content as PROGRESSIVE (SOF2) encodes —
    // same analytic sums recovered through DC-first + DC-refine +
    // banded AC scans (and doc 6 through per-scan restarts); doc 8
    // progressive truncated mid-scan
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(24 AS INTEGER), CAST(16 AS INTEGER),
         CAST(384 AS BIGINT), CAST(45504 AS BIGINT), CAST(45504 AS BIGINT),
         CAST(45504 AS BIGINT)),
        (2, 16, 8, 128, 16640, 16640, 16640),
        (3, 32, 24, 768, 72960, 72960, 72960),
        (4, 48, 8, 384, 46080, 46080, 46080),
        (5, NULL, NULL, NULL, NULL, NULL, NULL),
        (6, 24, 16, 384, 45504, 45504, 45504),
        (7, 32, 24, 768, 72960, 72960, 72960),
        (8, NULL, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b)
      ORDER BY doc_id"""))

  val q180 = Q(
    "q180_gif_pixels",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q180_gif_")
      gifFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.decodePixelStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .orderBy("doc_id")
    },
    // planted ground truth recovered through the real LZW expansion:
    // doc 1 = 3x2 palette {red,green,blue,(7,11,13)} indices
    // 0,1,2,3,0,1 -> sums (255+255+7, 255+255+11, 255+255+13) offset
    // by the extra red/green; doc 2's transparent index keeps its
    // palette RGB in the sums; doc 3 is truncated -> nulls
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(3 AS INTEGER), CAST(2 AS INTEGER),
         CAST(6 AS BIGINT), CAST(517 AS BIGINT), CAST(521 AS BIGINT),
         CAST(268 AS BIGINT)),
        (2, 2, 2, 4, 100, 140, 180),
        (3, NULL, NULL, NULL, NULL, NULL, NULL),
        (4, 3, 9, 27, 870, 1086, 1302))
        AS t(doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b)
      ORDER BY doc_id"""))

  /** Recursive-CTE connected components over the exact near-dup pair
    * graph — the (doc_id, cluster_id) base both cluster-grain oracles
    * (q169/q170) build on; same construction as q41's oracle.
    */
  private def ccClustersSql: String = s"""
      p AS (SELECT doc_a, doc_b FROM (${jaccardPairsSql(3, 0.6)})),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
                UNION ALL
                SELECT doc_b, doc_a FROM p),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
      cl AS (SELECT a AS doc_id, min(b) AS cluster_id
             FROM reach GROUP BY a)"""

  // ---- q169: leakage-safe (cluster-atomic) dataset split ----
  // Near-duplicates must never straddle train/test: the split is
  // decided by the md5 permille of the CLUSTER id, so every member of
  // a duplicate cluster lands in one split. leaky_clusters counts
  // clusters spanning >1 split — 0 by construction, and the oracle
  // pins that invariant as ground truth.

  val q169 = Q(
    "q169_leakage_safe_split",
    (s, dir) => {
      val clustered = Dedup.dupClusters(docs(s, dir), "doc_id", "text",
        shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
      val split = Sampling.splitByGroup(clustered, "cluster_id", 800, 100)
      val byCluster = split.groupBy("cluster_id", "split")
        .agg(count(lit(1)).as("n_members"))
      val audit = Sampling.splitLeakageAudit(split, "cluster_id", "split")
      byCluster
        .join(audit.select(col("cluster_id"), col("n_splits")), "cluster_id")
        .groupBy("split")
        .agg(
          sum(col("n_members")).as("n_docs"),
          count(lit(1)).as("n_clusters"),
          sum(when(col("n_splits") > 1, 1L).otherwise(0L))
            .as("leaky_clusters"))
        .orderBy("split")
    },
    Some(s"""
      WITH RECURSIVE
      $ccClustersSql,
      sp AS (SELECT doc_id, cluster_id,
               CASE WHEN h < 800 THEN 'train'
                    WHEN h < 900 THEN 'val'
                    ELSE 'test' END AS split
             FROM (SELECT doc_id, cluster_id,
                     ('0x'||substr(md5('0|'||CAST(cluster_id AS VARCHAR)),
                       1,15))::BIGINT % 1000 AS h
                   FROM cl))
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
             CAST(0 AS BIGINT) AS leaky_clusters
      FROM sp GROUP BY split ORDER BY split"""))

  // ---- q170: keep-best survivor per near-dup cluster ----
  // The Dolma/CCNet curation keep step at cluster grain: per near-dup
  // cluster, the longest member wins (exact integer char count, lowest
  // id on ties) — one max-of-struct aggregate, no corpus-wide window.

  val q170 = Q(
    "q170_cluster_survivor",
    (s, dir) => {
      val d = docs(s, dir)
      val clustered = Dedup.dupClusters(d, "doc_id", "text",
        shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
      val scored = clustered.join(
        d.select(col("doc_id"), length(col("text")).cast("long").as("score")),
        "doc_id")
      Dedup.clusterSurvivors(scored, "cluster_id", "doc_id", col("score"))
        .orderBy("cluster_id")
    },
    Some(s"""
      WITH RECURSIVE
      $ccClustersSql,
      sc AS (SELECT c.doc_id, c.cluster_id,
                    CAST(length(d.text) AS BIGINT) AS score
             FROM cl c JOIN documents d ON d.doc_id = c.doc_id),
      w AS (SELECT cluster_id, doc_id, score,
              row_number() OVER (PARTITION BY cluster_id
                ORDER BY score DESC, doc_id ASC) AS rk,
              count(*) OVER (PARTITION BY cluster_id) AS n_members
            FROM sc)
      SELECT cluster_id, doc_id AS kept_id, score AS kept_score,
             CAST(n_members AS BIGINT) AS n_members
      FROM w WHERE rk = 1 ORDER BY cluster_id"""))

  // ---- q171: content-defined chunking (shift-robust dedup chunker) ----
  // FastCDC/rsync-style: boundaries where the trailing 8-gram's hash
  // is 0 mod 64 — local content decides cuts, so edits only re-digest
  // chunks up to the next surviving boundary (the spec proves the
  // contrast with fixed-width chunking).

  val q171 = Q(
    "q171_cdc_chunking",
    (s, dir) =>
      TextAnalysis.contentDefinedChunks(docs(s, dir), "doc_id", "text",
          gram = 8, mask = 64)
        .orderBy("doc_id", "chunk_idx"),
    Some("""
      WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      pos AS (SELECT doc_id, text, len, unnest(range(8, len + 1)) AS p
              FROM d),
      bnd AS (SELECT doc_id, CAST(p AS INTEGER) AS b FROM pos
              WHERE ('0x'||substr(md5('5|'||substr(text, CAST(p AS INTEGER) - 7, 8)),
                1, 15))::BIGINT % 64 = 0),
      ends AS (SELECT DISTINCT doc_id, b FROM (
                 SELECT doc_id, b FROM bnd
                 UNION ALL
                 SELECT doc_id, len FROM d WHERE len > 0)),
      ch AS (SELECT doc_id,
               CAST(coalesce(lag(b) OVER w, 0) + 1 AS INTEGER) AS start,
               b AS e,
               CAST(row_number() OVER w AS INTEGER) AS chunk_idx
             FROM ends WINDOW w AS (PARTITION BY doc_id ORDER BY b))
      SELECT c.doc_id, c.chunk_idx, c.start,
             CAST(c.e - c.start + 1 AS INTEGER) AS chunk_len,
             md5(substr(d.text, c.start, c.e - c.start + 1)) AS chunk_digest
      FROM ch c JOIN d ON d.doc_id = c.doc_id
      ORDER BY c.doc_id, c.chunk_idx"""))

  // ---- q172: exact-k deterministic sample per stratum ----
  // The exact-count complement of permille sampling: per event_type,
  // the k=3 events with the smallest (md5 hash, id) survive — stable
  // under repartitioning, nested in k.

  val q172 = Q(
    "q172_exact_k_sample",
    (s, dir) =>
      graft.operators.Sampling.exactKPerStratum(
          graft.Tables.events(s, dir).select("event_id", "event_type"),
          "event_type", "event_id", k = 3)
        .select(col("event_type"), col("rk"), col("event_id"))
        .orderBy("event_type", "rk"),
    Some("""
      WITH r AS (SELECT event_type, event_id,
                   CAST(row_number() OVER (PARTITION BY event_type
                     ORDER BY substr(md5('0|'||CAST(event_id AS VARCHAR)), 1, 15),
                       event_id) AS INTEGER) AS rk
                 FROM events)
      SELECT event_type, rk, event_id FROM r WHERE rk <= 3
      ORDER BY event_type, rk"""))

  // ---- q176: label-propagation communities over the near-dup graph ----
  // 4 synchronous LPA rounds (count desc, label asc argmax — a total
  // order, so the oracle replays every round exactly) over the
  // DIGEST-COLLAPSED near-dup graph: exact-replica docs collapse to
  // one representative before pair generation (the q141 production
  // rule — replicated crawls explode the pair graph quadratically; a
  // first q176 formulation over raw docs timed out a 10-min slot at
  // the 100x sweep, the collapsed form runs in seconds), then each
  // replica inherits its content's community. Splits template
  // neighborhoods where CC (q41) would glue everything reachable.
  // Round count matters: 2 rounds still oscillates on bridged cliques
  // (GraphsSpec traces it); 4 settles the test topologies.

  private val lpaRounds = 4

  /** Unrolled LPA oracle CTE chain over digest representatives: rep
    * selection, word-shingle pairs over reps only, then per round one
    * neighbor-label count + one argmax + one left join — the same
    * steps the operator runs. Shared by q176 (communities) and q177
    * (modularity audit); callers append their own final SELECT over
    * `l<rounds>` (labels), `e` (symmetric edges) and `rep`.
    */
  private def lpaCtes(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""n$r AS (SELECT e.src, l.label, CAST(count(*) AS BIGINT) AS c
             FROM e JOIN l${r - 1} l ON l.id = e.dst GROUP BY 1, 2),
      w$r AS (SELECT src AS id, label FROM (
               SELECT src, label, row_number() OVER (
                 PARTITION BY src ORDER BY c DESC, label ASC) AS rk
               FROM n$r) WHERE rk = 1),
      l$r AS (SELECT l${r - 1}.id, coalesce(w$r.label, l${r - 1}.id) AS label
             FROM l${r - 1} LEFT JOIN w$r ON w$r.id = l${r - 1}.id)"""
    }.mkString(",\n      ")
    s"""
      WITH
      rep AS (SELECT md5(text) AS dg, min(doc_id) AS rep_id
              FROM documents GROUP BY 1),
      docs_r AS (SELECT d.doc_id, d.text FROM documents d
                 JOIN rep ON rep.rep_id = d.doc_id),
      w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
            FROM docs_r),
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      pr AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      p AS (SELECT doc_a, doc_b FROM pr WHERE j >= 0.6),
      e AS (SELECT DISTINCT src, dst FROM (
              SELECT doc_a AS src, doc_b AS dst FROM p
              UNION ALL
              SELECT doc_b, doc_a FROM p)),
      l0 AS (SELECT rep_id AS id, rep_id AS label FROM rep),
      $stages"""
  }

  private def lpaSql(rounds: Int): String =
    s"""${lpaCtes(rounds)}
      SELECT d2.doc_id, l$rounds.label AS community
      FROM documents d2
      JOIN rep r2 ON r2.dg = md5(d2.text)
      JOIN l$rounds ON l$rounds.id = r2.rep_id
      ORDER BY d2.doc_id"""

  val q176 = Q(
    "q176_label_propagation",
    (s, dir) => {
      val d = docs(s, dir)
      val dg = d.select(col("doc_id"), md5(col("text")).as("dg"))
      val rep = dg.groupBy("dg").agg(min(col("doc_id")).as("rep_id"))
      // The q177 scratch-truncation discipline end-to-end: stage the
      // collapsed corpus (minhashNearDup references its input several
      // times — unstaged, each reference re-runs the digest join),
      // the pair set, and the labels; Run + release (ADVICE r11) so
      // repeated bench/verify invocations accumulate no cached state.
      val ldir = Scratch.dir(s, "q176_lpa_")
      d.select(col("doc_id"), col("text"))
        .join(rep.select(col("rep_id").as("doc_id")), "doc_id")
        .write.mode("overwrite").parquet(s"$ldir/c")
      val repDocs = s.read.parquet(s"$ldir/c")
      Dedup.minhashNearDup(repDocs, "doc_id", "text",
          shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
        .select("id_a", "id_b")
        .write.mode("overwrite").parquet(s"$ldir/p")
      val pairs = s.read.parquet(s"$ldir/p")
      val run = graft.operators.Graphs.labelPropagationRun(
        repDocs.select(col("doc_id")), "doc_id",
        pairs, "id_a", "id_b", rounds = lpaRounds)
      run.result.write.mode("overwrite").parquet(s"$ldir/l")
      run.release()
      val lpa = s.read.parquet(s"$ldir/l")
      dg.join(rep, "dg")
        .join(lpa.select(col("doc_id").as("rep_id"), col("community")),
          "rep_id")
        .select(col("doc_id"), col("community"))
        .orderBy("doc_id")
    },
    Some(lpaSql(lpaRounds)))

  // ---- q177: modularity audit of the LPA communities ----
  // The quality instrument for q176: per community, Newman
  // Q_c = intra/m - (d/2m)^2 from exact integer edge/degree counts;
  // a ~0 total means the partition is no better than random wiring.
  // Both the LPA loop and the audit consume ONE scratch-materialized
  // pair file (flat scans, no re-run of the LSH pipeline).

  val q177 = Q(
    "q177_community_modularity",
    (s, dir) => {
      val d = docs(s, dir)
      val dg = d.select(col("doc_id"), md5(col("text")).as("dg"))
      val rep = dg.groupBy("dg").agg(min(col("doc_id")).as("rep_id"))
      val pdir = Scratch.dir(s, "q177_pairs_")
      // scratch-truncate each stage (the dupClusters discipline): the
      // collapsed corpus so the LSH pipeline runs over a plain scan,
      // the pair set so LPA and the audit never re-run the pipeline,
      // and the labels, which the audit references three times
      d.select(col("doc_id"), col("text"))
        .join(rep.select(col("rep_id").as("doc_id")), "doc_id")
        .write.mode("overwrite").parquet(s"$pdir/c")
      val repDocs = s.read.parquet(s"$pdir/c")
      Dedup.minhashNearDup(repDocs, "doc_id", "text",
          shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
        .select("id_a", "id_b")
        .write.mode("overwrite").parquet(s"$pdir/p")
      val pairs = s.read.parquet(s"$pdir/p")
      // Run + release on both graph ops (ADVICE r11): each stages its
      // result to scratch, so nothing persisted outlives the query.
      val lpaRun = graft.operators.Graphs.labelPropagationRun(
        repDocs.select(col("doc_id")), "doc_id",
        pairs, "id_a", "id_b", rounds = lpaRounds)
      lpaRun.result.write.mode("overwrite").parquet(s"$pdir/l")
      lpaRun.release()
      val lpa = s.read.parquet(s"$pdir/l")
      val modRun = graft.operators.Graphs.modularityRun(
        lpa, "doc_id", "community", pairs, "id_a", "id_b")
      modRun.result.write.mode("overwrite").parquet(s"$pdir/m")
      modRun.release()
      s.read.parquet(s"$pdir/m").orderBy("community")
    },
    Some(s"""${lpaCtes(lpaRounds)},
      und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM e WHERE src <> dst),
      mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
      degs AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
                 SELECT u AS id FROM und UNION ALL SELECT v FROM und)
               GROUP BY id),
      intra AS (SELECT l1.label AS c, CAST(count(*) AS BIGINT) AS ie
                FROM und JOIN l$lpaRounds l1 ON l1.id = und.u
                         JOIN l$lpaRounds l2 ON l2.id = und.v
                WHERE l1.label = l2.label GROUP BY 1),
      base AS (SELECT l.label AS c, CAST(count(*) AS BIGINT) AS n_nodes,
                      CAST(sum(coalesce(d.deg, 0)) AS BIGINT) AS degree_sum
               FROM l$lpaRounds l LEFT JOIN degs d ON d.id = l.id
               GROUP BY 1)
      SELECT b.c AS community, b.n_nodes,
             coalesce(i.ie, 0) AS intra_edges, b.degree_sum,
             ${Numerics.sqlFix(
               "CAST(coalesce(i.ie, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE) - " +
                 "(CAST(b.degree_sum AS DOUBLE) / CAST(2 * mm.m AS DOUBLE)) * " +
                 "(CAST(b.degree_sum AS DOUBLE) / CAST(2 * mm.m AS DOUBLE))", 4)}
               AS contribution
      FROM base b LEFT JOIN intra i ON i.c = b.c CROSS JOIN mm
      ORDER BY community"""))

  // ---- q179: near-dup threshold calibration curve ----
  // How sharply the verified pair volume decays with the Jaccard
  // threshold: exact-similarity pairs at the 0.6 floor bucketed into
  // 0.05-wide bands with a cumulative "pairs admitted at >= band"
  // column — the instrument that justifies a dedup threshold before a
  // full run. Pairs come from the digest-collapsed corpus (replica
  // pairs sit trivially at 1.0 and would swamp the curve at scale).

  val q179 = Q(
    "q179_threshold_calibration",
    (s, dir) => {
      val d = docs(s, dir)
      val dg = d.select(col("doc_id"), md5(col("text")).as("dg"))
      val rep = dg.groupBy("dg").agg(min(col("doc_id")).as("rep_id"))
      val pdir = Scratch.dir(s, "q179_cal_")
      d.select(col("doc_id"), col("text"))
        .join(rep.select(col("rep_id").as("doc_id")), "doc_id")
        .write.mode("overwrite").parquet(s"$pdir/c")
      val repDocs = s.read.parquet(s"$pdir/c")
      val pairs = Dedup.minhashNearDup(repDocs, "doc_id", "text",
        shingleWidth = 3, bands = 8, rowsPerBand = 3, threshold = 0.6)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("band").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      pairs
        .select((floor(col("jaccard_sim") * 20.0) / 20.0).as("band"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_pairs"))
        // cumulative over <= 9 band rows — not a data-sized window
        .withColumn("n_pairs_at_or_above", sum(col("n_pairs")).over(w))
        .orderBy("band")
    },
    Some(s"""
      WITH
      rep AS (SELECT md5(text) AS dg, min(doc_id) AS rep_id
              FROM documents GROUP BY 1),
      docs_r AS (SELECT d.doc_id, d.text FROM documents d
                 JOIN rep ON rep.rep_id = d.doc_id),
      w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
            FROM docs_r),
      sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM w),
      pr AS (
        SELECT ${Numerics.sqlFix(
          "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)" +
            " / len(list_distinct(list_concat(a.sh, b.sh)))", 4)} AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      b AS (SELECT floor(j * 20.0) / 20.0 AS band,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM pr WHERE j >= 0.6 GROUP BY 1)
      SELECT band, n_pairs,
             CAST(sum(n_pairs) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_pairs_at_or_above
      FROM b ORDER BY band"""))

  // ---- q184: fuzzy entity matching (Jaro-Winkler top-k) ----
  // Entity resolution against a reference list — the name/title/
  // address matching step where edit distance over-penalizes
  // transpositions: a small probe set broadcasts against the streamed
  // corpus (the q25 kernel shape), every candidate scores through the
  // native codegen'd JaroWinkler expression, and a per-probe window
  // keeps the top 3. Ranking happens on the fix4-ROUNDED score (+ key
  // tiebreak) so both engines order ties identically; DuckDB's
  // independent jaro_winkler_similarity implementation is the
  // cross-engine differential for the kernel itself.

  val q184 = Q(
    "q184_fuzzy_match",
    (s, dir) => {
      graft.GraftFunctions.register(s)
      val part = Tables(s, dir, "part")
      val probe = part.where(col("p_partkey") <= 5)
        .select(col("p_partkey").as("probe_id"),
          col("p_name").as("probe_name"))
      val scored = part
        .join(broadcast(probe), col("p_partkey") =!= col("probe_id"))
        .select(col("probe_id"), col("p_partkey").as("match_key"),
          Numerics.fix4(graft.GraftFunctions.jaroWinkler(
            col("probe_name"), col("p_name"))).as("jw_sim"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("jw_sim").desc, col("match_key").asc)
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .orderBy("probe_id", "rk")
    },
    Some(s"""
      WITH probe AS (SELECT p_partkey AS probe_id, p_name AS probe_name
                     FROM part WHERE p_partkey <= 5),
      scored AS (SELECT probe_id, p.p_partkey AS match_key,
                        ${Numerics.sqlFix(
                          "jaro_winkler_similarity(probe_name, p.p_name)",
                          4)} AS jw_sim
                 FROM part p CROSS JOIN probe
                 WHERE p.p_partkey <> probe_id),
      rk AS (SELECT probe_id, match_key, jw_sim,
                    row_number() OVER (PARTITION BY probe_id
                      ORDER BY jw_sim DESC, match_key) AS rk
             FROM scored)
      SELECT probe_id, match_key, jw_sim, CAST(rk AS INTEGER) AS rk
      FROM rk WHERE rk <= 3
      ORDER BY probe_id, rk"""))

  // ---- q185: per-source relative quality gate (curation quotas) ----
  // Keep the top 20% of each source by token count: absolute-score
  // gates (q76's cascade) let one verbose domain crowd out the rest;
  // the per-group percentile quota is the standard mixture-control
  // fix. percent_rank = (rank-1)/(n-1) over exact integer scores with
  // a doc_id tiebreak, so the cut is engine-identical.

  val q185 = Q(
    "q185_group_quality_gate",
    (s, dir) => {
      val scored = docs(s, dir).select(col("source"), col("doc_id"),
        size(graft.functions.Texts.words(col("text"))).cast("long")
          .as("score"))
      Sampling.topFracByGroup(scored, "source", col("score"),
          col("doc_id"), frac = 0.2)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_kept"),
          min(col("score")).as("min_kept"),
          max(col("score")).as("max_kept"),
          sum(col("score")).as("kept_tokens"))
        .orderBy("source")
    },
    Some("""
      WITH sc AS (SELECT source, doc_id,
                    CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                      AS BIGINT) AS score
                  FROM documents),
      r AS (SELECT source, score,
                   percent_rank() OVER (PARTITION BY source
                     ORDER BY score DESC, doc_id) AS pr
            FROM sc)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_kept,
             min(score) AS min_kept,
             max(score) AS max_kept,
             CAST(sum(score) AS BIGINT) AS kept_tokens
      FROM r WHERE pr <= 0.2
      GROUP BY 1 ORDER BY source"""))

  // ---- q186: blocked fuzzy self-join (record-linkage blocking) ----
  // q184's probe kernel scaled to CORPUS x CORPUS: candidate pairs
  // come only from names sharing a block key (first OR last token,
  // unioned for recall — the multi-band knob), verified once through
  // the native JaroWinkler expression, all at DISTINCT-NAME grain so
  // work is Σ block² over names, independent of corpus row count.

  val q186 = Q(
    "q186_blocked_fuzzy_join",
    (s, dir) =>
      graft.operators.Similarity.blockedFuzzyPairs(
          Tables(s, dir, "part"), "p_name",
          Seq(
            n => element_at(split(n, " "), 1),
            n => element_at(split(n, " "), 2)),
          threshold = 0.75)
        .orderBy("name_a", "name_b"),
    Some(s"""
      WITH names AS (SELECT p_name AS name,
                       CAST(count(*) AS BIGINT) AS n
                     FROM part GROUP BY 1),
      bl AS (SELECT name, n, 0 AS bk, split_part(name, ' ', 1) AS bv
             FROM names
             UNION ALL
             SELECT name, n, 1, split_part(name, ' ', 2) FROM names),
      cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b,
                      a.n AS n_a, b.n AS n_b
               FROM bl a JOIN bl b
                 ON a.bk = b.bk AND a.bv = b.bv AND a.name < b.name),
      sc AS (SELECT name_a, name_b,
                    ${Numerics.sqlFix(
                      "jaro_winkler_similarity(name_a, name_b)", 4)}
                      AS jw_sim,
                    n_a, n_b
             FROM cand)
      SELECT name_a, name_b, jw_sim, n_a, n_b
      FROM sc WHERE jw_sim >= 0.75
      ORDER BY name_a, name_b"""))

  // ---- q187: deterministic mixture realization ----
  // q114's weights made real: per-source sampling factors (α = 0.5
  // temperature) realize into an actual resampled corpus — floor(f)
  // copies per doc plus a hash-thresholded fractional copy, no
  // rand(), reproducible under any partitioning. The audit per source
  // pins the emitted row count, surviving distinct docs, and the
  // replica-index ceiling.

  val q187 = Q(
    "q187_mixture_realize",
    (s, dir) => {
      val d = docs(s, dir)
      val factors = Sampling.mixtureWeights(d, "source", alpha = 0.5)
      Sampling.realizeMixture(d, "source", "doc_id", factors)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_rows_out"),
          countDistinct(col("doc_id")).as("n_docs_kept"),
          max(col("copy")).as("max_copy"))
        .orderBy("source")
    },
    Some(s"""
      WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY 1),
      t AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w FROM c),
      s AS (SELECT CAST(sum(w) AS DOUBLE) AS tw,
                   CAST(sum(n_docs) AS BIGINT) AS tn
            FROM t),
      f AS (SELECT source,
                   CAST(round((floor((w / tw * tn / n_docs) * 10000 + 0.5)
                     / 10000) * 10000) AS BIGINT) AS f10k
            FROM t, s),
      per_doc AS (
        SELECT d.source, d.doc_id,
               CAST(floor(CAST(f.f10k AS DOUBLE) / 10000.0) AS BIGINT) +
                 (CASE WHEN ('0x'||substr(md5('0|'||CAST(d.doc_id AS VARCHAR)),
                        1, 15))::BIGINT % 10000 < f.f10k % 10000
                       THEN 1 ELSE 0 END) AS copies
        FROM documents d JOIN f ON f.source = d.source)
      SELECT source,
             CAST(sum(copies) AS BIGINT) AS n_rows_out,
             CAST(count(CASE WHEN copies > 0 THEN 1 END) AS BIGINT)
               AS n_docs_kept,
             CAST(max(copies) - 1 AS INTEGER) AS max_copy
      FROM per_doc
      GROUP BY 1 HAVING sum(copies) > 0
      ORDER BY source"""))

  // ---- q188: BPE apply/encode with a trained merge table ----
  // q128's trainer made useful: three trained merges broadcast into
  // the corpus scan as chained replace literals, every doc tokenized
  // (left-to-right non-overlapping, exactly the trainer's rewrite),
  // token ids per the byte-fallback scheme (merged symbols 255+rank,
  // base chars their code point). The oracle re-derives the ids by
  // replaying the SAME merge decisions in DuckDB — train + encode are
  // both engine-exact (long counts, (count DESC, pair) tie-breaks).

  val q188 = Q(
    "q188_bpe_encode",
    (s, dir) => {
      val d = docs(s, dir)
      val merges = TextAnalysis.bpeTrainMerges(d, "text", iters = 3)
      TextAnalysis.bpeEncode(d, "doc_id", "text", merges.map(_._1))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          count(when(col("token_id") > 255, lit(1))).as("n_merged"),
          sum(col("token_id").cast("long")).as("id_sum"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
             FROM occ WHERE len(word) >= 2 GROUP BY 1),
      x1 AS (SELECT word, freq, unnest(range(1, len(word))) AS i FROM wf),
      p1 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x1 GROUP BY 1),
      b1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      w2 AS (SELECT replace(word, (SELECT pair FROM b1), chr(1)) AS word,
                    freq
             FROM wf),
      x2 AS (SELECT word, freq, unnest(range(1, len(word))) AS i
             FROM w2 WHERE len(word) >= 2),
      p2 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x2 GROUP BY 1),
      b2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
      w3 AS (SELECT replace(word, (SELECT pair FROM b2), chr(2)) AS word,
                    freq
             FROM w2),
      x3 AS (SELECT word, freq, unnest(range(1, len(word))) AS i
             FROM w3 WHERE len(word) >= 2),
      p3 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x3 GROUP BY 1),
      b3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
      enc AS (SELECT doc_id,
                replace(replace(replace(word,
                  (SELECT pair FROM b1), chr(1)),
                  (SELECT pair FROM b2), chr(2)),
                  (SELECT pair FROM b3), chr(3)) AS wenc
              FROM occ WHERE word <> ''),
      tok AS (SELECT doc_id, unicode(substr(wenc, CAST(i AS INT), 1)) AS a
              FROM (SELECT doc_id, wenc,
                           unnest(range(1, len(wenc) + 1)) AS i
                    FROM enc)),
      ids AS (SELECT doc_id,
                     CASE WHEN a <= 31 THEN a + 255 ELSE a END AS tid
              FROM tok)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(CASE WHEN tid > 255 THEN 1 END) AS BIGINT)
               AS n_merged,
             CAST(sum(tid) AS BIGINT) AS id_sum
      FROM ids GROUP BY 1 ORDER BY doc_id"""))

  // ---- q190: URL/domain curation key + per-domain cap ----
  // The crawl-curation key: messy-but-deterministic URLs (built from
  // doc_id arithmetic IDENTICALLY in both engines — scheme/host case,
  // www, default and explicit ports, trailing slashes, unsorted query
  // params, fragments, IP hosts, co.uk registries) normalize through
  // graft.functions.Urls and collapse to a registrable domain, which
  // then keys a q56-style per-domain cap. The oracle replays the same
  // normalization + heuristic in DuckDB, so url_norm/domain/kept are
  // all hash-gated.

  /** Deterministic messy-URL fixture per doc (Column form): scheme and
    * host case, www, default/explicit ports, trailing slashes, unsorted
    * query params, fragments, IP hosts, co.uk registries — all keyed on
    * doc_id arithmetic so [[urlFixtureSql]] builds the identical string
    * in DuckDB.
    */
  private def urlFixtureCol: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val scheme = when(id % 2 === 0, "HTTPS").otherwise("http")
    val host = when(id % 11 === 0,
        concat(lit("192.168.0."), str(id % 9 + 1)))
      .otherwise(concat(
        when(id % 3 === 0, "WWW.").when(id % 3 === 1, "News.")
          .otherwise(""),
        lit("Site"), str(id % 7),
        when(id % 4 === 0, ".CO.UK").when(id % 4 === 1, ".COM")
          .when(id % 4 === 2, ".org").otherwise(".net")))
    val port = when(id % 5 === 0,
        when(id % 2 === 0, ":443").otherwise(":80"))
      .when(id % 5 === 1, ":8080").otherwise("")
    val path = when(id % 3 === 0, "/Alpha/Beta/")
      .when(id % 3 === 1, "/Alpha/Beta").otherwise("")
    val qs = when(id % 2 === 0, "?b=2&a=1")
      .when(id % 5 === 2, "").otherwise("?a=1&b=2")
    val frag = when(id % 4 === 0, "#Top").otherwise("")
    concat(scheme, lit("://"), host, port, path, qs, frag)
  }

  /** [[urlFixtureCol]]'s DuckDB transcription. */
  private val urlFixtureSql: String = """
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
        (CASE WHEN doc_id % 11 = 0
              THEN '192.168.0.' || CAST(doc_id % 9 + 1 AS VARCHAR)
              ELSE (CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
                         WHEN doc_id % 3 = 1 THEN 'News.' ELSE '' END)
                || 'Site' || CAST(doc_id % 7 AS VARCHAR)
                || (CASE WHEN doc_id % 4 = 0 THEN '.CO.UK'
                         WHEN doc_id % 4 = 1 THEN '.COM'
                         WHEN doc_id % 4 = 2 THEN '.org'
                         ELSE '.net' END) END) ||
        (CASE WHEN doc_id % 5 = 0
              THEN (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
              WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END) ||
        (CASE WHEN doc_id % 3 = 0 THEN '/Alpha/Beta/'
              WHEN doc_id % 3 = 1 THEN '/Alpha/Beta' ELSE '' END) ||
        (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1'
              WHEN doc_id % 5 = 2 THEN '' ELSE '?a=1&b=2' END) ||
        (CASE WHEN doc_id % 4 = 0 THEN '#Top' ELSE '' END)"""

  /** DuckDB CTEs deriving (doc_id, url_norm, domain) from the fixture. */
  private def domainCtesSql: String = s"""
      u AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
      n AS (SELECT doc_id,
              ${graft.functions.Urls.sqlNormalizeUrl("url")} AS url_norm
            FROM u),
      dm AS (SELECT doc_id, url_norm,
               ${graft.functions.Urls.sqlRegistrableDomain(
    graft.functions.Urls.sqlHostOf("url_norm"))} AS domain
             FROM n)"""

  val q190 = Q(
    "q190_domain_cap",
    (s, dir) => {
      import graft.functions.Urls
      docs(s, dir)
        .select(col("doc_id"), Urls.normalizeUrl(urlFixtureCol).as("url_norm"))
        .withColumn("domain",
          Urls.registrableDomain(Urls.hostOf(col("url_norm"))))
        .withColumn("kept",
          when(row_number().over(
            Window.partitionBy("domain").orderBy("doc_id")) <= 3, 1)
            .otherwise(0))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $domainCtesSql
      SELECT doc_id, url_norm, domain,
             CAST(CASE WHEN row_number() OVER
               (PARTITION BY domain ORDER BY doc_id) <= 3
               THEN 1 ELSE 0 END AS INTEGER) AS kept
      FROM dm ORDER BY doc_id"""))

  // ---- q192: domain-grain mixture weights ----
  // Row 118's temperature mixture re-keyed on the CRAWL-native unit:
  // the registrable domain derived by q190's normalization pipeline.
  // sqrt-temperature weights per domain — the α=0.5 downweighting of
  // mega-domains a real crawl mixture applies. Weight sums are sums of
  // irrational sqrt values (boundary probability ~1e-12, the documented
  // float-sum-safe class); fix4 on both engines.

  val q192 = Q(
    "q192_domain_mixture",
    (s, dir) => {
      import graft.functions.Urls
      // LAYERED projections (the q136 CollapseProject discipline):
      // registrableDomain references its host ~6 times — composed
      // inline, each reference re-evaluated the whole regex
      // normalization tree (measured 3.2 s vs 0.9 s layered)
      val withDomain = docs(s, dir)
        .select(col("doc_id"), Urls.normalizeUrl(urlFixtureCol).as("url_norm"))
        .select(col("doc_id"), Urls.hostOf(col("url_norm")).as("host"))
        .select(col("doc_id"),
          Urls.registrableDomain(col("host")).as("domain"))
      Sampling.mixtureWeights(withDomain, "domain", alpha = 0.5)
        .orderBy("domain")
    },
    Some(s"""
      WITH $domainCtesSql,
      c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
            FROM dm GROUP BY 1),
      t AS (SELECT domain, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w FROM c),
      s AS (SELECT CAST(sum(w) AS DOUBLE) AS tw,
                   CAST(sum(n_docs) AS BIGINT) AS tn
            FROM t)
      SELECT domain, n_docs,
             ${Numerics.sqlFix("w / tw", 4)} AS weight,
             ${Numerics.sqlFix("w / tw * tn / n_docs", 4)} AS sampling_factor
      FROM t, s ORDER BY domain"""))

  // ---- q191: quality-classifier inference (hashed linear model) ----
  // The learned complement of q76's rule cascade: hashed-unigram
  // buckets, md5-derived integer weights (engine-replayable without a
  // model artifact), one codegen'd element_at per token, mean-weight
  // score. The oracle re-derives bucket AND weight from the same md5
  // formulas, so score_sum is exact-integer and quality_score fix4'd.

  val q191 = Q(
    "q191_quality_classifier",
    (s, dir) =>
      TextAnalysis.qualityClassifierScore(
          docs(s, dir), "doc_id", "text", dim = 256, seed = 7)
        .orderBy("doc_id"),
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      tok AS (SELECT doc_id,
                ('0x'||substr(md5('7|'||word),1,15))::BIGINT % 256 AS b
              FROM occ WHERE word <> ''),
      wt AS (SELECT doc_id,
               ('0x'||substr(md5('qw|'||CAST(b AS VARCHAR)),1,15))::BIGINT
                 % 1001 - 500 AS wv
             FROM tok)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(wv) AS BIGINT) AS score_sum,
             ${Numerics.sqlFix("CAST(sum(wv) AS DOUBLE) / count(*)", 4)}
               AS quality_score
      FROM wt GROUP BY 1 ORDER BY doc_id"""))

  // ---- q193: incremental cluster maintenance ----
  // The batch companion of the streaming pair sink (row 187): an
  // existing cluster labeling + one batch of new verified pairs fold
  // into updated clusters WITHOUT touching the historical pair store —
  // the old labeling's star reduction carries its connectivity. The
  // demo state follows the FULL dupClusters scale discipline (the
  // round-13 100x sweep caught the first cut running raw-doc LSH
  // twice: 333 s at 100x; collapsed-grain with a PAIR split is 9 s):
  // digest-collapse to scratch, ONE LSH pair run at rep grain, pairs
  // split 50/50 by pair hash into "stored" and "new", CC on the
  // stored half, mergeClusters folds the new half, labels expand to
  // doc grain. old ∪ new = the full pair set by construction, so the
  // oracle is the plain full-recompute CC — the operator's defining
  // guarantee.

  val q193 = Q(
    "q193_incremental_clusters",
    (s, dir) => {
      val d = docs(s, dir)
      val keyed = d.select(col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("digest"))
      val reps = keyed.groupBy("digest").agg(min(col("doc_id")).as("rep"))
      val mapping = keyed.join(reps, "digest")
        .select(col("doc_id"), col("rep"))
      val repPath = s"${Scratch.dir(s, "q193_reps_")}/collapsed"
      d.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .join(reps.select(col("rep").as("doc_id")), "doc_id")
        .write.mode("overwrite").parquet(repPath)
      val repDocs = s.read.parquet(repPath)
      // Stage the pair set (the q176/q177 scratch-truncation
      // discipline): stored AND fresh both reference it, and the CC +
      // merge below would otherwise re-run the whole LSH pipeline per
      // reference — measured ~2× the query at sf0.1.
      val pairPath = s"${Scratch.dir(s, "q193_pairs_")}/p"
      Dedup.minhashNearDup(repDocs, "doc_id", "text", 3, 8, 3, 0.6)
        .select(col("id_a"), col("id_b"))
        .write.mode("overwrite").parquet(pairPath)
      val pairs = s.read.parquet(pairPath)
      val stored = pairs.where((col("id_a") + col("id_b")) % 2 === 0)
      val fresh = pairs.where((col("id_a") + col("id_b")) % 2 === 1)
      val labels0 = Dedup.clustersFromPairs(
        repDocs.select(col("doc_id")), "doc_id", stored)
      val merged = Dedup.mergeClusters(labels0, "doc_id", "cluster_id",
        repDocs.select(col("doc_id")), fresh)
      mapping
        .join(merged.withColumnRenamed("doc_id", "rep"), "rep")
        .select(col("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE ${ccClustersSql}
      SELECT doc_id, cluster_id FROM cl ORDER BY doc_id"""))

  /** WAV fixtures for q194 — real integer-PCM sample decode with
    * exact-integer statistics (peak |sample|, Σ sample², full-scale
    * count), so the planted oracle is analytic, no tolerance needed.
    */
  private val wavFixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.Wav
    val mono16 = Wav.encode(8000, 1, 16,
      Array(0, 100, -100, 200, -200, 32767))
    val stereo8 = Wav.encode(44100, 2, 8,
      Array(10, -10, 20, -20, 127, -128))
    val mono24 = Wav.encode(48000, 1, 24,
      Array(8388607, -8388608, 5))
    // format code 3 (float) at 16-bit declines with nulls — float
    // PCM is 32-bit only
    val float16 = mono16.clone(); float16(20) = 3
    // real IEEE float-PCM: all values multiples of 1/32768, so the
    // rint(f*2^15) grid recovers exact ints: 16384, -8192, 32768(clip),
    // -32768(clip), 12, 65536(over-range clip)
    val float32 = Wav.encodeFloat(16000, 1,
      Array(0.5f, -0.25f, 1.0f, -1.0f, 12f / 32768f, 2.0f))
    Seq(
      "wv_1.wav" -> mono16,
      "wv_2.wav" -> stereo8,
      "wv_3.wav" -> mono24,
      // truncated mid-data -> whole decode refuses with nulls
      "wv_4.wav" -> mono16.dropRight(5),
      "wv_5.wav" -> float16,
      "wv_6.wav" -> float32)
  }

  // ---- q194: WAV PCM sample decode + audio-quality statistics ----
  // The audio payload decoder (rows 37/73 walk headers only; this
  // reads the samples): integer PCM at 8/16/24-bit, exact peak /
  // energy / clipping counts recovered from compressed-free bytes.
  // doc 1: sumsq = 100k + 32767^2, clipped 1 (full scale);
  // doc 2: 8-bit unsigned-centered, peak 128, clipped 2 (+-full);
  // doc 3: 24-bit extremes, sumsq = (2^23-1)^2 + (2^23)^2 + 25;
  // doc 4 truncated, doc 5 float-PCM -> declined with nulls.

  val q194 = Q(
    "q194_wav_samples",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q194_wav_")
      wavFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.decodeAudioStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .orderBy("doc_id")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(8000 AS INTEGER), CAST(1 AS INTEGER),
         CAST(16 AS INTEGER), CAST(6 AS BIGINT), CAST(32767 AS BIGINT),
         CAST(1073776289 AS BIGINT), CAST(1 AS BIGINT)),
        (2, 44100, 2, 8, 3, 128, 33513, 2),
        (3, 48000, 1, 24, 3, 8388608, 140737471578138, 2),
        (4, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (5, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (6, 16000, 1, 32, 6, 65536, 6777995408, 3))
        AS t(doc_id, sample_rate, n_channels, bits, n_frames,
             peak_abs, sum_squares, n_clipped)
      ORDER BY doc_id"""))

  // ---- q221: G.711 µ-law/A-law WAV decode ----
  // Telephony-corpus audio: the same decodeAudioStats surface expands
  // format-6 (A-law) / format-7 (µ-law) companded bytes to their EXACT
  // 13/14-bit linear values via the public ITU G.711 segment formulas,
  // so the planted oracle is analytic like q194's. Full scale is each
  // codec's maximum decode magnitude (A-law 32256, µ-law 32124); a
  // G.711 file claiming bits != 8 declines with nulls.
  // doc 1 µ-law mono [0xFF,0x80,0x00,0xE0] -> 0, +32124, -32124, +372;
  // doc 2 A-law stereo [0xAA,0x2A,0xD5,0x55] -> +-32256, +-8 (2 frames);
  // doc 3 µ-law with a 16-bit bits field -> declined;
  // doc 4 A-law mono [0xD5,0x55,0xC5] -> +8, -8, +264.

  private val g711Fixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.Wav
    val ulaw = Wav.encodeG711(8000, 1, aLaw = false,
      Array(0xFF, 0x80, 0x00, 0xE0))
    val alaw = Wav.encodeG711(16000, 2, aLaw = true,
      Array(0xAA, 0x2A, 0xD5, 0x55))
    val badBits = Wav.encodeG711(8000, 1, aLaw = false,
      Array(0xFF, 0x80))
    badBits(34) = 16 // fmt chunk bits field: G.711 must be 8-bit
    val alawMid = Wav.encodeG711(8000, 1, aLaw = true,
      Array(0xD5, 0x55, 0xC5))
    Seq(
      "g7_1.wav" -> ulaw,
      "g7_2.wav" -> alaw,
      "g7_3.wav" -> badBits,
      "g7_4.wav" -> alawMid)
  }

  val q221 = Q(
    "q221_g711_samples",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q221_g711_")
      g711Fixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.decodeAudioStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .orderBy("doc_id")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(8000 AS INTEGER), CAST(1 AS INTEGER),
         CAST(8 AS INTEGER), CAST(4 AS BIGINT), CAST(32124 AS BIGINT),
         CAST(2064041136 AS BIGINT), CAST(2 AS BIGINT)),
        (2, 16000, 2, 8, 2, 32256, 2080899200, 2),
        (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (4, 8000, 1, 8, 3, 264, 69824, 0))
        AS t(doc_id, sample_rate, n_channels, bits, n_frames,
             peak_abs, sum_squares, n_clipped)
      ORDER BY doc_id"""))

  // ---- q229: windowed audio feature extraction ----
  // The feature-extract verb at sub-recording grain (q194/q221 are
  // whole-recording aggregates): fixed 2-frame windows with exact
  // per-window peak/energy/clipping — the silence-detection / VAD /
  // loudness-profiling primitive. Fixtures reuse the q194/q221
  // families (int16, stereo8 with a partial last window, mu-law) plus
  // a truncated file that must emit ONE null row; every expected
  // value is analytic.

  private val audioWinFixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.Wav
    Seq(
      "aw_1.wav" -> Wav.encode(8000, 1, 16,
        Array(0, 100, -100, 200, -200, 32767)),
      "aw_2.wav" -> Wav.encode(44100, 2, 8,
        Array(10, -10, 20, -20, 127, -128)),
      "aw_3.wav" -> Wav.encodeG711(8000, 1, aLaw = false,
        Array(0xFF, 0x80, 0x00, 0xE0)),
      "aw_4.wav" -> Wav.encode(8000, 1, 16, Array(1, 2, 3)).dropRight(3))
  }

  val q229 = Q(
    "q229_audio_windows",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q229_audio_")
      audioWinFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.audioWindowStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord],
          windowFrames = 2)
        .orderBy("doc_id", "win_idx")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(0 AS INTEGER), CAST(8000 AS INTEGER),
         CAST(1 AS INTEGER), CAST(2 AS BIGINT), CAST(100 AS BIGINT),
         CAST(10000 AS BIGINT), CAST(0 AS BIGINT)),
        (1, 1, 8000, 1, 2, 200, 50000, 0),
        (1, 2, 8000, 1, 2, 32767, 1073716289, 1),
        (2, 0, 44100, 2, 2, 20, 1000, 0),
        (2, 1, 44100, 2, 1, 128, 32513, 2),
        (3, 0, 8000, 1, 2, 32124, 1031951376, 1),
        (3, 1, 8000, 1, 2, 32124, 1032089760, 1),
        (4, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, win_idx, sample_rate, n_channels, n_frames,
             peak_abs, sum_squares, n_clipped)
      ORDER BY doc_id, win_idx NULLS FIRST"""))

  // ---- q230: image grid-tile feature extraction ----
  // The vision-embedding precursor at sub-image grain
  // (decodePixelStats/q167 are whole-image aggregates): a 2x2 tile
  // map of exact per-tile channel sums, integer-division boundaries
  // so edge tiles absorb remainders identically cross-engine.
  // Fixtures: the q167 RGB 4x4 raster (even split), the grayscale
  // 3x5 (both axes leave remainders), the GIF 3x2 palette raster
  // (format dispatch), and a corrupt file emitting ONE null row.
  // Every expected sum is analytic from the planted rasters.

  private val tileFixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.PngEncoder.encode
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val rgb = encode(4, 4, 2,
      (for (y <- 0 until 4; x <- 0 until 4;
            v <- Seq(16 * x + y, 8 * y, 4 * (x + y))) yield v.toByte).toArray,
      rowFilters = Seq(0, 1, 2, 4))
    val gray = encode(3, 5, 0,
      (for (y <- 0 until 5; x <- 0 until 3) yield (10 * x + y).toByte).toArray,
      rowFilters = Seq(3))
    val gif = graft.multimodal.GifDecoder.encode(3, 2,
      b(255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 11, 13),
      b(0, 1, 2, 3, 0, 1))
    Seq(
      "tf_1.png" -> rgb,
      "tf_2.png" -> gray,
      "tf_3.gif" -> gif,
      "tf_4.png" -> rgb.dropRight(9))
  }

  val q230 = Q(
    "q230_image_tiles",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q230_tiles_")
      tileFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.tileFeatures(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord],
          grid = 2)
        .orderBy("doc_id", "tile_y", "tile_x")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(0 AS INTEGER), CAST(0 AS INTEGER),
         CAST(4 AS BIGINT), CAST(34 AS BIGINT), CAST(16 AS BIGINT),
         CAST(16 AS BIGINT)),
        (1, 1, 0, 4, 162, 16, 48),
        (1, 0, 1, 4, 42, 80, 48),
        (1, 1, 1, 4, 170, 80, 80),
        (2, 0, 0, 2, 1, 1, 1),
        (2, 1, 0, 4, 62, 62, 62),
        (2, 0, 1, 3, 9, 9, 9),
        (2, 1, 1, 6, 108, 108, 108),
        (3, 0, 0, 1, 255, 0, 0),
        (3, 1, 0, 2, 0, 255, 255),
        (3, 0, 1, 1, 7, 11, 13),
        (3, 1, 1, 2, 255, 255, 0),
        (4, NULL, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, tile_x, tile_y, n_px, sum_r, sum_g, sum_b)
      ORDER BY doc_id, tile_y NULLS FIRST, tile_x"""))

  // ---- q231: image near-dedup (dHash + banded Hamming join) ----
  // Near-dup for IMAGES, closing the multimodal×dedup loop: dHash
  // fingerprints (9×8 gradient-sign grid over decoded pixels) paired
  // by the exact pigeonhole-banded Hamming join. The gate is a TRUE
  // cross-engine differential: Spark synthesizes real grayscale PNGs
  // per id from an integer formula, DECODES the bytes, and hashes the
  // pixels; DuckDB computes the identical hash from the SYNTHESIS
  // RULE alone (gradient comparisons over the formula, two 32-bit
  // halves reassembled two's-complement) — any drift in the PNG
  // encoder, the decoder, the tile compare, or the banded join fails
  // the hash. Corpus: nation ids, +100 brightness twins (identical
  // gradients → Hamming 0), +200 right-half-brightened variants
  // (≤ 8 flipped bits — inside the radius).

  val q231 = Q(
    "q231_image_neardup",
    (s, dir) => {
      import s.implicits._
      val nation = Tables(s, dir, "nation")
      val ids = nation.select(col("n_nationkey").cast("long").as("id"))
      val allIds = ids
        .unionByName(ids.select((col("id") + 100).as("id")))
        .unionByName(ids.select((col("id") + 200).as("id")))
        .as[Long]
      val media = allIds.mapPartitions { it =>
        it.map { id =>
          val fam = (id % 100).toInt
          val bright = (id / 100).toInt * 25
          val samples = Array.tabulate[Byte](9 * 8) { p =>
            val x = p % 9
            val y = p / 9
            // QUADRATIC Knuth mix: a linear congruential mix gives
            // every family the same gradient step (near-identical
            // hashes); squaring the phase makes gradient signs
            // pseudo-random per family, so cross-family Hamming sits
            // near 32 and only true variants pair
            val v = (x + 9 * y + 72 * fam + 1).toLong
            val core = ((v * v * 2654435761L) % 2147483647L % 150L).toInt
            (core + bright +
              (if (id >= 200 && x >= 5) 40 else 0)).toByte
          }
          graft.multimodal.MediaRecord(id,
            graft.multimodal.PngEncoder.encode(9, 8, 0, samples),
            "image/png")
        }
      }
      // stage the hashes: the banded pair join references them twice
      val ht = Scratch.dir(s, "q231_hashes_")
      Multimodal.dHash64(media).write.mode("overwrite").parquet(ht)
      val hs = s.read.parquet(ht)
      val pairs = Dedup.hammingPairs64(hs, "doc_id", "dhash",
        maxHamming = 8)
      val sym = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      hs.join(sym, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dhash"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"))
        .orderBy("doc_id")
    },
    Some("""
      WITH ids AS (
        SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation
        UNION ALL SELECT CAST(n_nationkey + 100 AS BIGINT) FROM nation
        UNION ALL SELECT CAST(n_nationkey + 200 AS BIGINT) FROM nation),
      xs AS (SELECT unnest(range(0, 9)) AS x),
      ys AS (SELECT unnest(range(0, 8)) AS y),
      px AS (SELECT id, x, y,
               ((x + 9*y + 72*(id % 100) + 1)
                 * (x + 9*y + 72*(id % 100) + 1) * 2654435761)
                 % 2147483647 % 150
               + 25*(id // 100)
               + CASE WHEN id >= 200 AND x >= 5 THEN 40 ELSE 0 END AS g
             FROM ids, xs, ys),
      bits AS (SELECT a.id, a.x, a.y,
                 CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
               FROM px a JOIN px b
                 ON b.id = a.id AND b.y = a.y AND b.x = a.x + 1
               WHERE a.x < 8),
      halves AS (SELECT id,
          CAST(sum(CASE WHEN y*8 + x < 32
            THEN bit * (CAST(1 AS BIGINT) << CAST(y*8 + x AS INT))
            ELSE 0 END) AS BIGINT) AS lo,
          CAST(sum(CASE WHEN y*8 + x >= 32
            THEN bit * (CAST(1 AS BIGINT) << CAST(y*8 + x - 32 AS INT))
            ELSE 0 END) AS BIGINT) AS hi
        FROM bits GROUP BY 1),
      hs AS (SELECT id,
          CASE WHEN hi >= 2147483648
               THEN (hi - 4294967296) * 4294967296 + lo
               ELSE hi * 4294967296 + lo END AS dhash
        FROM halves)
      SELECT a.id AS doc_id, a.dhash,
             CAST(count(b.id) AS BIGINT) AS n_dup
      FROM hs a LEFT JOIN hs b
        ON b.id <> a.id AND bit_count(xor(a.dhash, b.dhash)) <= 8
      GROUP BY 1, 2 ORDER BY doc_id"""))

  // ---- q195: end-to-end entity resolution ----
  // The record-linkage PIPELINE assembled from its graded kernels:
  // blocked fuzzy pairs (row 192) -> connected components (row 49,
  // taking the adaptive local path at this graph size) -> survivorship
  // (the row-163 keep-best rule at entity grain). One row per resolved
  // multi-name entity: member/row counts + the canonical name
  // (most source rows, name tiebreak). Name-grain ids are min
  // p_partkey per name, so cluster ids are engine-deterministic.

  val q195 = Q(
    "q195_entity_resolution",
    (s, dir) => {
      val part = Tables(s, dir, "part")
      val names = part.groupBy(col("p_name").as("name"))
        .agg(min(col("p_partkey")).cast("long").as("nid"),
          count(lit(1)).as("n_rows"))
      val pairs = graft.operators.Similarity.blockedFuzzyPairs(
        part, "p_name",
        Seq(
          n => element_at(split(n, " "), 1),
          n => element_at(split(n, " "), 2)),
        threshold = 0.75)
      val edges = pairs
        .join(names.select(col("name").as("name_a"), col("nid").as("id_a")),
          "name_a")
        .join(names.select(col("name").as("name_b"), col("nid").as("id_b")),
          "name_b")
        .select(col("id_a"), col("id_b"))
      val labels = Dedup.clustersFromPairs(
        names.select(col("nid")), "nid", edges)
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_rows").desc, col("name").asc)
      names.join(labels, "nid")
        .withColumn("rk", row_number().over(w))
        .groupBy("cluster_id")
        .agg(
          count(lit(1)).as("n_names"),
          sum(col("n_rows")).as("n_rows_total"),
          max(when(col("rk") === 1, col("name"))).as("canonical_name"))
        .where(col("n_names") >= 2)
        .orderBy("cluster_id")
    },
    Some(s"""
      WITH RECURSIVE
      names AS (SELECT p_name AS name,
                  CAST(min(p_partkey) AS BIGINT) AS nid,
                  CAST(count(*) AS BIGINT) AS n_rows
                FROM part GROUP BY 1),
      bl AS (SELECT name, 0 AS bk, split_part(name, ' ', 1) AS bv
             FROM names
             UNION ALL
             SELECT name, 1, split_part(name, ' ', 2) FROM names),
      cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
               FROM bl a JOIN bl b
                 ON a.bk = b.bk AND a.bv = b.bv AND a.name < b.name),
      p AS (SELECT na.nid AS id_a, nb.nid AS id_b
            FROM cand
            JOIN names na ON na.name = cand.name_a
            JOIN names nb ON nb.name = cand.name_b
            WHERE ${Numerics.sqlFix(
      "jaro_winkler_similarity(cand.name_a, cand.name_b)", 4)} >= 0.75),
      edges AS (SELECT id_a AS src, id_b AS dst FROM p
                UNION ALL
                SELECT id_b, id_a FROM p),
      reach(a, b) AS (
        SELECT nid, nid FROM names
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
      cl AS (SELECT a AS nid, min(b) AS cluster_id FROM reach GROUP BY a),
      m AS (SELECT c.cluster_id, n.name, n.n_rows,
              row_number() OVER (PARTITION BY c.cluster_id
                ORDER BY n.n_rows DESC, n.name) AS rk
            FROM names n JOIN cl c ON c.nid = n.nid)
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_names,
             CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
             max(CASE WHEN rk = 1 THEN name END) AS canonical_name
      FROM m GROUP BY 1 HAVING count(*) >= 2
      ORDER BY cluster_id"""))

  // ---- q198: sequence-packing realization ----
  // q113's boundary map realized at SEQUENCE grain: each doc explodes
  // into the seqs it spans, per-seq token occupancy is pure interval
  // arithmetic on the map (exact longs), and the output profiles every
  // training sequence — docs packed in, tokens filled (= seqLen except
  // the final partial pack), carry-overs split across the boundary.
  // Same distributed-prefix-sum scale shape as the map itself; the
  // explode emits n_seqs rows per doc (output-bound, ~total/seqLen).

  val q198 = Q(
    "q198_packing_realize",
    (s, dir) => {
      val run = Sampling.packingMapRun(
        docs(s, dir), "doc_id", "n_chars", seqLen = 2048)
      val p = s"${Scratch.dir(s, "q198_pack_")}/m"
      run.result.write.mode("overwrite").parquet(p)
      run.release()
      s.read.parquet(p)
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
        .withColumn("tok_in",
          least(col("start_offset") + col("n_tokens"),
            (col("seq_id") + 1) * 2048L) -
            greatest(col("start_offset"), col("seq_id") * 2048L))
        .groupBy("seq_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tok_in")).as("n_tokens"),
          count(when(col("start_offset") + col("n_tokens") >
            (col("seq_id") + 1) * 2048L, lit(1))).as("n_carry"))
        .orderBy("seq_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens,
                        ('0x'||substr(md5('0|'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                          AS ord
                 FROM documents WHERE n_chars > 0),
      c AS (SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY ord, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
            FROM t),
      map AS (SELECT doc_id, n_tokens,
                     CAST(e - n_tokens AS BIGINT) AS so,
                     CAST((e - n_tokens) // 2048 AS BIGINT) AS fs,
                     CAST((e - 1) // 2048 AS BIGINT) AS ls
              FROM c),
      x AS (SELECT doc_id, n_tokens, so,
                   unnest(range(fs, ls + 1)) AS seq_id
            FROM map),
      ti AS (SELECT seq_id, so, n_tokens,
               least(so + n_tokens, (seq_id + 1) * 2048)
                 - greatest(so, seq_id * 2048) AS tok_in
             FROM x)
      SELECT CAST(seq_id AS BIGINT) AS seq_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tok_in) AS BIGINT) AS n_tokens,
             CAST(count(CASE WHEN so + n_tokens > (seq_id + 1) * 2048
               THEN 1 END) AS BIGINT) AS n_carry
      FROM ti GROUP BY 1 ORDER BY seq_id"""))

  /** Animated-GIF fixtures for q200 — composition ground truth:
    * full-canvas base, partial-rect overdraw, a transparent-index
    * frame with disposal-2 restore, then a post-restore rect.
    */
  private val gifAnimFixtures: Seq[(String, Array[Byte])] = {
    import graft.multimodal.GifDecoder
    import graft.multimodal.GifDecoder.AnimFrame
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 200.toByte, 100, 0, 5, 5, 5)
    val anim = GifDecoder.encodeAnimated(4, 2, pal, Seq(
      AnimFrame(0, 0, 4, 2, Array.fill(8)(0.toByte), delayCs = 10),
      AnimFrame(1, 0, 2, 1, Array[Byte](1, 2), delayCs = 20),
      AnimFrame(0, 1, 2, 1, Array[Byte](3, 1), delayCs = 30,
        transparentIndex = 3, disposal = 2),
      AnimFrame(3, 1, 1, 1, Array[Byte](2), delayCs = 5)))
    // disposal 3 (restore-previous) must DECLINE: patch frame 1's GCE
    val d3 = GifDecoder.encodeAnimated(2, 1, pal, Seq(
      AnimFrame(0, 0, 2, 1, Array[Byte](0, 1))))
    val gceAt = d3.indexOfSlice(Seq(0x21.toByte, 0xF9.toByte))
    d3(gceAt + 3) = (d3(gceAt + 3) | (3 << 2)).toByte
    Seq(
      "ga_1.gif" -> anim,
      "ga_2.gif" -> anim.dropRight(12), // truncated mid-stream
      "ga_3.gif" -> d3)
  }

  // ---- q200: animated-GIF frame sampling ----
  // The multimodal mandate's "frame-sample" verb on a format the
  // engine decodes for real: every 2nd COMPOSITED frame of a 4-frame
  // animation (partial rects, transparency holes, a disposal-2
  // restore) — ground truth is hand-computed canvas sums per frame.
  // Frame 0: all color0 -> (80,160,240); frame 2 composites the
  // transparent-indexed rect (only its opaque pixel draws) on top of
  // frame 1's overdraw -> (330,300,270). Truncated and disposal-3
  // files decline with nulls.

  val q200 = Q(
    "q200_gif_frame_sample",
    (s, dir) => {
      import s.implicits._
      val mdir = Scratch.dir(s, "q200_gifanim_")
      gifAnimFixtures.foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.sampleGifFrames(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord],
          everyK = 2, maxFrames = 8)
        .orderBy("doc_id", "frame_idx")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(0 AS INTEGER), CAST(10 AS INTEGER),
         CAST(4 AS INTEGER), CAST(2 AS INTEGER), CAST(8 AS BIGINT),
         CAST(80 AS BIGINT), CAST(160 AS BIGINT), CAST(240 AS BIGINT)),
        (1, 2, 30, 4, 2, 8, 330, 300, 270),
        (2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, frame_idx, delay_cs, px_w, px_h, n_opaque,
             sum_r, sum_g, sum_b)
      ORDER BY doc_id, frame_idx NULLS FIRST"""))

  // ---- q201: image resize (nearest-neighbor thumbnail pass) ----
  // The mandate's "resize" verb: decode (JPEG/GIF here) -> nearest
  // resize to 4x4 -> exact stats. Nearest is floor(dst*src/out) pure
  // integer picking, so flat-tile / palette fixtures stay analytic:
  // the 24x16 flat-tile JPEG picks tile values [32,32,96,200] /
  // [255,255,0,128] twice each -> 1996 per channel; the 3x2 GIF
  // upscales by replication -> (1558,1064,562).

  val q201 = Q(
    "q201_image_resize",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.{GifDecoder, JpegEncoder}
      val mdir = Scratch.dir(s, "q201_resize_")
      def tiles(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
        Array.tabulate(w * h)(i => f((i % w) / 8, (i / w) / 8).toByte)
      val vals = Array(Array(32, 96, 200), Array(255, 0, 128))
      val jpg = JpegEncoder.encode(24, 16,
        tiles(24, 16, (tx, ty) => vals(ty)(tx)), gray = true)
      val gif = GifDecoder.encode(3, 2,
        Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte,
          7, 11, 13),
        Array[Byte](0, 1, 2, 3, 0, 1))
      Seq(
        "rz_1.jpg" -> jpg,
        "rz_2.gif" -> gif,
        "rz_3.jpg" -> jpg.dropRight(40)).foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.resizePixelStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord],
          outW = 4, outH = 4)
        .orderBy("doc_id")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(4 AS INTEGER), CAST(4 AS INTEGER),
         CAST(16 AS BIGINT), CAST(1996 AS BIGINT), CAST(1996 AS BIGINT),
         CAST(1996 AS BIGINT)),
        (2, 4, 4, 16, 1558, 1064, 562),
        (3, NULL, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b)
      ORDER BY doc_id"""))

  // ---- q206: image resize, BILINEAR (anti-aliased thumbnail pass) ----
  // Same fixtures and shape as q201, but through the integer-exact
  // bilinear kernel (Multimodal.resizeBilinear: fixed-point
  // half-pixel-center taps, round half-up — deterministic, no
  // floats). The flat-tile JPEG is ANALYTIC under any correct
  // bilinear kernel: every 4x4 output tap pair falls inside one flat
  // 8x8 tile (sx in {2.5, 8.5, 14.5, 20.5}, sy in {1.5, 5.5, 9.5,
  // 13.5}), so outputs are the tile constants -> 2*(32+96+96+200) +
  // 2*(255+0+0+128) = 1614/channel. The 3x2 GIF upscale blends
  // across colors: constants re-derived by the exact integer formula
  // (spec'd against an independent BigInt-rational reference).

  val q206 = Q(
    "q206_image_resize_bilinear",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.{GifDecoder, JpegEncoder}
      val mdir = Scratch.dir(s, "q206_resize_bl_")
      def tiles(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
        Array.tabulate(w * h)(i => f((i % w) / 8, (i / w) / 8).toByte)
      val vals = Array(Array(32, 96, 200), Array(255, 0, 128))
      val jpg = JpegEncoder.encode(24, 16,
        tiles(24, 16, (tx, ty) => vals(ty)(tx)), gray = true)
      val gif = GifDecoder.encode(3, 2,
        Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte,
          7, 11, 13),
        Array[Byte](0, 1, 2, 3, 0, 1))
      Seq(
        "rz_1.jpg" -> jpg,
        "rz_2.gif" -> gif,
        "rz_3.jpg" -> jpg.dropRight(40)).foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.resizePixelStats(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord],
          outW = 4, outH = 4, filter = Multimodal.Bilinear)
        .orderBy("doc_id")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(4 AS INTEGER), CAST(4 AS INTEGER),
         CAST(16 AS BIGINT), CAST(1614 AS BIGINT), CAST(1614 AS BIGINT),
         CAST(1614 AS BIGINT)),
        (2, 4, 4, 16, 1358, 1369, 738),
        (3, NULL, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b)
      ORDER BY doc_id"""))

  // ---- q207: MP4 keyframe sampling (codec-free stbl walk) ----
  // The frame-sample verb on the dominant VIDEO container: walk
  // moov/trak/mdia/stbl (Mp4.keyframes — stss sync samples, stts
  // decode times, stsc/stsz/stco byte ranges), sample every 2nd
  // keyframe, and emit (sample_no, ts_ms, mdat byte range) — the
  // index a decode stage slices on, no H.264 decode. Fixtures are
  // planted by the Mp4.encode twin, so every output value is
  // analytic: ts = Σ earlier deltas · 1000 / timescale; offset =
  // chunk stco + earlier in-chunk sizes (constants replicated
  // independently; Mp4Spec asserts them against the JVM walk too).

  val q207 = Q(
    "q207_mp4_keyframe_sample",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.Mp4
      val mdir = Scratch.dir(s, "q207_mp4_")
      val a = Mp4.encode(1000,
        Array(100, 100, 100, 100, 100, 100),
        Array(10, 20, 30, 40, 50, 60), samplesPerChunk = 2,
        syncSamples = Array(1, 3, 5))
      val b = Mp4.encode(90000,
        Array(3000, 3000, 6000, 3000, 3000, 3000, 6000, 6000),
        Array.fill(8)(100), samplesPerChunk = 3,
        syncSamples = Array(1, 2, 4, 6, 8))
      Seq(
        "kf_1.mp4" -> a,
        "kf_2.mp4" -> b,
        "kf_3.mp4" -> a.dropRight(25)).foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.sampleMp4Keyframes(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord],
          everyK = 2, maxFrames = 8)
        .orderBy("doc_id", "frame_idx")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(0 AS INTEGER), CAST(1 AS INTEGER),
         CAST(0 AS BIGINT), CAST(501 AS BIGINT), CAST(10 AS BIGINT)),
        (1, 1, 5, 400, 601, 50),
        (2, 0, 1, 0, 541, 100),
        (2, 1, 4, 133, 841, 100),
        (2, 2, 8, 300, 1241, 100),
        (3, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, frame_idx, sample_no, ts_ms, byte_offset, byte_size)
      ORDER BY doc_id, frame_idx NULLS FIRST"""))

  // ---- q208: HTML -> text extraction + boilerplate signals ----
  // The web-crawl pipeline's first text step, hash-gated end to end:
  // pages are SYNTHESIZED deterministically from the documents table
  // (identical || template in both engines — script/style/comment
  // payloads, nav boilerplate, entities, a per-parity extra link
  // list), then TextAnalysis.htmlExtract strips them down and prices
  // the boilerplate (title, anchor count, link density). Every regex
  // step has an exact RE2-safe DuckDB twin; md5 of the extracted text
  // makes divergence anywhere in the chain a hash failure.

  val q208 = Q(
    "q208_html_extract",
    (s, dir) => {
      val d = docs(s, dir)
      val did = col("doc_id").cast("string")
      val html = concat(
        lit("<html><head><title>Doc "), did, lit("</title>"),
        lit("<script type=\"text/javascript\">var x = 1 < 2 && \""),
        col("source"), lit("\";</script>"),
        lit("<style>p { color: red; }</style></head><body>"),
        lit("<!-- nav boilerplate --><div class=\"nav\">" +
          "<a href=\"/\">Home</a> <a href=\"/about\">About &amp; Site</a>" +
          "</div>"),
        lit("<h1>Doc "), did, lit("</h1><p>"), col("text"), lit("</p>"),
        when(col("doc_id") % 2 === 0,
          concat(lit("<ul><li><a href=\"/more\">"), col("source"),
            lit(" archive</a></li></ul>"))).otherwise(lit("")),
        lit("<br><p>&quot;fin&#39; &lt;x&gt;&nbsp;end&amp;co</p>" +
          "</body></html>"))
      TextAnalysis.htmlExtract(
          d.select(col("doc_id"), html.as("html")), "doc_id", "html")
        .select(col("doc_id"), col("title"), col("n_links"),
          col("link_density"),
          length(col("text")).cast("long").as("text_len"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH h AS (
        SELECT doc_id,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          '</title><script type="text/javascript">var x = 1 < 2 && "' ||
          source || '";</script><style>p { color: red; }</style>' ||
          '</head><body><!-- nav boilerplate --><div class="nav">' ||
          '<a href="/">Home</a> <a href="/about">About &amp; Site</a>' ||
          '</div><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' ||
          text || '</p>' ||
          CASE WHEN doc_id % 2 = 0 THEN
            '<ul><li><a href="/more">' || source ||
            ' archive</a></li></ul>' ELSE '' END ||
          '<br><p>&quot;fin&#39; &lt;x&gt;&nbsp;end&amp;co</p>' ||
          '</body></html>' AS html
        FROM documents),
      strip AS (
        SELECT doc_id, html,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            html,
            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
            '(?s)<!--.*?-->', ' ', 'g'),
            '(?i)</?(p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>', ' ', 'g')
          AS blocks,
          array_to_string(regexp_extract_all(html,
            '(?is)<a[^>]*>(.*?)</a>', 1), ' ') AS anchor_raw
        FROM h),
      txt AS (
        SELECT doc_id, html,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(blocks, '(?s)<[^>]*>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&'),
            '[ \t\n\r]+', ' ', 'g')) AS text,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(anchor_raw, '(?s)<[^>]*>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&'),
            '[ \t\n\r]+', ' ', 'g')) AS anchor_text
        FROM strip)
      SELECT doc_id,
        regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS title,
        CAST(len(regexp_extract_all(html, '(?i)<a[\\s>]')) AS BIGINT)
          AS n_links,
        ${Numerics.sqlFix(
      "CASE WHEN length(text) > 0 THEN CAST(length(anchor_text) AS DOUBLE)" +
        " / length(text) ELSE 0.0 END", 4)} AS link_density,
        CAST(length(text) AS BIGINT) AS text_len,
        md5(text) AS text_md5
      FROM txt
      ORDER BY doc_id"""))

  // ---- q209: Unicode NFC normalization audit ----
  // The curation step that collapses byte-variant spellings BEFORE
  // hash-grain dedup: a corpus mixing precomposed and decomposed
  // accents under-dedups silently (same text, different digests).
  // Input is synthesized deterministically from documents — every 'e'
  // becomes decomposed e+U+0301, odd docs get a precomposed U+00E9
  // suffix — then graft_nfc (java.text.Normalizer, codegen'd)
  // canonicalizes. UAX #15 fully specifies the algorithm, so DuckDB's
  // utf8proc nfc_normalize must agree byte-for-byte: md5 of the
  // normalized text is the gate. Lengths are codepoint-BMP-safe
  // (no surrogates in the synthesis, so Spark's UTF-16 length ==
  // DuckDB's codepoint length).

  val q209 = Q(
    "q209_nfc_normalize",
    (s, dir) => {
      graft.GraftFunctions.register(s)
      val d = docs(s, dir)
      val denorm = concat(
        regexp_replace(col("text"), "e", "é"),
        when(col("doc_id") % 2 === 1, lit(" café")).otherwise(lit("")))
      d.select(col("doc_id"), denorm.as("t"))
        .select(
          col("doc_id"),
          length(col("t")).cast("long").as("raw_len"),
          length(graft.GraftFunctions.nfc(col("t"))).cast("long")
            .as("nfc_len"),
          (graft.GraftFunctions.nfc(col("t")) =!= col("t")).as("changed"),
          md5(graft.GraftFunctions.nfc(col("t"))).as("nfc_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
          replace(text, 'e', 'e' || chr(769)) ||
          CASE WHEN doc_id % 2 = 1 THEN ' caf' || chr(233) ELSE '' END
          AS t
        FROM documents)
      SELECT doc_id,
        CAST(length(t) AS BIGINT) AS raw_len,
        CAST(length(nfc_normalize(t)) AS BIGINT) AS nfc_len,
        nfc_normalize(t) <> t AS changed,
        md5(nfc_normalize(t)) AS nfc_md5
      FROM d
      ORDER BY doc_id"""))

  // ---- q210: sentence segmentation + per-doc sentence stats ----
  // The grain sentence-level curation runs at: deterministic
  // terminal-punctuation splitter (the rule IS the contract — both
  // engines must split identically), one explode + one hash agg,
  // min_by-ordinal first-sentence digest so output is shuffle-exact.

  val q210 = Q(
    "q210_sentence_stats",
    (s, dir) => {
      TextAnalysis.sentenceStats(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH p AS (
        SELECT doc_id,
          unnest(string_split_regex(text, '[.!?]+[ ]+')) AS s,
          unnest(range(1, len(string_split_regex(text, '[.!?]+[ ]+')) + 1))
            AS pos
        FROM documents),
      ne AS (SELECT * FROM p WHERE s <> '')
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_sentences,
        ${Numerics.sqlFix(
      "CAST(sum(length(s)) AS DOUBLE) / count(*)", 4)} AS mean_sent_chars,
        CAST(max(length(s)) AS BIGINT) AS max_sent_chars,
        md5(min_by(s, pos)) AS first_sentence_md5
      FROM ne GROUP BY doc_id
      ORDER BY doc_id"""))

  // ---- q211: matryoshka embedding-truncation audit ----
  // Prices prefix-truncated serving (one stored vector, many
  // effective dims): per truncation dim, does exact top-1 cosine on
  // the sliced vectors still agree with the full-dim top-1, and what
  // cosine does the truncated space report. Brute-force over the
  // 5-query sample (the annRecall discipline), never corpus-as-
  // queries; oracle re-derives the full ranking over DuckDB list
  // slices.

  val q211 = Q(
    "q211_matryoshka_audit",
    (s, dir) => {
      val e = embs(s, dir)
      graft.operators.Similarity.matryoshkaAudit(
          e.where(col("vec_id") < 5), e.where(col("vec_id") >= 5),
          "vec_id", "embedding", dims = Seq(8, 16, 32), fullDim = 64)
        .orderBy("trunc_dim", "query_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT * FROM e WHERE vec_id < 5),
      c AS (SELECT * FROM e WHERE vec_id >= 5),
      dims AS (SELECT unnest([8, 16, 32]) AS d),
      scored AS (
        SELECT dims.d AS trunc_dim, q.vec_id AS query_id,
               c.vec_id AS neighbor_id,
               list_dot_product(q.v[1:dims.d], c.v[1:dims.d]) /
                 (sqrt(list_dot_product(q.v[1:dims.d], q.v[1:dims.d])) *
                  sqrt(list_dot_product(c.v[1:dims.d], c.v[1:dims.d])))
                 AS cos
        FROM dims CROSS JOIN q JOIN c ON q.vec_id != c.vec_id),
      t1 AS (
        SELECT trunc_dim, query_id, neighbor_id AS top1_id,
               ${Numerics.sqlFix("cos", 4)} AS cos_trunc,
               row_number() OVER (PARTITION BY trunc_dim, query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS rk
        FROM scored),
      fullsc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) /
                 (sqrt(list_dot_product(q.v, q.v)) *
                  sqrt(list_dot_product(c.v, c.v))) AS cos
        FROM q JOIN c ON q.vec_id != c.vec_id),
      f1 AS (
        SELECT query_id, neighbor_id AS full_top1,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id ASC) AS rk
        FROM fullsc)
      SELECT t1.trunc_dim, t1.query_id, t1.top1_id,
             t1.top1_id = f1.full_top1 AS matches_full, t1.cos_trunc
      FROM t1 JOIN f1 ON f1.query_id = t1.query_id AND f1.rk = 1
      WHERE t1.rk = 1
      ORDER BY t1.trunc_dim, t1.query_id"""))

  // ---- q212: token-budget mixture plan ----
  // The data-constrained-scaling planning step: temperature weights at
  // TOKEN-MASS grain (the unit a budget is spent in), per-source token
  // quotas for a concrete budget, and the epochs-over-source number
  // that decides whether the mix repeats data past useful reuse.

  val q212 = Q(
    "q212_token_budget",
    (s, dir) => {
      val d = docs(s, dir)
      val docTokens = d.select(col("doc_id"), col("source"),
          explode(graft.functions.Texts.words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_tokens"))
      graft.operators.Sampling.tokenBudgetPlan(
          docTokens, "source", "n_tokens", budget = 100000L)
        .orderBy("source")
    },
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      dt AS (SELECT d.source, CAST(count(*) AS BIGINT) AS avail_tokens
             FROM occ o JOIN documents d ON d.doc_id = o.doc_id
             WHERE o.word <> '' GROUP BY 1),
      tw AS (SELECT sum(sqrt(CAST(avail_tokens AS DOUBLE))) AS t FROM dt)
      SELECT source, avail_tokens,
        ${Numerics.sqlFix(
      "sqrt(CAST(avail_tokens AS DOUBLE)) / tw.t", 4)} AS weight,
        CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE)) / tw.t * 100000 + 0.5)
          AS BIGINT) AS quota_tokens,
        ${Numerics.sqlFix(
      "CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE)) / tw.t * 100000 + 0.5)" +
        " AS DOUBLE) / CAST(avail_tokens AS DOUBLE)", 4)} AS epochs,
        CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE)) / tw.t * 100000 + 0.5)
          AS DOUBLE) > 4.0 * CAST(avail_tokens AS DOUBLE) AS over_cap
      FROM dt CROSS JOIN tw
      ORDER BY source"""))

  // ---- q214: classifier-score rank AUC ----
  // The evaluation a learned quality scorer gets before its threshold
  // gates a corpus: exact ROC-AUC via the rank-sum identity
  // (AUC = U/(n1*n0), average ranks for ties) — here auditing whether
  // mean word length separates the first ten synthetic sources from
  // the rest (a null-ish hypothesis: AUC near 0.5 is the honest
  // answer, and the gate hash-checks the exact value).

  val q214 = Q(
    "q214_score_auc",
    (s, dir) => {
      val d = docs(s, dir)
      val scored = d.select(col("doc_id"), col("source"),
          explode(graft.functions.Texts.words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("doc_id", "source")
        .agg(Numerics.fix4(sum(length(col("w"))).cast("double") /
          count(lit(1))).as("score"))
        .withColumn("label",
          substring(col("source"), 4, 10).cast("int") < 10)
      graft.operators.Experiments.rankAuc(scored, "label", "score")
    },
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      ds AS (SELECT o.doc_id,
                    CAST(substr(d.source, 4) AS INTEGER) < 10 AS y,
                    ${Numerics.sqlFix(
      "CAST(sum(length(o.word)) AS DOUBLE) / count(*)", 4)} AS x
             FROM occ o JOIN documents d ON d.doc_id = o.doc_id
             WHERE o.word <> '' GROUP BY o.doc_id, d.source),
      g AS (SELECT x, CAST(count(*) AS BIGINT) AS t,
                   CAST(count(*) FILTER (WHERE y) AS BIGINT) AS tp
            FROM ds GROUP BY x),
      c AS (SELECT x, t, tp,
                   sum(t) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
            FROM g),
      m AS (SELECT CAST(sum(tp) AS BIGINT) AS n_pos,
                   CAST(sum(t) AS BIGINT) AS n,
                   sum(CAST(tp AS HUGEINT) *
                       (CAST(cum AS HUGEINT) * 2 - t + 1)) AS r2p
            FROM c)
      SELECT n_pos, (n - n_pos) AS n_neg,
        ${Numerics.sqlFix(
      "(CAST(r2p AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1)) / " +
        "(2.0 * n_pos * (n - n_pos))", 4)} AS auc
      FROM m"""))

  // ---- q215: length-bucket padding audit ----
  // Prices the padding waste of fixed-shape batching: each doc lands
  // in the smallest cap that holds it (CASE ladder, not float log2 —
  // exact at boundaries), per bucket real vs pad tokens and the
  // pad_frac that justifies packing or a new bucket. Overflow docs
  // truncate to the largest cap and the loss is REPORTED.

  val q215 = Q(
    "q215_padding_audit",
    (s, dir) => {
      val d = docs(s, dir)
      val docTokens = d.select(col("doc_id"),
          explode(graft.functions.Texts.words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"))
      graft.operators.Sampling.paddingAudit(
        docTokens, "n_tokens", caps = Seq(16, 32, 64, 128, 256))
    },
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      dt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
             FROM occ WHERE word <> '' GROUP BY 1),
      b AS (SELECT doc_id,
              CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                   WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                   ELSE 256 END AS bucket_cap,
              n, least(n, 256) AS kept
            FROM dt)
      SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(kept) AS BIGINT) AS real_tokens,
        CAST(count(*) * bucket_cap - sum(kept) AS BIGINT) AS pad_tokens,
        ${Numerics.sqlFix(
      "CAST(count(*) * bucket_cap - sum(kept) AS DOUBLE) / " +
        "(count(*) * bucket_cap)", 4)} AS pad_frac,
        CAST(sum(n - kept) AS BIGINT) AS truncated_tokens
      FROM b GROUP BY bucket_cap
      ORDER BY bucket_cap"""))

  // ---- q217: Unicode script histogram ----
  // Multilingual curation beyond stopword langId: per-doc character
  // counts by Unicode SCRIPT + the dominant-script route label.
  // Input synthesized identically in both engines: the ASCII corpus
  // plus deterministic Cyrillic/Han/Arabic suffixes by doc parity.
  // Java \p{IsX} and RE2 \p{X} are the SAME standard-defined classes.

  val q217 = Q(
    "q217_script_histogram",
    (s, dir) => {
      val d = docs(s, dir)
      val mixed = concat(col("text"),
        when(col("doc_id") % 4 === 1, lit(" Привет мир"))
          .when(col("doc_id") % 4 === 2, lit(" 你好世界你好世界你好"))
          .when(col("doc_id") % 4 === 3, lit(" مرحبا بالعالم"))
          .otherwise(lit("")))
      TextAnalysis.scriptHistogram(
          d.select(col("doc_id"), mixed.as("t")), "doc_id", "t")
        .orderBy("doc_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id, text ||
          CASE WHEN doc_id % 4 = 1 THEN ' Привет мир'
               WHEN doc_id % 4 = 2 THEN ' 你好世界你好世界你好'
               WHEN doc_id % 4 = 3 THEN ' مرحبا بالعالم'
               ELSE '' END AS t
        FROM documents),
      c AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '\p{Latin}')) AS BIGINT)
            AS n_latin,
          CAST(len(regexp_extract_all(t, '\p{Cyrillic}')) AS BIGINT)
            AS n_cyrillic,
          CAST(len(regexp_extract_all(t, '\p{Han}')) AS BIGINT) AS n_han,
          CAST(len(regexp_extract_all(t, '\p{Arabic}')) AS BIGINT)
            AS n_arabic,
          CAST(len(regexp_extract_all(t, '[0-9]')) AS BIGINT) AS n_digit
        FROM m)
      SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic, n_digit,
        CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_han
                  AND n_latin >= n_arabic THEN 'latin'
             WHEN n_cyrillic >= n_han AND n_cyrillic >= n_arabic
                  THEN 'cyrillic'
             WHEN n_han >= n_arabic THEN 'han'
             ELSE 'arabic' END AS dominant_script
      FROM c
      ORDER BY doc_id"""))

  // ---- q218: JSON key/type profile ----
  // Schema discovery for a semi-structured column: synthesize varied
  // JSON from documents (keys/types by doc parity — the q208
  // synthesis discipline), then profile keys and value types through
  // a REAL from_json parse. The oracle derives ground truth from the
  // SYNTHESIS RULE itself (parity counts over documents), so the
  // differential catches any parse/classification drift.

  val q218 = Q(
    "q218_json_profile",
    (s, dir) => {
      val d = docs(s, dir)
      val j = concat(
        lit("{\"id\": "), col("doc_id").cast("string"),
        lit(", \"lang\": \"en\""),
        when(col("doc_id") % 2 === 0,
          concat(lit(", \"score\": "),
            (col("doc_id") % 7).cast("string"), lit(".5")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0, lit(", \"flag\": true"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(", \"note\": \"x1\""))
          .otherwise(lit("")),
        lit("}"))
      graft.operators.Profile.jsonKeyProfile(
        d.select(j.as("props")), "props")
    },
    Some("""
      WITH n AS (SELECT CAST(count(*) AS BIGINT) AS total,
                        CAST(count(*) FILTER (WHERE doc_id % 2 = 0)
                          AS BIGINT) AS evens,
                        CAST(count(*) FILTER (WHERE doc_id % 3 = 0)
                          AS BIGINT) AS threes,
                        CAST(count(*) FILTER (WHERE doc_id % 5 = 0)
                          AS BIGINT) AS fives
                 FROM documents)
      SELECT * FROM (
        SELECT 'flag' AS key, threes AS n_present, 0 AS n_int,
               0 AS n_float, threes AS n_bool, 0 AS n_string FROM n
        UNION ALL
        SELECT 'id', total, total, 0, 0, 0 FROM n
        UNION ALL
        SELECT 'lang', total, 0, 0, 0, total FROM n
        UNION ALL
        SELECT 'note', fives, 0, 0, 0, fives FROM n
        UNION ALL
        SELECT 'score', evens, 0, evens, 0, 0 FROM n)
      ORDER BY key"""))

  // ---- q222: nested-path JSON profile ----
  // q218 profiles top-level keys only (its documented trade); real
  // semi-structured columns NEST, and this is the discovery pass over
  // dotted paths: synthesize nested JSON from documents by the parity
  // rule, profile depth-capped paths (maxDepth=2 — meta.geo is
  // counted as an object but NOT descended, demonstrating the cap),
  // and derive the oracle's ground truth from the SYNTHESIS RULE
  // itself, so any parse/descent/classification drift fails the hash.
  // extra.note is a JSON null at depth 2 (n_present only).

  val q222 = Q(
    "q222_json_path_profile",
    (s, dir) => {
      val d = docs(s, dir)
      val j = concat(
        lit("{\"id\": "), col("doc_id").cast("string"),
        lit(", \"meta\": {\"lang\": \"en\", \"src\": \""), col("source"),
        lit("\", \"geo\": {\"cc\": \"US\"}}"),
        when(col("doc_id") % 2 === 0,
          concat(lit(", \"score\": "),
            (col("doc_id") % 7).cast("string"), lit(".5")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0, lit(", \"tags\": [\"a\", \"b\"]"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(", \"extra\": {\"note\": null}"))
          .otherwise(lit("")),
        lit("}"))
      graft.operators.Profile.jsonPathProfile(
        d.select(j.as("props")), "props", maxDepth = 2)
    },
    Some("""
      WITH n AS (SELECT CAST(count(*) AS BIGINT) AS total,
                        CAST(count(*) FILTER (WHERE doc_id % 2 = 0)
                          AS BIGINT) AS evens,
                        CAST(count(*) FILTER (WHERE doc_id % 3 = 0)
                          AS BIGINT) AS threes,
                        CAST(count(*) FILTER (WHERE doc_id % 5 = 0)
                          AS BIGINT) AS fives
                 FROM documents),
      z AS (SELECT CAST(0 AS BIGINT) AS z FROM n)
      SELECT * FROM (
        SELECT 'extra' AS path, CAST(1 AS INTEGER) AS depth,
               fives AS n_present, z.z AS n_int, z.z AS n_float,
               z.z AS n_bool, fives AS n_object, z.z AS n_array,
               z.z AS n_string FROM n, z
        UNION ALL
        SELECT 'extra.note', 2, fives, z, z, z, z, z, z FROM n, z
        UNION ALL
        SELECT 'id', 1, total, total, z, z, z, z, z FROM n, z
        UNION ALL
        SELECT 'meta', 1, total, z, z, z, total, z, z FROM n, z
        UNION ALL
        SELECT 'meta.geo', 2, total, z, z, z, total, z, z FROM n, z
        UNION ALL
        SELECT 'meta.lang', 2, total, z, z, z, z, z, total FROM n, z
        UNION ALL
        SELECT 'meta.src', 2, total, z, z, z, z, z, total FROM n, z
        UNION ALL
        SELECT 'score', 1, evens, z, evens, z, z, z, z FROM n, z
        UNION ALL
        SELECT 'tags', 1, threes, z, z, z, z, threes, z FROM n, z)
      ORDER BY path"""))

  /** BPE 3-merge CTE chain (train + encode + per-doc counts) shared by
    * q205 and q220 — prepend [[wordsCte]]. Yields: occ (word
    * instances), bpe (per-doc BPE token counts), wc (per-doc word
    * counts with source). Replays [[TextAnalysis.bpeTrainMerges]]'
    * decision rule (count DESC, pair tiebreak) and the rank-order
    * non-overlapping replace encode.
    */
  private val bpe3Cte = """
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
             FROM occ WHERE len(word) >= 2 GROUP BY 1),
      x1 AS (SELECT word, freq, unnest(range(1, len(word))) AS i FROM wf),
      p1 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x1 GROUP BY 1),
      b1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      w2 AS (SELECT replace(word, (SELECT pair FROM b1), chr(1)) AS word,
                    freq
             FROM wf),
      x2 AS (SELECT word, freq, unnest(range(1, len(word))) AS i
             FROM w2 WHERE len(word) >= 2),
      p2 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x2 GROUP BY 1),
      b2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
      w3 AS (SELECT replace(word, (SELECT pair FROM b2), chr(2)) AS word,
                    freq
             FROM w2),
      x3 AS (SELECT word, freq, unnest(range(1, len(word))) AS i
             FROM w3 WHERE len(word) >= 2),
      p3 AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM x3 GROUP BY 1),
      b3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
      enc AS (SELECT doc_id,
                replace(replace(replace(word,
                  (SELECT pair FROM b1), chr(1)),
                  (SELECT pair FROM b2), chr(2)),
                  (SELECT pair FROM b3), chr(3)) AS wenc
              FROM occ WHERE word <> ''),
      bpe AS (SELECT doc_id, CAST(sum(len(wenc)) AS BIGINT) AS n_bpe
              FROM enc GROUP BY 1),
      wc AS (SELECT o.doc_id, d.source,
                    CAST(count(*) AS BIGINT) AS n_words
             FROM occ o JOIN documents d ON d.doc_id = o.doc_id
             WHERE o.word <> '' GROUP BY 1, 2)"""

  // ---- q205: tokenizer fertility audit ----
  // The tokenizer-selection readout: per source, BPE tokens per
  // whitespace word under the corpus-trained 3-merge table (fertility
  // < 1 means merges span whole words; the metric pricing a tokenizer
  // swap's context-budget impact). Integer token/word counts, one
  // fix4 division per source; oracle replays train + encode (q188's
  // derivation) and the word counts.

  val q205 = Q(
    "q205_tokenizer_fertility",
    (s, dir) => {
      val d = docs(s, dir)
      val merges = TextAnalysis.bpeTrainMerges(d, "text", iters = 3)
      val toks = TextAnalysis.bpeEncode(d, "doc_id", "text", merges.map(_._1))
        .groupBy("doc_id").agg(count(lit(1)).as("n_bpe"))
      val words = d.select(col("doc_id"), col("source"),
        explode(graft.functions.Texts.words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("doc_id", "source").agg(count(lit(1)).as("n_words"))
      words.join(toks, "doc_id")
        .groupBy("source")
        .agg(
          sum(col("n_words")).as("n_words"),
          sum(col("n_bpe")).as("n_bpe"))
        .select(col("source"), col("n_words"), col("n_bpe"),
          Numerics.fix4(
            col("n_bpe").cast("double") / col("n_words"))
            .as("fertility"))
        .orderBy("source")
    },
    Some(s"""
      WITH $wordsCte,
      $bpe3Cte
      SELECT wc.source, CAST(sum(wc.n_words) AS BIGINT) AS n_words,
             CAST(sum(bpe.n_bpe) AS BIGINT) AS n_bpe,
             ${Numerics.sqlFix(
      "CAST(sum(bpe.n_bpe) AS DOUBLE) / sum(wc.n_words)", 4)} AS fertility
      FROM wc JOIN bpe ON bpe.doc_id = wc.doc_id
      GROUP BY 1 ORDER BY wc.source"""))

  // ---- q226: WordPiece merge induction (likelihood-score trainer) ----
  // The trainer half of tokenizer family #2 (q220 encodes a PLANTED
  // vocab; this INDUCES one), completing the train+encode symmetry
  // BPE has (q128/q188). The WordPiece decision rule — merge argmax of
  // count(ab)/(count(a)*count(b)) — is a RATIONAL argmax, so the
  // oracle replays it with exact HUGEINT cross-products in a
  // NOT-EXISTS (pc_o*ca_t*cb_t > pc_t*ca_o*cb_o), never a float
  // score; Spark compares the same products in BigInt on the
  // vocabulary-grain count tables. Score ties break by pair asc.

  /** One oracle iteration: pair counts, unit counts, exact rational
    * argmax over `src`'s (word, freq) table.
    */
  private def wpTrainIterCte(i: Int, src: String): String = s"""
      x$i AS (SELECT word, freq, unnest(range(1, len(word))) AS i
              FROM $src),
      p$i AS (SELECT substr(word, CAST(i AS INT), 2) AS pair,
                     CAST(sum(freq) AS BIGINT) AS cnt
              FROM x$i GROUP BY 1),
      y$i AS (SELECT word, freq, unnest(range(1, len(word) + 1)) AS i
              FROM $src),
      u$i AS (SELECT substr(word, CAST(i AS INT), 1) AS u,
                     CAST(sum(freq) AS BIGINT) AS cnt
              FROM y$i GROUP BY 1),
      s$i AS (SELECT p.pair, p.cnt AS pc, a.cnt AS ca, b.cnt AS cb
              FROM p$i p
              JOIN u$i a ON a.u = substr(p.pair, 1, 1)
              JOIN u$i b ON b.u = substr(p.pair, 2, 1)),
      b$i AS (SELECT pair, pc, ca, cb FROM s$i t
              WHERE NOT EXISTS (SELECT 1 FROM s$i o WHERE
                    CAST(o.pc AS HUGEINT) * t.ca * t.cb
                      > CAST(t.pc AS HUGEINT) * o.ca * o.cb
                 OR (CAST(o.pc AS HUGEINT) * t.ca * t.cb
                      = CAST(t.pc AS HUGEINT) * o.ca * o.cb
                     AND o.pair < t.pair)))"""

  val q226 = Q(
    "q226_wordpiece_train",
    (s, dir) =>
      TextAnalysis.wordPieceTrainSteps(docs(s, dir), "text", iters = 3),
    Some(s"""
      WITH $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
             FROM occ WHERE len(word) >= 2 GROUP BY 1),
      ${wpTrainIterCte(1, "wf")},
      w2 AS (SELECT replace(word, (SELECT pair FROM b1), chr(1)) AS word,
                    freq FROM wf),
      ${wpTrainIterCte(2, "w2")},
      w3 AS (SELECT replace(word, (SELECT pair FROM b2), chr(2)) AS word,
                    freq FROM w2),
      ${wpTrainIterCte(3, "w3")}
      SELECT * FROM (
        SELECT 1 AS iter, (SELECT pair FROM b1) AS piece,
               (SELECT pc FROM b1) AS pair_count,
               (SELECT ca FROM b1) AS left_count,
               (SELECT cb FROM b1) AS right_count
        UNION ALL
        SELECT 2,
               replace((SELECT pair FROM b2), chr(1),
                 (SELECT pair FROM b1)),
               (SELECT pc FROM b2), (SELECT ca FROM b2),
               (SELECT cb FROM b2)
        UNION ALL
        SELECT 3,
               replace(replace((SELECT pair FROM b3), chr(1),
                   (SELECT pair FROM b1)),
                 chr(2),
                 replace((SELECT pair FROM b2), chr(1),
                   (SELECT pair FROM b1))),
               (SELECT pc FROM b3), (SELECT ca FROM b3),
               (SELECT cb FROM b3))
      ORDER BY iter"""))

  // ---- q228: end-to-end tokenizer lifecycle (train -> encode) ----
  // The full WordPiece lifecycle cross-engine: induce 2 merges by the
  // likelihood rule (q226's trainer), build the vocabulary (a-z
  // singles + trained pieces, each in initial AND continuation form —
  // the positionless-training contract), encode the corpus by greedy
  // longest-match (q220's kernel), report fertility per source. The
  // oracle replays BOTH halves — HUGEINT rational argmax, then the
  // per-position longest-match walk — so a drift anywhere in the
  // train->vocab->encode chain fails the hash.

  val q228 = Q(
    "q228_tokenizer_e2e",
    (s, dir) => {
      val d = docs(s, dir)
      val steps = TextAnalysis.wordPieceTrainSteps(d, "text", iters = 2)
        .collect().map(_.getString(1)).toSeq
      val singles = ('a' to 'z').map(_.toString)
      val vocab = singles ++ singles.map("##" + _) ++
        steps ++ steps.map("##" + _)
      graft.GraftFunctions.register(s)
      d.select(col("source"),
          explode(graft.functions.Texts.words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .select(col("source"),
          size(graft.GraftFunctions.wordPiece(col("w"), vocab))
            .cast("long").as("n_pieces"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_tokens"))
        .select(col("source"), col("n_words"), col("n_tokens"),
          Numerics.fix4(
            col("n_tokens").cast("double") / col("n_words"))
            .as("fertility"))
        .orderBy("source")
    },
    Some(s"""
      WITH RECURSIVE $wordsCte,
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
             FROM occ WHERE len(word) >= 2 GROUP BY 1),
      ${wpTrainIterCte(1, "wf")},
      w2 AS (SELECT replace(word, (SELECT pair FROM b1), chr(1)) AS word,
                    freq FROM wf),
      ${wpTrainIterCte(2, "w2")},
      voc AS (
        SELECT DISTINCT content, cont FROM (
          SELECT chr(96 + CAST(i AS INT)) AS content, false AS cont
          FROM (SELECT unnest(range(1, 27)) AS i)
          UNION ALL
          SELECT chr(96 + CAST(i AS INT)), true
          FROM (SELECT unnest(range(1, 27)) AS i)
          UNION ALL SELECT (SELECT pair FROM b1), false
          UNION ALL SELECT (SELECT pair FROM b1), true
          UNION ALL SELECT replace((SELECT pair FROM b2), chr(1),
            (SELECT pair FROM b1)), false
          UNION ALL SELECT replace((SELECT pair FROM b2), chr(1),
            (SELECT pair FROM b1)), true)),
      dw AS (SELECT DISTINCT word FROM occ WHERE word <> ''),
      wpos AS (SELECT word, unnest(range(1, len(word) + 1)) AS pos
               FROM dw),
      mstep AS (SELECT wpos.word, wpos.pos,
                       CAST(max(len(v.content)) AS BIGINT) AS step
                FROM wpos JOIN voc v
                  ON v.cont = (wpos.pos > 1)
                 AND substr(wpos.word, CAST(wpos.pos AS INT),
                       CAST(len(v.content) AS INT)) = v.content
                GROUP BY 1, 2),
      walk(word, pos, nsteps) AS (
        SELECT word, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM dw
        UNION ALL
        SELECT k.word, k.pos + m.step, k.nsteps + 1
        FROM walk k JOIN mstep m ON m.word = k.word AND m.pos = k.pos),
      wdone AS (SELECT word, max(CASE WHEN pos = len(word) + 1
                                      THEN nsteps END) AS n_done
                FROM walk GROUP BY 1),
      wpn AS (SELECT word, COALESCE(n_done, 1) AS n_pieces FROM wdone)
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(p.n_pieces) AS BIGINT) AS n_tokens,
             ${Numerics.sqlFix(
      "CAST(sum(p.n_pieces) AS DOUBLE) / count(*)", 4)} AS fertility
      FROM occ o
      JOIN wpn p ON p.word = o.word
      JOIN documents d ON d.doc_id = o.doc_id
      WHERE o.word <> ''
      GROUP BY 1
      ORDER BY d.source"""))

  // ---- q220: two-family tokenizer fertility (BPE vs WordPiece) ----
  // q205 can only price BPE against itself; this is the tokenizer-SWAP
  // readout the fertility audit exists for: the same corpus encoded by
  // the corpus-trained 3-merge BPE AND a planted WordPiece vocabulary
  // (greedy longest-match, the BERT-family rule), fertility keyed by
  // (tokenizer, source). The WordPiece kernel is the codegen'd
  // graft_wordpiece expression; the oracle replays the SAME rule by a
  // different strategy — per-position longest-match table + a
  // recursive-CTE walk at DISTINCT-word grain — so the gate is a true
  // cross-engine differential of the algorithm, not a replay of the
  // implementation.

  /** Planted WordPiece vocabulary: every lowercase letter as initial
    * AND continuation piece (so no corpus word UNKs — the spec covers
    * UNK), plus multi-char pieces over the corpus' character
    * distribution so the greedy rule takes non-trivial steps.
    */
  val wpVocab: Seq[String] = {
    val singles = ('a' to 'z').map(_.toString)
    singles ++ singles.map("##" + _) ++ Seq(
      "sc", "##an", "ta", "##ble", "val", "##ue", "the", "wind",
      "##ow", "qu", "##ery", "fa", "##st", "co", "##lumn", "jo",
      "##in", "str", "##eam", "##er", "##ey", "##rt", "gr", "##oup")
  }

  val q220 = Q(
    "q220_tokenizer_families",
    (s, dir) => {
      val d = docs(s, dir)
      val merges = TextAnalysis.bpeTrainMerges(d, "text", iters = 3)
      val bpeToks = TextAnalysis
        .bpeEncode(d, "doc_id", "text", merges.map(_._1))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      val words = d.select(col("doc_id"), col("source"),
          explode(graft.functions.Texts.words(col("text"))).as("w"))
        .where(col("w") =!= "")
      val bpeSrc = words.groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_w"))
        .join(bpeToks, "doc_id")
        .groupBy("source")
        .agg(sum(col("n_w")).as("n_words"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("tokenizer", lit("bpe"))
      graft.GraftFunctions.register(s)
      val wpSrc = words
        .select(col("source"),
          size(graft.GraftFunctions.wordPiece(col("w"), wpVocab))
            .cast("long").as("n_pieces"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_tokens"))
        .withColumn("tokenizer", lit("wordpiece"))
      bpeSrc.unionByName(wpSrc)
        .select(col("tokenizer"), col("source"), col("n_words"),
          col("n_tokens"),
          Numerics.fix4(
            col("n_tokens").cast("double") / col("n_words"))
            .as("fertility"))
        .orderBy("tokenizer", "source")
    },
    Some(s"""
      WITH RECURSIVE $wordsCte,
      $bpe3Cte,
      voc AS (SELECT DISTINCT
                CASE WHEN piece LIKE '##%' AND len(piece) > 2
                     THEN substr(piece, 3) ELSE piece END AS content,
                (piece LIKE '##%' AND len(piece) > 2) AS cont
              FROM (VALUES ${wpVocab.map(p => s"('$p')").mkString(", ")})
                AS vt(piece)),
      dw AS (SELECT DISTINCT word FROM occ WHERE word <> ''),
      wpos AS (SELECT word, unnest(range(1, len(word) + 1)) AS pos
               FROM dw),
      mstep AS (SELECT wpos.word, wpos.pos,
                       CAST(max(len(v.content)) AS BIGINT) AS step
                FROM wpos JOIN voc v
                  ON v.cont = (wpos.pos > 1)
                 AND substr(wpos.word, CAST(wpos.pos AS INT),
                       CAST(len(v.content) AS INT)) = v.content
                GROUP BY 1, 2),
      walk(word, pos, nsteps) AS (
        SELECT word, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM dw
        UNION ALL
        SELECT k.word, k.pos + m.step, k.nsteps + 1
        FROM walk k JOIN mstep m ON m.word = k.word AND m.pos = k.pos),
      wdone AS (SELECT word, max(CASE WHEN pos = len(word) + 1
                                      THEN nsteps END) AS n_done
                FROM walk GROUP BY 1),
      wpn AS (SELECT word, COALESCE(n_done, 1) AS n_pieces FROM wdone),
      wpsrc AS (SELECT d.source,
                       CAST(count(*) AS BIGINT) AS n_words,
                       CAST(sum(p.n_pieces) AS BIGINT) AS n_tokens
                FROM occ o
                JOIN wpn p ON p.word = o.word
                JOIN documents d ON d.doc_id = o.doc_id
                WHERE o.word <> ''
                GROUP BY 1),
      bpesrc AS (SELECT wc.source,
                        CAST(sum(wc.n_words) AS BIGINT) AS n_words,
                        CAST(sum(bpe.n_bpe) AS BIGINT) AS n_tokens
                 FROM wc JOIN bpe ON bpe.doc_id = wc.doc_id
                 GROUP BY 1)
      SELECT * FROM (
        SELECT 'bpe' AS tokenizer, source, n_words, n_tokens,
               ${Numerics.sqlFix(
      "CAST(n_tokens AS DOUBLE) / n_words", 4)} AS fertility
        FROM bpesrc
        UNION ALL
        SELECT 'wordpiece', source, n_words, n_tokens,
               ${Numerics.sqlFix(
      "CAST(n_tokens AS DOUBLE) / n_words", 4)}
        FROM wpsrc)
      ORDER BY tokenizer, source"""))

  // ---- q237: end-to-end crawl curation pipeline ----
  // The composition every other row is a piece of, run as ONE flow on
  // real container formats: WARC shards in (incl. a shard that REPLAYS
  // ten documents — the crawl-recrawl duplication), HTTP-response
  // filter, byte-length quality gate, exact dedup at the engine's
  // digest convention, curated gzip-JSONL out through the engine's own
  // sink, then read BACK from the JSONL as the graded result — so the
  // gate hashes the pipeline's persisted product, not an intermediate.
  // The oracle replays every stage from the documents table. 100 TB:
  // ingest is file-grain (no shuffle), the dedup aggregate is the one
  // shuffle, the JSONL write is partition-parallel — the whole
  // pipeline moves each byte through exactly one exchange.

  val q237 = Q(
    "q237_crawl_curation_pipeline",
    (s, dir) => {
      import graft.sources.{Jsonl, Warc, WarcFixture => WFx}
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val fixture = docs(s, dir)
        .where(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1)
      def resp(d: (Long, String)): Array[Byte] =
        WFx.response(s"http://example.com/doc/${d._1}", 200,
          d._2.getBytes(utf8))
      val t = Scratch.dir(s, "q237_warc_")
      (0 until 3).foreach { k =>
        val part = fixture.filter(d => d._1 >= k * 20 && d._1 < (k + 1) * 20)
        graft.ScratchSpace.writeBytes(s, t, s"w$k.warc.gz",
          WFx.gzMembers(part.map(resp).toSeq))
      }
      // the recrawl shard: docs 0-9 again under refetch URIs
      graft.ScratchSpace.writeBytes(s, t, "w3.warc.gz",
        WFx.gzMembers(fixture.filter(_._1 < 10).map { d =>
          WFx.response(s"http://mirror.example.com/doc/${d._1}", 200,
            d._2.getBytes(utf8))
        }.toSeq))
      val texts = Warc.readDir(s, t)
        .where(col("warc_type") === "response" && col("http_status") === 200)
        .select(
          regexp_extract(col("target_uri"), "doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("payload").cast("string").as("text"),
          col("payload_len"))
        .where(col("payload_len") >= 50) // byte-length quality gate
      val curated = texts
        .groupBy(Dedup.contentDigest(col("text")).as("digest"))
        .agg(
          min(col("doc_id")).as("doc_id"),
          min(col("text")).as("text"),
          count(lit(1)).as("n_copies"))
        .select("doc_id", "text", "n_copies")
      val out = Scratch.dir(s, "q237_jsonl_")
      Jsonl.write(curated, out, gzip = true)
      val (good, bad) = Jsonl.split(Jsonl.readDir(s, out, StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("n_copies", LongType))), glob = "part-*"))
      val nBad = bad.count()
      require(nBad == 0, s"curated JSONL produced $nBad corrupt lines")
      good.select(
          col("doc_id"), col("n_copies"),
          md5(col("text")).as("txt_md5"),
          length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60),
      fed AS (
        SELECT doc_id, text FROM t
        UNION ALL
        SELECT doc_id, text FROM t WHERE doc_id < 10),
      f AS (SELECT * FROM fed WHERE strlen(text) >= 50),
      g AS (
        SELECT md5(lower(trim(text))) AS digest,
               CAST(min(doc_id) AS BIGINT) AS doc_id,
               min(text) AS text,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM f GROUP BY 1)
      SELECT doc_id, n_copies, md5(text) AS txt_md5,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM g ORDER BY doc_id"""))

  // ---- q242: MP3 frame index ----
  // The audio twin of q207's MP4 keyframe walk: per-frame byte ranges
  // + header fields from back-to-back MPEG-audio frame headers (the
  // public layer length formulas), ID3v2 preamble skipped, ID3v1
  // trailer tolerated, VBR indexed naturally since every frame
  // carries its own bitrate. Any mid-stream violation declines the
  // whole file — heuristic resync output is not something an
  // exactness gate should bless. Fixtures via the Mp3 encoder twin;
  // every oracle value is analytic.

  val q242 = Q(
    "q242_mp3_frame_index",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.Mp3
      import graft.multimodal.Mp3.FrameSpec
      val mdir = Scratch.dir(s, "q242_mp3_")
      val vbr = Mp3.file(Seq(
        FrameSpec(3, 1, 9, 0), FrameSpec(3, 1, 5, 0),
        FrameSpec(3, 1, 10, 0)))
      Seq(
        // CBR with ID3v2 preamble + ID3v1 trailer
        "fr_1.mp3" -> Mp3.file(Seq(
          FrameSpec(3, 1, 9, 0), FrameSpec(3, 1, 9, 0, pad = 1),
          FrameSpec(3, 1, 9, 0)), id3v2Pad = 20, id3v1 = true),
        // VBR: per-frame bitrates
        "fr_2.mp3" -> vbr,
        // MPEG2.5 Layer 3 mono telephony rate
        "fr_3.mp3" -> Mp3.file(Seq(
          FrameSpec(0, 1, 5, 2, mono = true),
          FrameSpec(0, 1, 5, 2, mono = true))),
        // MPEG1 Layer 1
        "fr_4.mp3" -> Mp3.file(Seq(FrameSpec(3, 3, 4, 1))),
        // truncated mid-frame -> decline row
        "fr_5.mp3" -> vbr.dropRight(100),
        // MPEG1 Layer 2
        "fr_6.mp3" -> Mp3.file(Seq(FrameSpec(3, 2, 8, 0)))
      ).foreach { case (name, bs) =>
        graft.ScratchSpace.writeBytes(s, mdir, name, bs)
      }
      Multimodal.mp3FrameIndex(
          Multimodal.readBinaryDir(s, mdir, idFromPath = Multimodal.digitId)
            .as[graft.multimodal.MediaRecord])
        .orderBy("doc_id", "frame_no")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(1 AS INTEGER), CAST(30 AS BIGINT),
         CAST(417 AS BIGINT), CAST(128 AS INTEGER),
         CAST(44100 AS INTEGER), CAST(1152 AS INTEGER)),
        (1, 2, 447, 418, 128, 44100, 1152),
        (1, 3, 865, 417, 128, 44100, 1152),
        (2, 1, 0, 417, 128, 44100, 1152),
        (2, 2, 417, 208, 64, 44100, 1152),
        (2, 3, 625, 522, 160, 44100, 1152),
        (3, 1, 0, 360, 40, 8000, 576),
        (3, 2, 360, 360, 40, 8000, 576),
        (4, 1, 0, 128, 128, 48000, 384),
        (5, NULL, NULL, NULL, NULL, NULL, NULL),
        (6, 1, 0, 417, 128, 44100, 1152))
        AS t(doc_id, frame_no, byte_offset, byte_size, kbps,
             sample_rate, samples)
      ORDER BY doc_id, frame_no NULLS FIRST"""))

  // ---- q243: exact audio resample ----
  // Sample-rate normalization with NO float anywhere: output frame j
  // sits at source position j·src/dst, and each emitted value is the
  // exact integer numerator s[i]·(dst−r) + s[i+1]·r over denominator
  // dst — so the oracle replays the interpolation arithmetic itself.
  // Fixtures: int16 mono upsample 8000→12000 (hand-checked midpoints),
  // 16-bit stereo downsample 44100→8000 (both channels interpolate at
  // the same rational position), µ-law telephony upsample through the
  // G.711 expansion, and a truncated file's decline row.

  val q243 = Q(
    "q243_audio_resample",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.Wav
      val mdir = Scratch.dir(s, "q243_rs_")
      graft.ScratchSpace.writeBytes(s, mdir, "rs_1.wav",
        Wav.encode(8000, 1, 16, Array(0, 300, -600, 900)))
      graft.ScratchSpace.writeBytes(s, mdir, "rs_2.wav",
        Wav.encode(44100, 2, 16,
          (0 until 12).flatMap(k => Seq(10 * (k + 1), -10 * (k + 1)))
            .toArray))
      graft.ScratchSpace.writeBytes(s, mdir, "rs_3.wav",
        Wav.encodeG711(8000, 1, aLaw = false, Array(0xFF, 0x80, 0x00)))
      graft.ScratchSpace.writeBytes(s, mdir, "rs_4.wav",
        Wav.encode(8000, 1, 16, Array(1, 2, 3)).dropRight(3))
      val recs = Multimodal.readBinaryDir(s, mdir,
        idFromPath = Multimodal.digitId)
        .as[graft.multimodal.MediaRecord]
      // per-file target rates exercised by splitting the directory:
      // docs 1/2 -> 12000/8000, doc 3 -> 16000, doc 4 declines anywhere
      Multimodal.audioResample(recs.filter(col("doc_id") === 1), 12000)
        .unionAll(Multimodal.audioResample(
          recs.filter(col("doc_id") === 2), 8000))
        .unionAll(Multimodal.audioResample(
          recs.filter(col("doc_id").isin(3, 4)), 16000))
        .orderBy("doc_id", "out_idx", "ch")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(0 AS INTEGER), CAST(0 AS INTEGER),
         CAST(0 AS BIGINT), CAST(12000 AS BIGINT)),
        (1, 1, 0, 2400000, 12000),
        (1, 2, 0, 0, 12000),
        (1, 3, 0, -7200000, 12000),
        (1, 4, 0, 4800000, 12000),
        (2, 0, 0, 80000, 8000),
        (2, 0, 1, -80000, 8000),
        (2, 1, 0, 521000, 8000),
        (2, 1, 1, -521000, 8000),
        (3, 0, 0, 0, 16000),
        (3, 1, 0, 256992000, 16000),
        (3, 2, 0, 513984000, 16000),
        (3, 3, 0, 0, 16000),
        (3, 4, 0, -513984000, 16000),
        (4, NULL, NULL, NULL, NULL))
        AS t(doc_id, out_idx, ch, num, denom)
      ORDER BY doc_id, out_idx NULLS FIRST, ch"""))

  // ---- q244: image augmentation (flip + crop) ----
  // The vision-training preprocessing pair with exact integer
  // evidence: flips are pixel permutations (whole-image sums
  // invariant), so every gated call pairs a flip with an OFF-CENTER
  // crop — the left-crop of a mirrored image must equal the original's
  // mirrored right columns, which the analytic oracle sums directly.
  // A too-small-for-the-box image and a corrupt file each emit one
  // null row (a clamped crop would be a different augmentation than
  // the one asked for — decline, never clamp).

  val q244 = Q(
    "q244_image_augment",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.PngEncoder
      val mdir = Scratch.dir(s, "q244_aug_")
      // 4x3 RGB raster: R=10x+y, G=100+x, B=200-y
      val samples = (for (y <- 0 until 3; x <- 0 until 4)
        yield Seq((10 * x + y).toByte, (100 + x).toByte,
          (200 - y).toByte)).flatten.toArray
      val png = PngEncoder.encode(4, 3, 2, samples)
      graft.ScratchSpace.writeBytes(s, mdir, "ag_1.png", png)
      graft.ScratchSpace.writeBytes(s, mdir, "ag_2.png", png)
      graft.ScratchSpace.writeBytes(s, mdir, "ag_3.png", png)
      graft.ScratchSpace.writeBytes(s, mdir, "ag_4.png",
        PngEncoder.encode(2, 1, 2, Array[Byte](1, 2, 3, 4, 5, 6)))
      graft.ScratchSpace.writeBytes(s, mdir, "ag_5.png",
        "not a png".getBytes("US-ASCII"))
      val recs = Multimodal.readBinaryDir(s, mdir,
        idFromPath = Multimodal.digitId)
        .as[graft.multimodal.MediaRecord]
      Multimodal.augmentPixelStats(
          recs.filter(col("doc_id").isin(1, 4, 5)),
          flipHorizontal = true, cropBox = Some((0, 0, 2, 3)))
        .unionAll(Multimodal.augmentPixelStats(
          recs.filter(col("doc_id") === 2),
          flipVertical = true, cropBox = Some((0, 0, 4, 1))))
        .unionAll(Multimodal.augmentPixelStats(
          recs.filter(col("doc_id") === 3),
          cropBox = Some((1, 1, 2, 2))))
        .orderBy("doc_id")
    },
    Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(2 AS INTEGER), CAST(3 AS INTEGER),
         CAST(156 AS BIGINT), CAST(615 AS BIGINT), CAST(1194 AS BIGINT)),
        (2, 4, 1, 68, 406, 792),
        (3, 2, 2, 66, 406, 794),
        (4, NULL, NULL, NULL, NULL, NULL),
        (5, NULL, NULL, NULL, NULL, NULL))
        AS t(doc_id, out_w, out_h, sum_r, sum_g, sum_b)
      ORDER BY doc_id"""))

  // ---- q249: unigram-LM (SentencePiece-style) tokenization ----
  // The THIRD tokenizer family (BPE q128/q188, WordPiece q220/q226):
  // Viterbi minimum-cost segmentation over a (token -> integer cost)
  // vocabulary with single-char fallback — integer costs on a fixed
  // grid so the optimum is exact, and the K-packed dp makes (cost,
  // token count) one minimization where path ties cannot change the
  // value. The oracle is a TRUE algorithm differential: DuckDB
  // replays the dp as a recursive CTE carrying the dp vector as a
  // LIST with a per-position comprehension over the vocab map — a
  // different evaluation strategy than the Spark typed pass.

  private val unigramVocab: Seq[(String, Long)] = Seq(
    " " -> 5L, "the" -> 10L, "ing" -> 12L, "and" -> 11L, "er" -> 14L,
    "in" -> 9L, "re" -> 14L, "tion" -> 18L, "ed" -> 13L, "es" -> 13L,
    "at" -> 13L, "on" -> 12L, "or" -> 14L, "en" -> 13L, "of" -> 11L,
    "to" -> 12L, "it" -> 13L)

  // ---- q255: unigram-LM trainer (Viterbi-EM), train → encode ----
  // Closes tokenizer family #3's train+encode symmetry (BPE q128/q188
  // and WordPiece q226/q228 already have it): seed vocab from
  // corpus-weighted substring counts (all chars + top-20 multi-char,
  // ties by token asc), two hard-EM rounds — Viterbi-segment every
  // DISTINCT word, deterministic dp-equality backtrack (smallest
  // matching length, vocab before fallback), recount, re-price on the
  // fix-grid −ln(count/total)·10⁴ — then ENCODE docs with the trained
  // costs. The oracle replays the ENTIRE lifecycle in SQL: seeding,
  // both EM rounds (recursive dp LIST per word + a backtrack walk
  // whose steps re-derive their tokens from the dp equality), and the
  // q249-style encode dp; vocab_size/vocab_cost_sum pin the trained
  // artifact itself, the per-source encode totals pin what it does.
  // Heavy reused CTEs are MATERIALIZED — without it DuckDB re-inlines
  // the recursive upstream per reference and the plan goes
  // exponential.

  /** One EM round's oracle CTEs: vocab v{prev} → v{r}. */
  private def unigramEmRoundCte(r: Int, prev: Int): String = s"""
      vm$prev AS (SELECT map_from_entries(list((tok, cost))) AS m
                  FROM v$prev),
      dp$r(word, pos, dps) AS (
        SELECT word, 0, [CAST(0 AS BIGINT)] FROM wf
        UNION ALL
        SELECT word, pos + 1, list_append(dps, least(
            coalesce(list_min(
              [dps[j + 1] + 1000000 * m[substr(word, j + 1, pos + 1 - j)][1] + 1
               for j in range(greatest(0, pos - 3), pos + 1)
               if m[substr(word, j + 1, pos + 1 - j)][1] IS NOT NULL]),
              9223372036854775807),
            dps[pos + 1] + 100000000001))
        FROM dp$r, vm$prev WHERE pos < len(word)),
      dpw$r AS MATERIALIZED (
        SELECT word, dps FROM dp$r WHERE pos = len(word)),
      walk$r(word, pos) AS (
        SELECT word, CAST(len(word) AS BIGINT) FROM wf
        UNION ALL
        SELECT k.word, k.pos - coalesce(list_min(
            [l for l in range(1, least(4, k.pos) + 1)
             if m[substr(k.word, CAST(k.pos - l + 1 AS INT), CAST(l AS INT))][1] IS NOT NULL
                AND d.dps[CAST(k.pos - l + 1 AS INT)]
                    + 1000000 * m[substr(k.word, CAST(k.pos - l + 1 AS INT), CAST(l AS INT))][1] + 1
                    = d.dps[CAST(k.pos + 1 AS INT)]]), 1)
        FROM walk$r k JOIN dpw$r d USING (word), vm$prev
        WHERE k.pos > 0),
      steps$r AS MATERIALIZED (
        SELECT w1.word, w1.pos AS hi,
               (SELECT max(w2.pos) FROM walk$r w2
                WHERE w2.word = w1.word AND w2.pos < w1.pos) AS lo
        FROM walk$r w1 WHERE w1.pos > 0),
      uses$r AS MATERIALIZED (
        SELECT s.word,
               substr(s.word, CAST(s.lo + 1 AS INT),
                 CAST(s.hi - s.lo AS INT)) AS tok,
               CAST(count(*) AS BIGINT) AS uses
        FROM steps$r s JOIN dpw$r d USING (word), vm$prev
        WHERE m[substr(s.word, CAST(s.lo + 1 AS INT),
                CAST(s.hi - s.lo AS INT))][1] IS NOT NULL
          AND d.dps[CAST(s.lo + 1 AS INT)]
              + 1000000 * m[substr(s.word, CAST(s.lo + 1 AS INT),
                  CAST(s.hi - s.lo AS INT))][1] + 1
              = d.dps[CAST(s.hi + 1 AS INT)]
        GROUP BY 1, 2),
      cnt$r AS MATERIALIZED (
        SELECT u.tok, CAST(sum(u.uses * f.freq) AS BIGINT) AS cnt
        FROM uses$r u JOIN wf f USING (word) GROUP BY 1),
      c$r AS MATERIALIZED (
        SELECT c.tok, GREATEST(1, coalesce(k.cnt, 0)) AS cnt
        FROM cc c LEFT JOIN cnt$r k USING (tok)
        UNION ALL
        SELECT tok, cnt FROM cnt$r WHERE len(tok) >= 2),
      v$r AS MATERIALIZED (
        SELECT tok, LEAST(100000, GREATEST(1,
          CAST(floor(-ln(CAST(cnt AS DOUBLE) /
            (SELECT sum(cnt) FROM c$r)) * 10000 + 0.5) AS BIGINT))) AS cost
        FROM c$r)"""

  val q255 = Q(
    "q255_unigram_train",
    (s, dir) => {
      val d = docs(s, dir)
      val vocab = TextAnalysis.unigramTrain(d, "text").toMap
      TextAnalysis.unigramEncode(
          d.where(col("doc_id") < 100),
          "doc_id", "text", vocab, unkCost = 100000L)
        .join(d.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("total_cost")).as("total_cost"),
          sum(col("n_tokens")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("total_cost"),
          col("n_tokens"),
          lit(vocab.size.toLong).as("vocab_size"),
          lit(vocab.values.sum).as("vocab_cost_sum"))
        .orderBy("source")
    },
    Some(s"""
      WITH RECURSIVE
      w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+')
              AS ws FROM documents),
      occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
      wf AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM occ WHERE word <> '' GROUP BY 1),
      cc AS MATERIALIZED (
        SELECT substr(word, CAST(i AS INT), 1) AS tok,
               CAST(sum(freq) AS BIGINT) AS cnt
        FROM wf, unnest(range(1, len(word) + 1)) AS t(i) GROUP BY 1),
      mc AS MATERIALIZED (
        SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS tok,
               CAST(sum(freq) AS BIGINT) AS cnt
        FROM wf, unnest(range(2, 5)) AS tl(l),
             unnest(range(1, len(word) + 1)) AS tp(i)
        WHERE i + l - 1 <= len(word) GROUP BY 1),
      seedm AS MATERIALIZED (
        SELECT tok, cnt FROM mc ORDER BY cnt DESC, tok ASC LIMIT 20),
      c0 AS MATERIALIZED (
        SELECT tok, cnt FROM cc UNION ALL SELECT tok, cnt FROM seedm),
      v0 AS MATERIALIZED (
        SELECT tok, LEAST(100000, GREATEST(1,
          CAST(floor(-ln(CAST(cnt AS DOUBLE) /
            (SELECT sum(cnt) FROM c0)) * 10000 + 0.5) AS BIGINT))) AS cost
        FROM c0),
      ${unigramEmRoundCte(1, 0)},
      ${unigramEmRoundCte(2, 1)},
      d3 AS MATERIALIZED (
        SELECT doc_id, lower(trim(text)) AS s
        FROM documents WHERE doc_id < 100),
      vmf AS (SELECT map_from_entries(list((tok, cost))) AS m FROM v2),
      dpe(doc_id, s, pos, dps) AS (
        SELECT doc_id, s, 0, [CAST(0 AS BIGINT)] FROM d3
        UNION ALL
        SELECT doc_id, s, pos + 1, list_append(dps, least(
            coalesce(list_min(
              [dps[j + 1] + 1000000 * m[substr(s, j + 1, pos + 1 - j)][1] + 1
               for j in range(greatest(0, pos - 3), pos + 1)
               if m[substr(s, j + 1, pos + 1 - j)][1] IS NOT NULL]),
              9223372036854775807),
            dps[pos + 1] + 100000000001))
        FROM dpe, vmf WHERE pos < strlen(s)),
      enc AS MATERIALIZED (
        SELECT doc_id, dps[-1] // 1000000 AS total_cost,
               dps[-1] % 1000000 AS n_tokens
        FROM dpe WHERE pos = strlen(s))
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(e.total_cost) AS BIGINT) AS total_cost,
             CAST(sum(e.n_tokens) AS BIGINT) AS n_tokens,
             (SELECT CAST(count(*) AS BIGINT) FROM v2) AS vocab_size,
             (SELECT CAST(sum(cost) AS BIGINT) FROM v2) AS vocab_cost_sum
      FROM enc e JOIN documents d USING (doc_id)
      GROUP BY 1 ORDER BY 1"""))

  val q249 = Q(
    "q249_unigram_encode",
    (s, dir) =>
      TextAnalysis.unigramEncode(
          docs(s, dir).where(col("doc_id") < 100),
          "doc_id", "text", unigramVocab.toMap, unkCost = 35L)
        .orderBy("doc_id"),
    Some(s"""
      WITH RECURSIVE
      d AS (SELECT doc_id, lower(trim(text)) AS s
            FROM documents WHERE doc_id < 100),
      vocab(tok, cost) AS (VALUES ${unigramVocab.map {
        case (t, c) => s"('$t',$c)"
      }.mkString(",")}),
      vm AS (SELECT map_from_entries(list((tok, cost))) AS m FROM vocab),
      dp AS (
        SELECT doc_id, s, 0 AS pos, [CAST(0 AS BIGINT)] AS dps FROM d
        UNION ALL
        SELECT doc_id, s, pos + 1,
          list_append(dps, least(
            coalesce(list_min(
              [dps[j + 1] + 1000000 * m[substr(s, j + 1, pos + 1 - j)][1] + 1
               for j in range(greatest(0, pos - 3), pos + 1)
               if m[substr(s, j + 1, pos + 1 - j)][1] IS NOT NULL]),
              9223372036854775807),
            dps[pos + 1] + 35000001))
        FROM dp, vm WHERE pos < strlen(s))
      SELECT doc_id, CAST(strlen(s) AS BIGINT) AS n_chars,
             CAST(dps[-1] // 1000000 AS BIGINT) AS total_cost,
             CAST(dps[-1] % 1000000 AS BIGINT) AS n_tokens
      FROM dp WHERE pos = strlen(s)
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(
    q237, q242, q243, q244, q249, q255,
    q185, q186, q187, q188, q190, q191, q192, q193, q194, q195, q198,
    q200, q201, q205, q206, q207, q208, q209, q210, q211, q212, q214,
    q215, q217, q218, q220, q221, q222, q226, q228, q229, q230, q231,
    q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q49,
    q53, q54, q55, q57, q68, q71, q72, q75, q76, q77, q84, q93, q97, q98,
    q99, q100, q104, q106, q110, q112, q113, q114, q115, q116, q120,
    q125, q126, q127, q128, q129, q131, q133, q141, q146, q151, q152,
    q154, q159, q160, q165, q166, q167, q169, q170,
    q171, q172, q176, q177, q179, q180, q181, q184)
}
