package graft

import org.apache.spark.sql.functions._

import graft.scoring.{ExternalLm, ExternalLmScorer, TrainSp}

/** Round 16: the external-LM ingestion query (VERDICT r15 #1 — the last
  * reference divergence). The reference scores perplexity with a
  * DOWNLOADED KenLM model + SentencePiece tokenizer
  * (chat_data_pipeline/kenlm_model.py:18-29,122-142); until r16 the
  * engine could only score with its compiled-in resource, so reference
  * threshold configs weren't numerically transferable. This query drives
  * the new runtime-ingestion path end-to-end: the shipped piece table +
  * piece-level ARPA are first dumped to PLAIN FILES and loaded back
  * through `ExternalLm.fromFiles` — exactly what a user pointing the
  * engine at their own exported KenLM/SentencePiece pair does — then
  * every document is scored over the segmented token stream.
  *
  * The oracle replays EVERYTHING from exported data: cc_net
  * normalization, the `▁`-marked greedy longest-match segmentation (a
  * recursive CTE advancing one piece per step, longest-match via one
  * hash join per piece length), `<unk>` vocab mapping, the
  * 4→3→2→1-gram backoff chain, ordered log-sum, and the reference's
  * `round(10^(−Σ/Σlen), 1)` — sharing nothing with the JVM scorer but
  * the parsed model constants (the f2_check_perplexity trust chain, now
  * with the tokenizer inside the replay too).
  */
object QueriesExtra11 {

  /** The "external" model pair on disk (dumped from the shipped
    * resources once per JVM, then ingested back through the file API).
    * Corpus-independent — no scale key, like the f2 ARPA dump.
    */
  private val ExtLmDir = "/tmp/graft_extlm"
  private val ExtLmTables = "/tmp/graft_extlm_tables"
  private val ArpaRes = "graft/graft-en-sp.arpa"
  private val PiecesRes = "graft/graft-en.pieces"

  @volatile private var extLmScorer: ExternalLmScorer = null
  @volatile private var extLmBinScorer: ExternalLmScorer = null

  /** Concurrent-JVM-safe resource dump (VERDICT r16 "what's wrong" #3):
    * two verify/bench JVMs racing a plain REPLACE_EXISTING copy could
    * expose a half-written model file to the other's reader. Each writer
    * copies to its own temp name and ATOMIC_MOVEs into place — the
    * content is identical across JVMs (same classpath resource), so
    * whoever lands last is fine and no reader ever sees a partial file.
    */
  private def resourceToFile(res: String, dest: String): Unit = {
    val in = getClass.getClassLoader.getResourceAsStream(res)
    require(in != null, s"missing resource $res")
    val destPath = java.nio.file.Paths.get(dest)
    val tmp = destPath.resolveSibling(
      s".${destPath.getFileName}.${java.lang.ProcessHandle.current.pid}.tmp")
    try {
      java.nio.file.Files.copy(in, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.move(tmp, destPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      in.close()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** Dump resources → files, ingest via [[ExternalLm.fromFiles]], export
    * model + pieces AS DATA for the oracle. Once per JVM; the scorer is
    * memoized so executor tasks (same JVM at local[32]; on a cluster
    * ship the two files with `SparkFiles.addFile` first) reuse one
    * parsed model.
    */
  private def ensureExternalLm(
      s: org.apache.spark.sql.SparkSession): ExternalLmScorer = {
    if (extLmScorer == null) synchronized { if (extLmScorer == null) {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(ExtLmDir))
      // cross-JVM exclusion for the parquet exports (VERDICT r16 #3):
      // overwrite-mode deletes the directory first, so a concurrent
      // verify/bench JVM re-exporting the same frames could hand DuckDB
      // a half-replaced glob. The flat model files are atomic-moved;
      // the parquet side serializes on an OS file lock (identical
      // content per JVM, so whoever writes last is equivalent).
      val lockCh = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(s"$ExtLmDir/.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = lockCh.lock()
      try {
        resourceToFile(ArpaRes, s"$ExtLmDir/model.arpa")
        resourceToFile(PiecesRes, s"$ExtLmDir/pieces.vocab")
        val scorer = ExternalLm.fromFiles(s"$ExtLmDir/model.arpa",
          Some(s"$ExtLmDir/pieces.vocab"))
        // r17: compile the text ARPA to graft's binary `.glm` (same
        // atomic-move discipline as the flat files) and build a SECOND
        // scorer whose LM half loads through the PackedLm path — the
        // f2_external_lm_bin oracle proves the compiled representation
        // answers the full document chain hash-identically.
        locally {
          val glm = java.nio.file.Paths.get(s"$ExtLmDir/model.glm")
          val tmpGlm = glm.resolveSibling(
            s".model.glm.${java.lang.ProcessHandle.current.pid}.tmp")
          try {
            graft.scoring.PackedLm.compileFile(s"$ExtLmDir/model.arpa",
              tmpGlm.toString)
            java.nio.file.Files.move(tmpGlm, glm,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          } finally java.nio.file.Files.deleteIfExists(tmpGlm)
        }
        extLmBinScorer = ExternalLm.fromFiles(s"$ExtLmDir/model.glm",
          Some(s"$ExtLmDir/pieces.vocab"))
        import s.implicits._
        val m = scorer.model
        m.uniRows.toDF("w", "p", "bo")
          .write.mode("overwrite").parquet(s"$ExtLmTables/uni")
        m.biRows.toDF("g", "p", "bo")
          .write.mode("overwrite").parquet(s"$ExtLmTables/bi")
        m.triRows.toDF("g", "p", "bo")
          .write.mode("overwrite").parquet(s"$ExtLmTables/tri")
        m.quadRows.toDF("g", "p")
          .write.mode("overwrite").parquet(s"$ExtLmTables/quad")
        scorer.pieces.get.rows.toDF("piece", "len", "score")
          .write.mode("overwrite").parquet(s"$ExtLmTables/pieces")
        extLmScorer = scorer
      } finally {
        lock.release()
        lockCh.close()
      }
    } }
    extLmScorer
  }

  /** Shared scorer UDF shape for the text-ARPA and compiled-.glm paths.
    * Fast path: the driver populated the field during query construction
    * and local-mode executors share the JVM; a separate-JVM executor
    * (non-local master) re-resolves through the path-keyed per-JVM
    * cache instead of NPE-ing on the driver-only var — it still needs
    * the files present (SparkFiles.addFile them; ensureExternalLm's doc).
    * `fast` must be a closure over the @volatile field, not its value,
    * so executors observe the post-construction write.
    */
  private def mkScoreUdf(fast: () => ExternalLmScorer, lmFile: String) =
    udf { (t: String) =>
      val s = fast()
      val scorer =
        if (s != null) s
        else graft.scoring.ExternalLm.cached(s"$ExtLmDir/$lmFile",
          Some(s"$ExtLmDir/pieces.vocab"))
      scorer.score(if (t == null) "" else t)
    }

  private val scoreUdf = mkScoreUdf(() => extLmScorer, "model.arpa")
  private val scoreBinUdf = mkScoreUdf(() => extLmBinScorer, "model.glm")

  val f2External: QueryDef = QueryDef("f2_external_lm",
    (s, dir) => {
      ensureExternalLm(s)
      Queries.table(s, dir, "documents")
        .select(col("doc_id"), scoreUdf(col("text")).as("ext_lm_ppl"))
        .orderBy("doc_id")
    },
    Some(replaySql("text")))

  /** Multi-line whole-doc oracle (ADVICE r16 medium — the divergence it
    * flagged was exactly that no oracle covered documents with `\n`):
    * both engines compose the SAME multi-line, double-spaced document
    * from each `documents` row, so the replay proves the reference
    * chain end-to-end — `\n` removed outright (lines CONCATENATE, no
    * space — kenlm_model.py:71-73's non-printing class spans \x0a),
    * space runs collapsed (SP's remove_extra_whitespaces), ONE
    * `<s>..</s>` event chain with a single +1 per document.
    */
  val f2ExternalMultiline: QueryDef = QueryDef("f2_external_lm_multiline",
    (s, dir) => {
      ensureExternalLm(s)
      Queries.table(s, dir, "documents")
        .select(col("doc_id"),
          scoreUdf(concat(col("text"), lit("\n"), col("text"),
            lit("\nx  y z"))).as("ext_lm_ppl"))
        .orderBy("doc_id")
    },
    Some(replaySql("text || chr(10) || text || chr(10) || 'x  y z'")))

  /** r17: the same documents scored through the COMPILED `.glm` LM
    * (the `build_binary` analogue — PackedLm.scala's header): the text
    * ARPA is compiled to graft's binary format, loaded back through the
    * sniffing `ExternalLm.fromFiles` path (exactly what `lm_path:
    * model.glm` in a YAML config does), and every document must land on
    * the identical 1-dp perplexity — the oracle is the SAME independent
    * DuckDB replay as f2_external_lm, so a hash match certifies the
    * packed id-chained lookup chain end-to-end on real data, not just
    * in-JVM parity (PackedLmSpec covers that bit-exactly).
    */
  val f2ExternalBin: QueryDef = QueryDef("f2_external_lm_bin",
    (s, dir) => {
      ensureExternalLm(s)
      Queries.table(s, dir, "documents")
        .select(col("doc_id"), scoreBinUdf(col("text")).as("ext_lm_ppl"))
        .orderBy("doc_id")
    },
    Some(replaySql("text")))

  /** The full DuckDB replay over an arbitrary raw-document SQL
    * expression (shared by the single-line and multi-line oracles).
    */
  private def replaySql(docExpr: String): String = {
      import OracleSql._
      // the same ccnet chain the f2/ccnet oracles hash-match, THEN the
      // pieces-path whole-doc pretreatment (ADVICE r16 medium — the
      // reference's normalize removes \n outright, kenlm_model.py:71-73,
      // so lines concatenate with NO space and the whole doc scores as
      // ONE <s>..</s> chain; SP's default remove_extra_whitespaces then
      // trims + collapses space runs)
      val ccnet =
        "regexp_replace(" +
          normalizePunctuation(
            "regexp_replace(strip_accents(lower(" + strip(docExpr) + ")), " +
              "'[0-9]', '0', 'g')") +
          ", '[\\x00-\\x09\\x0b-\\x1f\\x7f-\\x9f]', '', 'g')"
      val norm =
        s"trim(regexp_replace(replace($ccnet, chr(10), ''), '  +', ' ', 'g'))"
      // greedy longest-match: one LEFT JOIN per candidate length
      // (maxPieceLen..2); a clamped substr near end-of-string is shorter
      // than k and can never equal a len-k piece, so no bounds CASE is
      // needed. Unmatched position → single codepoint (the JVM fallback).
      val maxLen = TrainSp.MaxPieceLen
      val lenJoins = (maxLen to 2 by -1).map { k =>
        s"LEFT JOIN pc p$k ON p$k.len = $k AND " +
          s"p$k.piece = substr(seg.s, seg.pos, $k) "
      }.mkString
      val lenCase = "CASE " + (maxLen to 2 by -1).map { k =>
        s"WHEN p$k.piece IS NOT NULL THEN $k "
      }.mkString + "ELSE 1 END"
      val bichain =
        "CASE WHEN bp IS NOT NULL THEN bp ELSE coalesce(bo1v, 0) + up END"
      val trichain = "CASE WHEN h2 IS NULL THEN " + bichain +
        " WHEN tp IS NOT NULL THEN tp ELSE coalesce(bo2v, 0) + " +
        bichain + " END"
      val quadchain = "CASE WHEN h3 IS NULL THEN " + trichain +
        " WHEN qp IS NOT NULL THEN qp ELSE coalesce(bo3v, 0) + " +
        trichain + " END"
      "WITH RECURSIVE " +
        s"uni AS (SELECT * FROM parquet_scan('$ExtLmTables/uni/*.parquet')), " +
        s"bi AS (SELECT * FROM parquet_scan('$ExtLmTables/bi/*.parquet')), " +
        s"tri AS (SELECT * FROM parquet_scan('$ExtLmTables/tri/*.parquet')), " +
        s"quad AS (SELECT * FROM parquet_scan('$ExtLmTables/quad/*.parquet')), " +
        s"pc AS (SELECT piece, len FROM " +
        s"parquet_scan('$ExtLmTables/pieces/*.parquet') WHERE len >= 2), " +
        s"d AS (SELECT doc_id, $norm AS norm FROM documents), " +
        "d2 AS (SELECT doc_id, CASE WHEN norm = '' THEN '' ELSE " +
        "'▁' || replace(norm, ' ', '▁') END AS s FROM d), " +
        // one piece per recursion step: (pos, i) advance together; the
        // seed row (i = 0) carries no piece and is filtered from tok
        "seg AS (" +
        "SELECT doc_id, s, CAST(1 AS BIGINT) AS pos, " +
        "CAST(0 AS BIGINT) AS i, CAST(NULL AS VARCHAR) AS w FROM d2 " +
        "UNION ALL " +
        "SELECT g.doc_id, g.s, g.pos + g.l, g.i + 1, " +
        "substr(g.s, CAST(g.pos AS INT), CAST(g.l AS INT)) FROM (" +
        s"SELECT seg.doc_id, seg.s, seg.pos, seg.i, $lenCase AS l " +
        s"FROM seg $lenJoins" +
        "WHERE seg.pos <= length(seg.s)) g), " +
        "tok AS (SELECT doc_id, i, w FROM seg WHERE i >= 1), " +
        // from here on: the f2_check_perplexity replay chain verbatim
        "mtok AS (SELECT tok.doc_id, tok.i, CASE WHEN u.w IS NULL THEN " +
        "'<unk>' ELSE tok.w END AS m FROM tok LEFT JOIN uni u ON " +
        "u.w = tok.w), " +
        "seqs AS (SELECT doc_id, list(m ORDER BY i) AS ms FROM mtok " +
        "GROUP BY doc_id), " +
        "fl AS (SELECT d.doc_id, coalesce(s.ms, []) AS ms FROM d LEFT " +
        "JOIN seqs s USING (doc_id)), " +
        "ev AS (SELECT doc_id, i, " +
        "CASE WHEN i <= len(ms) THEN ms[i] ELSE '</s>' END AS w, " +
        "CASE WHEN i = 1 THEN '<s>' ELSE ms[i-1] END AS h1, " +
        "CASE WHEN i = 2 THEN '<s>' WHEN i > 2 THEN ms[i-2] END AS h2, " +
        "CASE WHEN i = 3 THEN '<s>' WHEN i > 3 THEN ms[i-3] END AS h3 " +
        "FROM fl, LATERAL (SELECT unnest(generate_series(1, len(ms)+1)) " +
        "AS i) g), " +
        "lk AS (SELECT e.doc_id, e.i, e.h2, e.h3, q.p AS qp, b3.bo AS " +
        "bo3v, tr.p AS tp, b2.bo AS bo2v, bb.p AS bp, u1.bo AS bo1v, " +
        "uw.p AS up FROM ev e " +
        "LEFT JOIN quad q ON e.h3 IS NOT NULL AND q.g = e.h3 || ' ' || " +
        "e.h2 || ' ' || e.h1 || ' ' || e.w " +
        "LEFT JOIN tri b3 ON e.h3 IS NOT NULL AND b3.g = e.h3 || ' ' || " +
        "e.h2 || ' ' || e.h1 " +
        "LEFT JOIN tri tr ON e.h2 IS NOT NULL AND tr.g = e.h2 || ' ' || " +
        "e.h1 || ' ' || e.w " +
        "LEFT JOIN bi b2 ON e.h2 IS NOT NULL AND b2.g = e.h2 || ' ' || " +
        "e.h1 " +
        "LEFT JOIN bi bb ON bb.g = e.h1 || ' ' || e.w " +
        "LEFT JOIN uni u1 ON u1.w = e.h1 " +
        "LEFT JOIN uni uw ON uw.w = e.w), " +
        s"pv AS (SELECT doc_id, i, ($quadchain) AS p FROM lk), " +
        "res AS (SELECT doc_id, list_sum(list(p ORDER BY i)) AS logsum, " +
        "count(*) AS len FROM pv GROUP BY doc_id) " +
        "SELECT doc_id, round(pow(10, -logsum/len), 1) AS " +
        "ext_lm_ppl FROM res ORDER BY doc_id"
  }

  val all: Seq[QueryDef] = Seq(f2External, f2ExternalMultiline,
    f2ExternalBin)
}
