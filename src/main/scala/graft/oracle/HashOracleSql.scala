package graft.oracle

/** DuckDB SQL transcriptions of Spark's `xxhash64` (seed 42) over the
  * engine's hash-based LSH operators, closing the five rows-only
  * CORRECTNESS queries (minhash/simhash/knn-lsh/embedding-lsh).
  *
  * Spark's XXH64 (`org.apache.spark.sql.catalyst.expressions.XxHash64` →
  * `o.a.s.unsafe.hash.XXH64`, itself the reference xxHash64) is rebuilt in
  * HUGEINT arithmetic mod 2^64: every wrapping 64×64 multiply is split into
  * 32-bit halves (HUGEINT is signed INT128 — the naive product overflows),
  * rotations become shift-add chains, and each algorithm step is one
  * MATERIALIZED CTE stage (DuckDB 1.0 inlines a CTE per reference, so a
  * doubly-referenced unmaterialized step chain would blow up
  * exponentially).
  *
  * Input-shape assumptions, verified against the fixed testdata and
  * guarded where cheap: document tokens are ASCII and at most 8 bytes
  * (`ascii(substr(...))` is then exact byte extraction), and every document
  * has ≥ w tokens (the whole-text short-shingle branch is vacuous). A
  * violation would surface as a hash mismatch in CORRECTNESS, never as a
  * silent pass.
  *
  * Multi-argument `xxhash64(a, b, ...)` chains per field: the running hash
  * seeds the next field's hash (LongType → hashLong, IntegerType →
  * hashInt, StringType → the ≤8-byte bytes path below).
  */
object HashOracleSql {

  private val two64 = "18446744073709551616"
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** (col * const) mod 2^64 with the 32-bit-split wrapping multiply. The
    * operand is cast to HUGEINT first: DuckDB does not promote BIGINT
    * operands, so a raw INTEGER/BIGINT column here overflows INT64.
    */
  private def mulmod(col: String, c: BigInt): String = {
    val bh = c >> 32
    val bl = c & 0xffffffffL
    val x = s"CAST(($col) AS HUGEINT)"
    s"((($x) * $bl) % $two64 + (((($x) * $bh) % 4294967296) * 4294967296)) % $two64"
  }

  /** rotl64 on an unsigned-HUGEINT value in [0, 2^64). */
  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${BigInt(1) << r}) % $two64 + (($x) >> ${64 - r})) % $two64)"

  private def addmod(a: String, b: String): String = s"((($a) + ($b)) % $two64)"

  /** Signed-BIGINT column → unsigned HUGEINT in [0, 2^64). */
  private def unsignedSql(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $two64 ELSE CAST(($x) AS HUGEINT) END)"

  /** Unsigned HUGEINT → signed BIGINT reinterpretation. */
  def signedSql(h: String): String =
    s"CAST(CASE WHEN ($h) >= 9223372036854775808 THEN ($h) - $two64 ELSE ($h) END AS BIGINT)"

  /** One MATERIALIZED stage: `name AS (SELECT cols FROM from)`. */
  private def st(name: String, cols: Seq[String], from: String): String =
    s"$name AS MATERIALIZED (SELECT ${cols.mkString(", ")} FROM $from)"

  /** XXH64 finalizer (fmix) as five stages over column `h`. */
  private def fmixStages(px: String, keys: Seq[String], from: String): (Seq[String], String) = {
    val steps = Seq[String => String](
      h => s"xor($h, ($h) >> 33)",
      h => mulmod(h, P2),
      h => s"xor($h, ($h) >> 29)",
      h => mulmod(h, P3),
      h => s"xor($h, ($h) >> 32)")
    var cur = from
    val out = steps.zipWithIndex.map { case (f, i) =>
      val n = s"${px}f$i"
      val s = st(n, keys :+ s"${f("h")} AS h", cur)
      cur = n
      s
    }
    (out, cur)
  }

  /** `XXH64.hashLong(k, seed)`: stages transforming seed column `h` with
    * carried long column `k` (unsigned HUGEINT). 3 + 5 fmix stages.
    */
  private def hashLongStages(
      px: String, keys: Seq[String], kCol: String, from: String): (Seq[String], String) = {
    val a0 = st(s"${px}l0", keys :+ s"${addmod("h", (P5 + 8).toString)} AS h", from)
    val a1 = st(s"${px}l1",
      keys :+ s"xor(h, ${mulmod(rotl(mulmod(kCol, P2), 31), P1)}) AS h", s"${px}l0")
    val a2 = st(s"${px}l2",
      keys :+ s"${addmod(mulmod(rotl("h", 27), P1), P4.toString)} AS h", s"${px}l1")
    val (fm, last) = fmixStages(px, keys, s"${px}l2")
    (Seq(a0, a1, a2) ++ fm, last)
  }

  /** `XXH64.hashInt(i, seed)` for a small non-negative int column. */
  private def hashIntStages(
      px: String, keys: Seq[String], iCol: String, from: String): (Seq[String], String) = {
    val a0 = st(s"${px}i0", keys :+ s"${addmod("h", (P5 + 4).toString)} AS h", from)
    val a1 = st(s"${px}i1", keys :+ s"xor(h, ${mulmod(iCol, P1)}) AS h", s"${px}i0")
    val a2 = st(s"${px}i2",
      keys :+ s"${addmod(mulmod(rotl("h", 23), P2), P3.toString)} AS h", s"${px}i1")
    val (fm, last) = fmixStages(px, keys, s"${px}i2")
    (Seq(a0, a1, a2) ++ fm, last)
  }

  /** Spark string-xxhash64 for ASCII strings of ≤ 8 bytes (hashUnsafeBytes
    * short path: one optional 8-byte word, one optional 4-byte word, up to
    * 3 tail bytes, fmix). `from` must provide `keys`, seed column `h` and
    * the string column `sCol`. Strings longer than 8 bytes poison the hash
    * via the vacuous-by-data assumption (see class doc).
    */
  private def hashStringStages(
      px: String, keys: Seq[String], sCol: String, from: String): (Seq[String], String) = {
    val bytes = (1 to 8).map(i =>
      s"CASE WHEN length($sCol) >= $i THEN CAST(ascii(substr($sCol, $i, 1)) AS HUGEINT) ELSE 0 END AS _b$i")
    val prep = st(s"${px}p0",
      keys ++ Seq("h", s"length($sCol) AS _len") ++ bytes, from)
    val packCols = keys ++ Seq("h", "_len",
      (1 to 8).map(i => s"_b$i * ${BigInt(256).pow(i - 1)}").mkString("(", " + ", s") % $two64 AS _w8"),
      (1 to 4).map(i => s"_b$i * ${BigInt(256).pow(i - 1)}").mkString("(", " + ", ") AS _w4"),
      "CASE WHEN _len >= 8 THEN 0 WHEN _len >= 4 THEN _len - 4 ELSE _len END AS _tn",
      "CASE WHEN _len >= 4 THEN _b5 ELSE _b1 END AS _t0",
      "CASE WHEN _len >= 4 THEN _b6 ELSE _b2 END AS _t1",
      "CASE WHEN _len >= 4 THEN _b7 ELSE _b3 END AS _t2")
    val pack = st(s"${px}p1", packCols, s"${px}p0")
    val carry = keys ++ Seq("_len", "_w8", "_w4", "_tn", "_t0", "_t1", "_t2")
    var cur = s"${px}p1"
    var stages = Seq(prep, pack)
    def add(name: String, hExpr: String): Unit = {
      stages :+= st(name, carry :+ s"$hExpr AS h", cur)
      cur = name
    }
    // length fold
    add(s"${px}s0", addmod("h", addmod("_len", P5.toString)))
    // full 8-byte word (len = 8 exactly, by the ≤8-byte contract)
    add(s"${px}s1",
      s"CASE WHEN _len = 8 THEN xor(h, ${mulmod(rotl(mulmod("_w8", P2), 31), P1)}) ELSE h END")
    add(s"${px}s2",
      s"CASE WHEN _len = 8 THEN ${addmod(mulmod(rotl("h", 27), P1), P4.toString)} ELSE h END")
    // 4-byte word (len in 4..7)
    add(s"${px}s3",
      s"CASE WHEN _len >= 4 AND _len < 8 THEN xor(h, ${mulmod("_w4", P1)}) ELSE h END")
    add(s"${px}s4",
      s"CASE WHEN _len >= 4 AND _len < 8 THEN ${addmod(mulmod(rotl("h", 23), P2), P3.toString)} ELSE h END")
    // tail bytes
    (0 until 3).foreach { k =>
      add(s"${px}t${k}a", s"CASE WHEN _tn > $k THEN xor(h, ${mulmod(s"_t$k", P5)}) ELSE h END")
      add(s"${px}t${k}b", s"CASE WHEN _tn > $k THEN ${mulmod(rotl("h", 11), P1)} ELSE h END")
    }
    val (fm, last) = fmixStages(px, keys, cur)
    (stages ++ fm, last)
  }

  /** Distinct document tokens hashed with `xxhash64(tok)` (seed 42):
    * stages from `documents`, final CTE `<px>out` with (tok, h).
    * Tokenization mirrors `TextAnalysis.tokensCol`.
    */
  private def tokenHashCtes(px: String): (String, String) = {
    val base =
      s"""${px}base AS MATERIALIZED (
            SELECT DISTINCT tok FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS tok
              FROM documents)),
          ${px}seed AS (SELECT tok, CAST(42 AS HUGEINT) AS h FROM ${px}base)"""
    val (stages, last) = hashStringStages(px, Seq("tok"), "tok", s"${px}seed")
    (base + ",\n" + stages.mkString(",\n"), last)
  }

  /** Per-document simhash signature CTEs: final CTE `sig` with
    * (doc_id, hu) where hu is the unsigned 64-bit signature. One hash per
    * DISTINCT token; per-document token multiplicity re-attached for the
    * bit counters (SimHash64Expr.compute counts every occurrence).
    */
  private def simhashSigCtes: String = {
    val (tokCtes, tokLast) = tokenHashCtes("x")
    s"""WITH $tokCtes,
        occ AS MATERIALIZED (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS tok
          FROM documents),
        bits AS MATERIALIZED (
          SELECT o.doc_id, b.b,
                 sum(CASE WHEN (th.h >> b.b) % 2 = 1 THEN 1 ELSE -1 END) AS c
          FROM occ o JOIN $tokLast th USING (tok)
          CROSS JOIN generate_series(0, 63) b(b)
          GROUP BY o.doc_id, b.b),
        sig AS MATERIALIZED (
          SELECT d.doc_id,
                 coalesce(s.hu, CAST(0 AS HUGEINT)) AS hu
          FROM documents d LEFT JOIN (
            SELECT doc_id,
                   sum(CASE WHEN c >= 0 THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END) AS hu
            FROM bits GROUP BY doc_id) s USING (doc_id))"""
  }

  /** Oracle for `q_simhash_sigs`: (doc_id, simhash) ordered by doc_id. */
  def simhashSigsSql: String =
    s"""$simhashSigCtes
        SELECT doc_id, ${signedSql("hu")} AS simhash FROM sig ORDER BY doc_id"""

  /** Oracle for `q_simhash_neardups(maxHamming = 3)`: 16-bit block
    * pigeonhole candidates, Hamming ≤ 3, (doc_a, doc_b, hamming).
    */
  def simhashNearDupsSql(maxHamming: Int = 3): String = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    s"""$simhashSigCtes,
        blk AS MATERIALIZED (
          SELECT doc_id, hu, b.b AS block,
                 (hu >> (b.b * $width)) % ${BigInt(1) << width} AS bval
          FROM sig CROSS JOIN generate_series(0, ${blocks - 1}) b(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.hu AS ha, b.hu AS hb
          FROM blk a JOIN blk b ON a.block = b.block AND a.bval = b.bval
          WHERE a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(${signedSql("ha")}, ${signedSql("hb")})) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(${signedSql("ha")}, ${signedSql("hb")})) <= $maxHamming
        ORDER BY doc_a, doc_b"""
  }

  /** Oracle for `q_minhash_neardups(w=3, bands=16, rows=4, threshold=0.7)`:
    * word shingles via window leads, shingle hash = chained string-xxhash64
    * over the three tokens, k=64 permutation minima, banded buckets via
    * chained long/int hashing, bucket-collision candidates, exact Jaccard
    * on distinct shingle-hash sets.
    */
  def minhashNearDupsSql(
      w: Int = 3, bands: Int = 16, rows: Int = 4, threshold: Double = 0.7): String = {
    require(w == 3, "transcription is laid out for w = 3")
    val k = bands * rows
    // chained shingle hash over DISTINCT (t0, t1, t2) triples
    val (h0, h0last) = hashStringStages("g0", Seq("t0", "t1", "t2"), "t0", "tri0")
    val (h1, h1last) = hashStringStages("g1", Seq("t0", "t1", "t2"), "t1", h0last)
    val (h2, h2last) = hashStringStages("g2", Seq("t0", "t1", "t2"), "t2", h1last)
    // permutation minima: hashLong(sh, 42) once per distinct sh, then
    // hashInt(j, ·) per (sh, j)
    val (pl, plLast) = hashLongStages("m0", Seq("sh"), "sh", "shseed")
    val (pj, pjLast) = hashIntStages("m1", Seq("sh", "j"), "j", "shj")
    // banded bucket: 4 chained hashLong over the band's minima + hashInt(band)
    val bandKeys = Seq("doc_id", "band", "m0", "m1", "m2", "m3")
    val (b0, b0l) = hashLongStages("q0", bandKeys, "m0", "bandseed")
    val (b1, b1l) = hashLongStages("q1", bandKeys, "m1", b0l)
    val (b2, b2l) = hashLongStages("q2", bandKeys, "m2", b1l)
    val (b3, b3l) = hashLongStages("q3", bandKeys, "m3", b2l)
    val (bb, bbl) = hashIntStages("q4", Seq("doc_id", "band"), "band", b3l)
    s"""WITH tkl AS MATERIALIZED (
          SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tk
          FROM documents),
        toks AS MATERIALIZED (
          -- unnest + generate_subscripts expand in lockstep: no token-count
          -- cap (an earlier generate_series(1, 400) build silently dropped
          -- shingles of longer documents in the oracle only)
          SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS pos
          FROM tkl),
        sh3 AS MATERIALIZED (
          SELECT doc_id, tok AS t0,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
          FROM toks),
        shw AS MATERIALIZED (SELECT * FROM sh3 WHERE t2 IS NOT NULL),
        tri0 AS MATERIALIZED (
          SELECT DISTINCT t0, t1, t2, CAST(42 AS HUGEINT) AS h FROM shw),
        ${(h0 ++ h1 ++ h2).mkString(",\n")},
        dsh AS MATERIALIZED (
          SELECT DISTINCT s.doc_id, ${signedSql("t.h")} AS sh
          FROM shw s JOIN $h2last t USING (t0, t1, t2)),
        shseed AS MATERIALIZED (
          SELECT DISTINCT sh, CAST(42 AS HUGEINT) AS h FROM (
            SELECT ${unsignedSql("sh")} AS sh FROM dsh)),
        ${pl.mkString(",\n")},
        shj AS MATERIALIZED (
          SELECT p.sh, j.j, p.h FROM $plLast p
          CROSS JOIN generate_series(0, ${k - 1}) j(j)),
        ${pj.mkString(",\n")},
        mins AS MATERIALIZED (
          SELECT d.doc_id, CAST(p.j // $rows AS INTEGER) AS band, p.j % $rows AS r,
                 min(${signedSql("p.h")}) AS s
          FROM dsh d JOIN $pjLast p ON p.sh = ${unsignedSql("d.sh")}
          GROUP BY d.doc_id, p.j // $rows, p.j % $rows),
        bandseed AS MATERIALIZED (
          SELECT doc_id, band,
                 ${unsignedSql("max(CASE WHEN r = 0 THEN s END)")} AS m0,
                 ${unsignedSql("max(CASE WHEN r = 1 THEN s END)")} AS m1,
                 ${unsignedSql("max(CASE WHEN r = 2 THEN s END)")} AS m2,
                 ${unsignedSql("max(CASE WHEN r = 3 THEN s END)")} AS m3,
                 CAST(42 AS HUGEINT) AS h
          FROM mins GROUP BY doc_id, band),
        ${(b0 ++ b1 ++ b2 ++ b3 ++ bb).mkString(",\n")},
        buckets AS MATERIALIZED (
          SELECT doc_id, band, h AS bucket FROM $bbl),
        cand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id < b.doc_id),
        sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
        inter AS MATERIALIZED (
          SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN dsh sa ON sa.doc_id = c.doc_a
          JOIN dsh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
          GROUP BY c.doc_a, c.doc_b)
        SELECT c.doc_a, c.doc_b,
               round(CAST(coalesce(i.i, 0) AS DOUBLE)
                     / CAST(na.n + nb.n - coalesce(i.i, 0) AS DOUBLE), 6) AS jaccard
        FROM cand c
        JOIN sizes na ON na.doc_id = c.doc_a
        JOIN sizes nb ON nb.doc_id = c.doc_b
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        WHERE round(CAST(coalesce(i.i, 0) AS DOUBLE)
                    / CAST(na.n + nb.n - coalesce(i.i, 0) AS DOUBLE), 6) >= $threshold
        ORDER BY c.doc_a, c.doc_b"""
  }

  // ---- splitmix64-based LSH over embeddings (no xxhash64 involved) ----

  /** splitmix64 finalizer over an unsigned-HUGEINT expression (same
    * transcription as the generator oracle, `SparkEntry.mixSql`).
    */
  private def mixSql(x: String): String = {
    val c1 = BigInt("BF58476D1CE4E5B9", 16)
    val c2 = BigInt("94D049BB133111EB", 16)
    val z0 = s"((($x) + 11400714819323198485) % $two64)"
    val y1 = s"xor($z0, ($z0) >> 30)"
    val z1 = s"(${mulmod(y1, c1)})"
    val y2 = s"xor($z1, ($z1) >> 27)"
    val z2 = s"(${mulmod(y2, c2)})"
    s"xor($z2, ($z2) >> 31)"
  }

  /** CTEs producing per-(id, table) sign buckets of `embeddings` under the
    * deterministic splitmix64 hyperplanes (`Knn.bucketCol`): final CTE
    * `buck` with (id, t, bucket). Projections are sequential double dot
    * products in both engines (DotProductExpr ↔ list_dot_product), so the
    * sign decisions agree bit-for-bit.
    */
  private def bucketCtes(bits: Int, tables: Int, seed: Long = 42L): String =
    s"""dim AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
        pw AS MATERIALIZED (
          SELECT t.t, p.p, j.j,
            CASE WHEN ${mixSql(s"CAST($seed + t.t * 1000003 + p.p * 7919 + j.j AS HUGEINT)")}
                   < 9223372036854775808
                 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS w
          FROM generate_series(0, ${tables - 1}) t(t)
          CROSS JOIN generate_series(0, ${bits - 1}) p(p)
          CROSS JOIN generate_series(0, 4095) j(j)
          WHERE j.j < (SELECT d FROM dim)),
        planes AS MATERIALIZED (
          SELECT t, p, list(w ORDER BY j) AS plane FROM pw GROUP BY t, p),
        proj AS MATERIALIZED (
          SELECT e.vec_id AS id, pl.t, pl.p,
                 list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.plane) AS pr
          FROM embeddings e CROSS JOIN planes pl),
        buck AS MATERIALIZED (
          SELECT id, t,
                 sum(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
          FROM proj GROUP BY id, t)"""

  /** Oracle for `q_embedding_neardups_lsh(threshold=0.40, bits=6,
    * tables=12)`: bucket-collision candidates, exact cosine filter (same
    * formula as the green exact oracle).
    */
  def embeddingNearDupsLshSql(
      threshold: Double = 0.40, bits: Int = 6, tables: Int = 12): String =
    s"""WITH ${bucketCtes(bits, tables)},
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM buck a JOIN buck b ON a.t = b.t AND a.bucket = b.bucket
          WHERE a.id < b.id)
        SELECT c.id_a, c.id_b,
               round(list_cosine_similarity(ea.embedding, eb.embedding), 2) AS cos
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b
        WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= $threshold
        ORDER BY id_a, id_b"""

  /** Oracle for `q_knn_lsh(k=5, bits=8, tables=8)` with queries vec_id <
    * 10 (rank-only output, same gap-stability argument as the green brute
    * oracle — LSH only restricts the candidate set).
    */
  def knnLshSql(k: Int = 5, bits: Int = 8, tables: Int = 8): String =
    s"""WITH ${bucketCtes(bits, tables)},
        cand AS (
          SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
          FROM buck q JOIN buck c ON q.t = c.t AND q.bucket = c.bucket
          WHERE q.id < 10 AND c.id <> q.id),
        sc AS (
          SELECT c.query_id, c.neighbor_id,
                 list_cosine_similarity(eq.embedding, en.embedding) AS cs
          FROM cand c
          JOIN embeddings eq ON eq.vec_id = c.query_id
          JOIN embeddings en ON en.vec_id = c.neighbor_id),
        rk AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rank
          FROM sc)
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
        FROM rk WHERE rank <= $k ORDER BY query_id, rank"""
}
