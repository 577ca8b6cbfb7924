package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core column-level primitives of the engine.
  *
  * Each mirrors a per-record derivation of the reference pipeline
  * (graphsense-ethereum-etl) as a codegen-friendly Catalyst expression —
  * no UDFs anywhere, so every function stays inside whole-stage codegen
  * and is usable at 100 TB scale.
  */
object ColumnFns {

  /** Bucket size used by the reference for block partitioning
    * (ref: scripts/eth_cassandra_streaming.py:34 `BLOCK_BUCKET_SIZE = 1_000`). */
  val BlockBucketSize = 1000L

  /** Hash-prefix length for transaction partitioning
    * (ref: scripts/eth_cassandra_streaming.py:35 `TX_HASH_PREFIX_LEN = 5`). */
  val TxHashPrefixLen = 5

  /** `0x`-prefixed hex string -> binary, null-preserving.
    * (ref: scripts/eth_cassandra_streaming.py:183-186 `hex_to_bytearray`.)
    * `unhex` is a codegen'd built-in returning BinaryType; null in -> null out.
    */
  def hexToBinary(c: Column): Column = unhex(substring(c, 3, Int.MaxValue))

  /** Binary -> `0x`-prefixed lowercase hex string (inverse of [[hexToBinary]]). */
  def binaryToHex(c: Column): Column =
    when(c.isNotNull, concat(lit("0x"), lower(hex(c))))

  /** Block bucket: `block_id // bucketSize`
    * (ref: scripts/eth_cassandra_streaming.py:344,395,455). This is both a
    * derived column and the physical `partitionBy` key of the sink, which is
    * what makes block-range queries partition-pruned instead of full scans.
    * Exact for ids < 2^52 (doubles in `floor` are exact there; Ethereum block
    * ids are < 2^31).
    */
  def blockIdGroup(blockId: Column, bucketSize: Long = BlockBucketSize): Column =
    floor(blockId / bucketSize).cast("int")

  /** Tx-hash prefix: `tx_hash[2 : 2+len]`, skipping the leading `0x`
    * (ref: scripts/eth_cassandra_streaming.py:428-429). Spreads rows
    * uniformly over 16^len partitions and enables point lookup by hash.
    */
  def txHashPrefix(hash: Column, len: Int = TxHashPrefixLen): Column =
    substring(hash, 3, len)

  /** Deterministic 60-bit positive hash of a string column, derived from the
    * first 15 hex chars of its md5. Chosen over `xxhash64`/`hash` because it
    * is reproducible in any SQL engine (`CAST('0x'||substr(md5(x),1,15) AS
    * BIGINT)` in DuckDB), which keeps MinHash/SimHash/fingerprint operators
    * oracle-verifiable. Always in [0, 2^60).
    *
    * Backed by the native [[Md5LongExpr]] (digest bytes -> long, no
    * intermediate hex/decimal strings); bit-identical to the composable
    * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` chain it
    * replaces (equivalence locked by ColumnFnsSpec).
    */
  def md5Long(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5LongExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Seeded variant of [[md5Long]]: an independent hash family member per
    * seed, used for MinHash permutations and LSH hyperplanes. */
  def md5LongSeeded(seed: Int, c: Column): Column =
    md5Long(concat(lit(seed.toString), lit("|"), c))

  /** Fast-path 60-bit positive hash: `xxhash64 & (2^60 − 1)`. Same contract
    * as [[md5Long]] (deterministic, always in [0, 2^60)) at ~3× the
    * throughput — xxHash is a few multiplies per word where md5 runs a full
    * cryptographic digest — but NOT reproducible in standard SQL engines,
    * so operators expose it behind an explicit `fastHash` flag and keep
    * md5 as the oracle-verifiable default. */
  def fastLong60(c: Column): Column =
    xxhash64(c).bitwiseAND(lit((1L << 60) - 1))

  /** Fast-path 30-bit positive hash (`xxhash64 & (2^30 − 1)`): the
    * [[graft.llm.Dedup.minhashBase]] width — keeps the affine MinHash
    * permutation products below 2^61, exact on LongType. */
  def fastLong30(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(1073741823L))

  /** Whitespace tokenization (single-space delimiter, matching the synthetic
    * corpus; swap the pattern for real data). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles of a token array. Documents shorter than k tokens
    * collapse to a single whole-document shingle so every doc gets >= 1
    * shingle (MinHash requires a non-empty set).
    *
    * Backed by the native [[ShinglesExpr]] (one pass, one string per gram);
    * bit-identical to the composable
    * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i+1, k)))`
    * chain it replaces (equivalence locked by ColumnFnsSpec).
    */
  def shingles(toks: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShinglesExpr(org.apache.spark.sql.GraftColumnBridge.expression(toks), k))

  /** Unicode NFC canonical composition ([[NfcNormalizeExpr]]) — run this
    * BEFORE any hash-based operator: byte-level hashing treats composed
    * and decomposed forms of the same text as different documents.
    * Cross-engine equal to DuckDB's `nfc_normalize`. */
  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalizeExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Unicode NFKC compatibility composition — NFC plus ligature/width/
    * fraction folding (ﬁ→fi, ！→!, ½→1⁄2); the aggressive normalization
    * retrieval pipelines apply before tokenization. */
  def nfkc(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalizeExpr(org.apache.spark.sql.GraftColumnBridge.expression(c),
        compat = true))

  /** Morton (Z-order) interleave of two non-negative int columns' low
    * `bits` bits: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Sorting/clustering a sink by the Z-code gives multi-dimensional scan
    * locality on ONE sort key — a range box over (x, y) touches
    * O(perimeter) row groups instead of O(table) — which is how a
    * bucketed layout serves two range dimensions (e.g. block_id ×
    * address prefix) without a second copy of the data. Pure integer
    * bit-arithmetic, fully codegen'd, and reproducible in any SQL engine
    * (the oracle mirrors it with a bit-shift sum). */
  def mortonInterleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      (shiftrightunsigned(x.cast("long"), i) % 2) * (1L << (2 * i)) +
        (shiftrightunsigned(y.cast("long"), i) % 2) * (1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Order-sensitive rolling fingerprint of a token array:
    * `acc = (acc * 31 + md5Long(token)) mod 1e9+7`, seeded with 0.
    * All intermediates stay < 2^61, so no overflow on LongType.
    */
  def rollingFingerprint(toks: Column, mod: Long = 1000000007L): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * 31 + md5Long(t)) % mod)

  /** Dot product of two equal-length numeric arrays, accumulated left-to-right
    * in double precision (deterministic: same adds in the same order on every
    * engine/run). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
}
