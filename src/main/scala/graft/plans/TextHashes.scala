package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hashing kernels for the dedup/curation pipeline.
  *
  * Every document-pipeline hash in this engine is an md5 *prefix* parsed
  * as an unsigned integer — the one hash both Spark and DuckDB compute
  * bit-identically, so the driver's oracle gate can check the operators
  * end-to-end (`CAST('0x' || substr(md5(s), 1, 2n) AS BIGINT)` on the
  * DuckDB side). The Column spelling of that formula,
  * `conv(substring(md5(c), 1, 2n), 16, 10).cast(LongType)`, pays for a
  * 32-char hex string, a substring copy, and a base-16 string parse per
  * value on top of the digest itself — and the array variants
  * (per-token hashes, k-gram shingles) sit inside `transform(...)`
  * higher-order functions, which are CodegenFallback: interpreted
  * per-row with an intermediate Catalyst array per step.
  *
  * These expressions compute the identical values natively inside
  * whole-stage codegen: the digest is updated incrementally (no joined
  * k-gram string is ever materialized), the prefix is folded big-endian
  * straight off the digest bytes (no hex/`conv` round-trip), and the
  * k-gram kernels emit their whole output array in ONE traversal.
  * Value-compatibility with the Column spelling (and therefore with the
  * DuckDB oracles) is property-tested in TextHashesSpec.
  */
object TextHashes {
  /** Reusable per-thread digest: `MessageDigest.getInstance` per call
    * costs a provider lookup + allocation; executor threads are few. */
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First `nBytes` (≤ 7) of the md5 digest folded big-endian —
    * identical to parsing the first 2·nBytes hex chars as unsigned. */
  private def fold(digest: Array[Byte], nBytes: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v
  }

  def hashOne(s: UTF8String, nBytes: Int): Long = {
    val d = md.get()
    d.reset()
    fold(d.digest(s.getBytes), nBytes)
  }

  /** Per-element md5-prefix of a string array (the per-token hash
    * stage of SimHash): null elements stay null, mirroring
    * `transform(arr, w => conv(substring(md5(w), …)))`. */
  def hashArray(arr: ArrayData, nBytes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val d = md.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        d.reset()
        out(i) = fold(d.digest(arr.getUTF8String(i).getBytes), nBytes)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Space = Array[Byte](' ')

  /** Digest of words[i..i+k-1] joined by a single space, WITHOUT
    * materializing the joined string: the digest is updated part by
    * part. Byte-equivalent to md5 of `array_join(slice(ws,i+1,k)," ")`
    * because UTF-8 concatenation is byte concatenation — including
    * array_join's null handling (null elements are skipped, no
    * separator is emitted for them). */
  private def gramDigest(d: MessageDigest, arr: ArrayData, i: Int, k: Int): Array[Byte] = {
    d.reset()
    var j = 0
    var first = true
    while (j < k) {
      if (!arr.isNullAt(i + j)) {
        if (!first) d.update(Space)
        d.update(arr.getUTF8String(i + j).getBytes)
        first = false
      }
      j += 1
    }
    d.digest()
  }

  /** Distinct k-gram md5-prefix hashes of a words array in one pass —
    * value- and ORDER-identical (first occurrence wins) to
    * `array_distinct(transform(sequence(1, size-k+1),
    *   i => conv(substring(md5(array_join(slice(ws,i,k)," ")),1,2n),16,10)))`
    * for arrays with ≥ k elements; shorter arrays yield an empty array
    * (callers filter `size(ws) >= k`). Null words follow array_join
    * semantics: skipped, with no separator emitted for them. */
  def kgramHashes(arr: ArrayData, k: Int, nBytes: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val d = md.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i <= n - k) {
      val h = fold(gramDigest(d, arr, i, k), nBytes)
      if (seen.add(h)) out.add(h)
      i += 1
    }
    val res = new Array[Long](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    new GenericArrayData(res)
  }

  /** ALL k-gram md5-prefix hashes of a words array in ORDER, one per
    * window position (n−k+1 of them) — the NON-distinct sibling of
    * [[kgramHashes]] for bag-of-ngrams features (importance weighting
    * needs COUNTS; the dedup kernels deliberately drop repeats).
    * Value-identical to `transform(sequence(1, size-k+1),
    * i => conv(substring(md5(array_join(slice(ws,i,k)," ")),1,2n),16,10))`
    * for arrays with ≥ k elements; shorter arrays yield an empty
    * array. Null words follow array_join semantics. */
  def kgramHashesAll(arr: ArrayData, k: Int, nBytes: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val d = md.get()
    val res = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      res(i) = fold(gramDigest(d, arr, i, k), nBytes)
      i += 1
    }
    new GenericArrayData(res)
  }

  /** 2⁶¹ − 1, the Mersenne prime the rolling-hash kernels reduce by:
    * big enough that collisions are rarer than the 48-bit md5 prefixes
    * (61 vs 48 bits), small enough that a 128-bit product folds to a
    * residue with two shifts and an add. */
  val MersenneP: Long = (1L << 61) - 1

  /** Rolling-hash base (any value < P works; fixed so the DuckDB
    * oracle twins can splice the same powers). */
  val RollBase: Long = 1000003L

  /** a·b mod (2⁶¹−1) for a, b < 2⁶¹ — Mersenne folding of the 128-bit
    * product: x mod (2ᵏ−1) = (x >> k) + (x & (2ᵏ−1)), applied once
    * plus a bounded correction. */
  private[plans] def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) + (lo >>> 61)) + (lo & MersenneP)
    while (r >= MersenneP) r -= MersenneP
    r
  }

  /** Per-word 48-bit md5 prefixes of a words array — ONE digest per
    * word (null words hash 0), the shared first pass of every rolling
    * kernel. */
  private[plans] def wordHashes48(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val d = md.get()
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        d.reset()
        wh(i) = fold(d.digest(arr.getUTF8String(i).getBytes), 6)
      }
      i += 1
    }
    wh
  }

  /** All k-gram rolling hashes over precomputed word hashes — the
    * O(1)-slide polynomial combination mod 2⁶¹−1 shared by
    * [[kgramRollHashesAll]] and the Gopher repetition kernel (which
    * rolls NINE gram lengths over one word-hash pass). Empty result
    * for n < k. */
  private[plans] def rollHashes(wh: Array[Long], k: Int): Array[Long] = {
    val n = wh.length
    if (n < k) return Array.emptyLongArray
    var h = 0L
    var j = 0
    while (j < k) { h = (mulMod61(h, RollBase) + wh(j)) % MersenneP; j += 1 }
    val res = new Array[Long](n - k + 1)
    res(0) = h
    var bk1 = 1L
    j = 0
    while (j < k - 1) { bk1 = mulMod61(bk1, RollBase); j += 1 }
    var p = 1
    while (p <= n - k) {
      val dropped = (h - mulMod61(wh(p - 1), bk1) + MersenneP) % MersenneP
      h = (mulMod61(dropped, RollBase) + wh(p + k - 1)) % MersenneP
      res(p) = h
      p += 1
    }
    res
  }

  /** ALL k-gram ROLLING hashes of a words array in window order — the
    * O(n) sibling of [[kgramHashesAll]] for large k: that kernel
    * re-digests every word k times (each window md5s its full joined
    * text, ~k× redundant digest work — at the substring-dedup default
    * k = 50 the digest pass dominates the whole operator), while this
    * one md5s each word ONCE (the same 48-bit prefix convention as
    * every other kernel) and combines windows by a polynomial rolling
    * hash mod 2⁶¹−1: H(p) = Σⱼ h(w[p+j])·B^(k-1-j) mod P, slid in
    * O(1) per position. Exactly replayable in DuckDB with HUGEINT
    * arithmetic (per-word md5 prefix × spliced B-power literals,
    * summed mod P — the p56 oracle does). Values are NOT comparable
    * to [[kgramHashesAll]] output — callers pick one convention per
    * operator. Null words hash as 0 (producer contract is the
    * null-free `array_remove(split(..), '')` output). Arrays shorter
    * than k yield an empty array. */
  def kgramRollHashesAll(arr: ArrayData, k: Int): ArrayData = {
    if (arr.numElements() < k) return new GenericArrayData(Array.emptyLongArray)
    new GenericArrayData(rollHashes(wordHashes48(arr), k))
  }

  /** Distinct k-gram STRINGS of a words array in one pass — value- and
    * order-identical to `array_distinct(transform(sequence(1, size-k+1),
    * i => array_join(slice(ws,i,k)," ")))` for arrays with ≥ k
    * elements; shorter arrays yield an empty array. Used where the gram
    * itself is the join key (decontamination). */
  def kgramStrings(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i <= n - k) {
      // array_join semantics: null elements are skipped, separators
      // only between the elements actually joined
      var len = 0
      var parts = 0
      var j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) {
          len += arr.getUTF8String(i + j).numBytes(); parts += 1
        }
        j += 1
      }
      len += math.max(parts - 1, 0)
      val bytes = new Array[Byte](len)
      var pos = 0
      var first = true
      j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) {
          if (!first) { bytes(pos) = ' '; pos += 1 }
          val w = arr.getUTF8String(i + j)
          w.writeTo(java.nio.ByteBuffer.wrap(bytes, pos, w.numBytes()))
          pos += w.numBytes()
          first = false
        }
        j += 1
      }
      val g = UTF8String.fromBytes(bytes)
      if (seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct character k-grams of a string in one pass — value- and
    * order-identical (first occurrence wins) to
    * `array_distinct(transform(sequence(1, char_length(s)-k+1),
    *   i => substr(s, i, k)))` for strings with ≥ k characters; shorter
    * strings yield an empty array. Positions count CODE POINTS (like
    * `substr`/`length` on both engines); the char→byte boundary table
    * is computed once per row, so each gram is a plain byte slice. */
  def chargramStrings(s: UTF8String, k: Int): ArrayData = {
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes
    // offsets(c) = byte index where character c starts; offsets(nChars) = end.
    // The advance MUST be UTF8String's own table: numChars() counts an
    // invalid lead byte (bare continuation, overlong lead) as ONE char,
    // and a hand-rolled table that disagrees walks past the array on
    // malformed input — parquet/JSONL string columns are not validated
    // UTF-8, so one corrupt document must not kill the job
    val offsets = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(nChars) = bytes.length
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i <= nChars - k) {
      val from = offsets(i)
      val g = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, offsets(i + k)))
      if (seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-token [start, end) CODE-POINT offsets into the ORIGINAL
    * string, packed (start << 32) | end, for exactly the tokens
    * `array_remove(split(s, "\\s+"), "")` yields (maximal runs of
    * non-whitespace; whitespace = Java regex \s = ASCII
    * space/tab/LF/VT/FF/CR — split compiles WITHOUT
    * UNICODE_CHARACTER_CLASS, so U+00A0 etc. are token bytes, not
    * separators). One pass over the bytes; the char counter advances
    * by UTF8String's own lead-byte table (the chargramStrings rule:
    * malformed lead bytes count one char, never walk past the array).
    * Code-point offsets are the unit `substring`/`length` use on both
    * engines, so a caller can cite `substring(s, start+1, end-start)`
    * verbatim. */
  def wordSpans(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[java.lang.Long]()
    var b = 0
    var c = 0
    var start = -1
    while (b < bytes.length) {
      val lead = bytes(b)
      val w = UTF8String.numBytesForFirstByte(lead)
      val isWs = w == 1 && (lead == ' ' || lead == '\t' || lead == '\n' ||
        lead == 0x0B || lead == '\f' || lead == '\r')
      if (isWs) {
        if (start >= 0) {
          out.add((start.toLong << 32) | c.toLong)
          start = -1
        }
      } else if (start < 0) start = c
      b += w
      c += 1
    }
    if (start >= 0) out.add((start.toLong << 32) | c.toLong)
    val res = new Array[Long](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    new GenericArrayData(res)
  }

  /** True iff any non-null element of `arr` occurs in `set`, an
    * ASCENDING null-free long array — binary search per element, so a
    * doc with g grams probes a broadcast eval set of m hashes in
    * O(g log m) instead of the O(g + m) a per-row merge (or Spark's
    * `arrays_overlap`, which rebuilds a hash set from the smaller side
    * EVERY row) would pay. m is eval-suite-sized (easily 10⁵–10⁶ at
    * production scale) while g is one document — the log matters. */
  def anyInSorted(arr: ArrayData, set: ArrayData): Boolean = {
    val n = arr.numElements()
    val m = set.numElements()
    if (n == 0 || m == 0) return false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        var lo = 0
        var hi = m - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val sv = set.getLong(mid)
          if (sv == v) return true
          else if (sv < v) lo = mid + 1
          else hi = mid - 1
        }
      }
      i += 1
    }
    false
  }

  /** 0-based positions of the elements of `arr` that occur in `set`,
    * an ASCENDING null-free distinct long array (the [[anyInSorted]]
    * producer contract) — the span-granular sibling of
    * [[anyInSorted]]: redaction-style decontamination needs WHERE the
    * contaminated grams sit, not just whether any exists. Binary
    * search per element (O(g log m) per doc against a broadcast
    * eval-suite set); null elements never match. */
  def positionsInSorted(arr: ArrayData, set: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = set.numElements()
    if (n == 0 || m == 0) return new GenericArrayData(Array.emptyIntArray)
    val out = new java.util.ArrayList[java.lang.Integer]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        var lo = 0
        var hi = m - 1
        var found = false
        while (!found && lo <= hi) {
          val mid = (lo + hi) >>> 1
          val sv = set.getLong(mid)
          if (sv == v) found = true
          else if (sv < v) lo = mid + 1
          else hi = mid - 1
        }
        if (found) out.add(i)
      }
      i += 1
    }
    val res = new Array[Int](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    new GenericArrayData(res)
  }

  /** Sparse (bucket, count, total) rows from a dense long[] count
    * array — ascending bucket order, zero buckets omitted: exactly the
    * row set a `groupBy(bucket).count()` over the hashed gram stream
    * produces (group keys only exist where at least one gram landed),
    * with the per-doc gram total REPLICATED into every element so one
    * `explode` yields the full (b, cnt, doc_grams) feature row — no
    * scalar fold a projection could inline and re-evaluate per
    * exploded row (the r19 first-cut regression: an `aggregate(...)`
    * total alongside the explode collapsed into the post-Generate
    * projection and ran O(buckets) per OUTPUT row). */
  private def sparseCounts(counts: Array[Long]): ArrayData = {
    var nz = 0
    var total = 0L
    var b = 0
    while (b < counts.length) {
      if (counts(b) != 0L) { nz += 1; total += counts(b) }
      b += 1
    }
    val out = new Array[Any](nz)
    var j = 0
    b = 0
    while (b < counts.length) {
      if (counts(b) != 0L) {
        out(j) = org.apache.spark.sql.catalyst.InternalRow(
          b.toLong, counts(b), total)
        j += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed char-n-gram bucket counts in ONE pass — the fused kernel
    * behind [[graft.operators.QualityOps.hashedChargramFeatures]]:
    * per k in [kMin, kMax], the DISTINCT char k-grams of `s` (the
    * [[chargramStrings]] enumeration, first-occurrence dedup per k),
    * each hashed `md5_prefix_long(g, nBytes)` and bucketed
    * `pmod(h, buckets)`; output is the ascending sparse
    * (bucket, count) table — row-identical to
    * `explode(flatten(array(chargram_strings(s,k)…)))` →
    * `pmod(md5_prefix_long(g), buckets)` → `groupBy(b).count()`
    * for one document, with the explode row-stream and both
    * shuffles gone. */
  def chargramBucketCounts(s: UTF8String, kMin: Int, kMax: Int,
      buckets: Int, nBytes: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val nChars = s.numChars()
    val bytes = s.getBytes
    // char→byte boundary table once per row (the chargramStrings rule:
    // UTF8String's own lead-byte advance, malformed input never walks
    // past the array)
    val offsets = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(nChars) = bytes.length
    val d = md.get()
    var k = kMin
    while (k <= kMax) {
      if (nChars >= k) {
        val seen = new java.util.HashSet[UTF8String]()
        var i = 0
        while (i <= nChars - k) {
          val g = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, offsets(i), offsets(i + k)))
          if (seen.add(g)) {
            d.reset()
            val h = fold(d.digest(g.getBytes), nBytes)
            counts((h % buckets).toInt) += 1L
          }
          i += 1
        }
      }
      k += 1
    }
    sparseCounts(counts)
  }

  /** Hashed word-n-gram bucket counts in ONE pass — the fused kernel
    * behind [[graft.operators.QualityOps.hashedNgramFeatures]]: per k
    * in [1, maxGram], ALL word k-grams of `ws` (the [[kgramHashesAll]]
    * enumeration — every window position, repeats kept), each hashed
    * by the incremental space-joined digest and bucketed
    * `pmod(h, buckets)`; output is the ascending sparse
    * (bucket, count) table — row-identical to
    * `explode(flatten(array(kgram_hashes_all(ws,k,nBytes)…)))` →
    * `pmod(h, buckets)` → `groupBy(b).count()` for one document. */
  def kgramBucketCounts(arr: ArrayData, maxGram: Int, buckets: Int,
      nBytes: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val n = arr.numElements()
    val d = md.get()
    var k = 1
    while (k <= maxGram) {
      var i = 0
      while (i <= n - k) {
        val h = fold(gramDigest(d, arr, i, k), nBytes)
        counts((h % buckets).toInt) += 1L
        i += 1
      }
      k += 1
    }
    sparseCounts(counts)
  }

  /** The feature-hashing embedding in ONE pass — the fused kernel
    * behind [[graft.operators.AnnOps.hashedEmbedding]] (Weinberger'09,
    * single-hash ξ): per non-null token w, h = md5_prefix_long(w, 4)
    * supplies bucket h mod `dim` and sign from bit 31; cells
    * accumulate as exact integers, then each is normalized
    * `(v / √Σv²).toFloat` (the same double divide + RN float cast the
    * Column spelling performs; all-cancelled docs keep the all-zero
    * vector). Output is a 0-or-1-element OUTER array so one `explode`
    * both yields the embedding and drops token-less docs — exactly
    * the row set of the explode → (doc, bucket) sum(sign) → dense-ify
    * pipeline it replaces, with the two shuffles gone. Null tokens
    * are skipped (producer contract is the null-free
    * `array_remove(split(..), '')` output). */
  def hashedEmbeddingVec(arr: ArrayData, dim: Int): ArrayData = {
    val n = arr.numElements()
    val d = md.get()
    val v = new Array[Long](dim)
    var tokens = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        d.reset()
        val h = fold(d.digest(arr.getUTF8String(i).getBytes), 4)
        val s = if (((h >>> 31) & 1L) == 0L) 1L else -1L
        v((h % dim).toInt) += s
        tokens += 1
      }
      i += 1
    }
    if (tokens == 0) return new GenericArrayData(Array.empty[Any])
    var n2 = 0L
    i = 0
    while (i < dim) { n2 += v(i) * v(i); i += 1 }
    val emb = new Array[Any](dim)
    if (n2 == 0L) {
      i = 0
      while (i < dim) { emb(i) = 0f; i += 1 }
    } else {
      val norm = java.lang.Math.sqrt(n2.toDouble)
      i = 0
      while (i < dim) { emb(i) = (v(i).toDouble / norm).toFloat; i += 1 }
    }
    new GenericArrayData(Array[Any](new GenericArrayData(emb)))
  }

  /** Shared literal-string extraction for the function builders. */
  private[plans] def litString(e: Expression, what: String): String = e match {
    case f if f.foldable => f.eval() match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$what must be a foldable string literal")
  }

  /** Shared literal-double extraction for the function builders (an
    * int literal widens — SQL callers write `-100000` unadorned). */
  private[plans] def litDouble(e: Expression, what: String): Double = e match {
    case f if f.foldable => f.eval() match {
      case d: Double => d
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$what must be a foldable numeric literal")
  }

  /** Shared literal-int extraction for the function builders. */
  private[plans] def litInt(e: Expression, what: String): Int = e match {
    case f if f.foldable => f.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an int literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$what must be a foldable int literal")
  }
}

/** `md5_prefix_long(str, nBytes)` — scalar md5-prefix hash. */
case class Md5PrefixLong(child: Expression, nBytes: Int)
    extends UnaryExpression {
  require(nBytes >= 1 && nBytes <= 7, s"nBytes must be in [1,7], got $nBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(input: Any): Any =
    TextHashes.hashOne(input.asInstanceOf[UTF8String], nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashOne($s, $nBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

/** `md5_prefix_array(arr, nBytes)` — per-element md5-prefix hash of a
  * string array in one codegen'd pass (replaces an interpreted
  * `transform`). */
case class Md5PrefixArray(child: Expression, nBytes: Int)
    extends UnaryExpression {
  require(nBytes >= 1 && nBytes <= 7, s"nBytes must be in [1,7], got $nBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_array requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_prefix_array"

  override def nullSafeEval(input: Any): Any =
    TextHashes.hashArray(input.asInstanceOf[ArrayData], nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashArray($arr, $nBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixArray =
    copy(child = newChild)
}

/** `kgram_hashes(ws, k, nBytes)` — distinct k-gram md5-prefix hashes in
  * one codegen'd pass (the shingle artifact of the LSH dedup family). */
case class KgramHashes(child: Expression, k: Int, nBytes: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  require(nBytes >= 1 && nBytes <= 7, s"nBytes must be in [1,7], got $nBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashes.kgramHashes(input.asInstanceOf[ArrayData], k, nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.kgramHashes($arr, $k, $nBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): KgramHashes =
    copy(child = newChild)
}

/** `chargram_strings(s, k)` — distinct character k-grams of a string in
  * one codegen'd pass (the per-document trigram set of character-n-gram
  * similarity operators). */
case class ChargramStrings(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chargram_strings requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chargram_strings"

  override def nullSafeEval(input: Any): Any =
    TextHashes.chargramStrings(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.chargramStrings($s, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): ChargramStrings =
    copy(child = newChild)
}

/** `kgram_hashes_all(ws, k, nBytes)` — ALL k-gram md5-prefix hashes in
  * window order, repeats kept (the bag-of-ngrams feature kernel —
  * importance weighting counts occurrences; `kgram_hashes` dedups). */
case class KgramHashesAll(child: Expression, k: Int, nBytes: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  require(nBytes >= 1 && nBytes <= 7, s"nBytes must be in [1,7], got $nBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes_all requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes_all"

  override def nullSafeEval(input: Any): Any =
    TextHashes.kgramHashesAll(input.asInstanceOf[ArrayData], k, nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.kgramHashesAll($arr, $k, $nBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): KgramHashesAll =
    copy(child = newChild)
}

/** `kgram_roll_hashes_all(ws, k)` — ALL k-gram ROLLING hashes in
  * window order (see [[TextHashes.kgramRollHashesAll]]): each word
  * md5'd once, windows combined by a polynomial hash mod 2⁶¹−1 slid
  * in O(1) — the O(n) positioned-gram kernel for LARGE k, where
  * [[KgramHashesAll]]'s per-window digests are ~k× redundant. */
case class KgramRollHashesAll(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_roll_hashes_all requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_roll_hashes_all"

  override def nullSafeEval(input: Any): Any =
    TextHashes.kgramRollHashesAll(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.kgramRollHashesAll($arr, $k);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): KgramRollHashesAll =
    copy(child = newChild)
}

/** `word_spans(s)` — packed (start << 32) | end code-point spans of the
  * whitespace tokens of `s` (see [[TextHashes.wordSpans]]): the
  * original-document offsets a chunking/citation operator needs,
  * computed in the same single codegen'd pass the other text kernels
  * use. Aligned 1:1 with `array_remove(split(s, "\\s+"), "")`. */
case class WordSpans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_spans requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_spans"

  override def nullSafeEval(input: Any): Any =
    TextHashes.wordSpans(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.wordSpans($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordSpans =
    copy(child = newChild)
}

/** `any_in_sorted(hashes, sorted_set)` — true iff any non-null element
  * of `hashes` occurs in `sorted_set`, which must be an ASCENDING,
  * null-free, distinct long array (e.g. `sort_array(collect_set(h))`
  * over a bounded side — the violation mode is silent false negatives,
  * so the contract sits on the producer). The membership kernel of
  * broadcast-set decontamination: the set arrives as a one-row
  * broadcast column, each corpus row probes it by binary search —
  * O(g log m) per doc, no per-row set build, no shuffle. */
case class AnyInSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "any_in_sorted requires (array<bigint>, array<bigint>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "any_in_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.anyInSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.anyInSorted($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AnyInSorted =
    copy(left = newLeft, right = newRight)
}

/** `positions_in_sorted(hashes, sorted_set)` — 0-based positions of
  * the elements of `hashes` present in `sorted_set` (ASCENDING,
  * null-free, distinct — the [[AnyInSorted]] producer contract). The
  * excision kernel of span-granular decontamination: each matched
  * position marks a word window to cut, computed map-side against the
  * one-row broadcast eval set — no explode, no join, no shuffle. */
case class PositionsInSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "positions_in_sorted requires (array<bigint>, array<bigint>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "positions_in_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.positionsInSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.positionsInSorted($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PositionsInSorted =
    copy(left = newLeft, right = newRight)
}

/** `kgram_strings(ws, k)` — distinct k-gram strings in one codegen'd
  * pass (where the gram itself is the join key). */
case class KgramStrings(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_strings requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kgram_strings"

  override def nullSafeEval(input: Any): Any =
    TextHashes.kgramStrings(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.kgramStrings($arr, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): KgramStrings =
    copy(child = newChild)
}

/** `chargram_bucket_counts(s, kMin, kMax, buckets, nBytes)` — hashed
  * char-n-gram features for one document in ONE codegen'd pass (see
  * [[TextHashes.chargramBucketCounts]]): ascending sparse
  * (b, cnt, doc_grams) rows over the distinct char k-grams, k ∈
  * [kMin, kMax], the per-doc total replicated per element so ONE
  * explode yields the whole feature row. Row-identical to the
  * explode → md5 → pmod → groupBy(doc, b) → totals-join pipeline it
  * replaces, with no per-gram row stream and no shuffle. */
case class ChargramBucketCounts(child: Expression, kMin: Int, kMax: Int,
    buckets: Int, nBytes: Int) extends UnaryExpression {
  require(kMin >= 1 && kMax >= kMin,
    s"need 1 <= kMin <= kMax, got kMin=$kMin kMax=$kMax")
  require(buckets >= 2 && buckets <= (1 << 22),
    s"buckets must be in [2, 2^22], got $buckets")
  require(nBytes >= 1 && nBytes <= 7, s"nBytes must be in [1,7], got $nBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chargram_bucket_counts requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("doc_grams", LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "chargram_bucket_counts"

  override def nullSafeEval(input: Any): Any =
    TextHashes.chargramBucketCounts(input.asInstanceOf[UTF8String],
      kMin, kMax, buckets, nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.chargramBucketCounts($s, $kMin, $kMax, $buckets, $nBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): ChargramBucketCounts =
    copy(child = newChild)
}

/** `kgram_bucket_counts(ws, maxGram, buckets, nBytes)` — hashed
  * word-n-gram features for one document in ONE codegen'd pass (see
  * [[TextHashes.kgramBucketCounts]]): ascending sparse
  * (b, cnt, doc_grams) rows over ALL word k-grams, k ∈ [1, maxGram],
  * repeats kept, the per-doc total replicated per element so ONE
  * explode yields the whole feature row. */
case class KgramBucketCounts(child: Expression, maxGram: Int,
    buckets: Int, nBytes: Int) extends UnaryExpression {
  require(maxGram >= 1, s"maxGram must be >= 1, got $maxGram")
  require(buckets >= 2 && buckets <= (1 << 22),
    s"buckets must be in [2, 2^22], got $buckets")
  require(nBytes >= 1 && nBytes <= 7, s"nBytes must be in [1,7], got $nBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_bucket_counts requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("doc_grams", LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "kgram_bucket_counts"

  override def nullSafeEval(input: Any): Any =
    TextHashes.kgramBucketCounts(input.asInstanceOf[ArrayData],
      maxGram, buckets, nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.kgramBucketCounts($arr, $maxGram, $buckets, $nBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): KgramBucketCounts =
    copy(child = newChild)
}

/** `hashed_embedding_vec(ws, dim)` — the complete feature-hashing
  * embedding for one document in ONE codegen'd pass (see
  * [[TextHashes.hashedEmbeddingVec]]): a 0-or-1-element outer array
  * holding the L2-normalized length-`dim` float vector (Weinberger'09
  * single-hash ξ — bucket h mod dim, sign from bit 31 of the same
  * 32-bit md5 prefix), empty for token-less docs so one `explode`
  * replicates the old pipeline's row set exactly. */
case class HashedEmbeddingVec(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2 && dim <= 4096, s"dim must be in [2, 4096], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_embedding_vec requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false),
    containsNull = false)
  override def prettyName: String = "hashed_embedding_vec"

  override def nullSafeEval(input: Any): Any =
    TextHashes.hashedEmbeddingVec(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = TextHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashedEmbeddingVec($arr, $dim);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedEmbeddingVec =
    copy(child = newChild)
}
