package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers the custom Catalyst expressions
  * with every session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the public
  * SparkSessionExtensions mechanism — no internal registries touched).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Builder with an arity gate: a SQL call with the wrong argument
    * count gets "`name` expects N arguments, got M" at analysis time,
    * not a raw IndexOutOfBoundsException from `children(i)` (and extra
    * arguments are rejected, not silently ignored). */
  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${children.length}")
      f(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      arity("float_dot", 2)(c => FloatDotProduct(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("float_dist_sq"),
      new ExpressionInfo(classOf[FloatDistSq].getName, "float_dist_sq"),
      arity("float_dist_sq", 2)(c => FloatDistSq(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
      arity("minhash_sig", 2)(c => MinhashSignature(c(0),
        TextHashes.litInt(c(1), "minhash_sig: numHashes")))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fps"),
      arity("winnow_fps", 3)(c => WinnowFingerprints(c(0),
        TextHashes.litInt(c(1), "winnow_fps: k"),
        TextHashes.litInt(c(2), "winnow_fps: w")))))
    ext.injectFunction((
      new FunctionIdentifier("oph_sig"),
      new ExpressionInfo(classOf[OphSignature].getName, "oph_sig"),
      arity("oph_sig", 2)(c => OphSignature(c(0),
        TextHashes.litInt(c(1), "oph_sig: numBins")))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFingerprint].getName, "simhash_fp"),
      arity("simhash_fp", 2)(c => SimhashFingerprint(c(0),
        TextHashes.litInt(c(1), "simhash_fp: numBits")))))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix_long"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix_long"),
      arity("md5_prefix_long", 2)(c => Md5PrefixLong(c(0),
        TextHashes.litInt(c(1), "md5_prefix_long: nBytes")))))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix_array"),
      new ExpressionInfo(classOf[Md5PrefixArray].getName, "md5_prefix_array"),
      arity("md5_prefix_array", 2)(c => Md5PrefixArray(c(0),
        TextHashes.litInt(c(1), "md5_prefix_array: nBytes")))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_hashes"),
      new ExpressionInfo(classOf[KgramHashes].getName, "kgram_hashes"),
      arity("kgram_hashes", 3)(c => KgramHashes(c(0),
        TextHashes.litInt(c(1), "kgram_hashes: k"),
        TextHashes.litInt(c(2), "kgram_hashes: nBytes")))))
    ext.injectFunction((
      new FunctionIdentifier("chargram_bucket_counts"),
      new ExpressionInfo(classOf[ChargramBucketCounts].getName,
        "chargram_bucket_counts"),
      arity("chargram_bucket_counts", 5)(c => ChargramBucketCounts(c(0),
        TextHashes.litInt(c(1), "chargram_bucket_counts: kMin"),
        TextHashes.litInt(c(2), "chargram_bucket_counts: kMax"),
        TextHashes.litInt(c(3), "chargram_bucket_counts: buckets"),
        TextHashes.litInt(c(4), "chargram_bucket_counts: nBytes")))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_bucket_counts"),
      new ExpressionInfo(classOf[KgramBucketCounts].getName,
        "kgram_bucket_counts"),
      arity("kgram_bucket_counts", 4)(c => KgramBucketCounts(c(0),
        TextHashes.litInt(c(1), "kgram_bucket_counts: maxGram"),
        TextHashes.litInt(c(2), "kgram_bucket_counts: buckets"),
        TextHashes.litInt(c(3), "kgram_bucket_counts: nBytes")))))
    ext.injectFunction((
      new FunctionIdentifier("hashed_embedding_vec"),
      new ExpressionInfo(classOf[HashedEmbeddingVec].getName,
        "hashed_embedding_vec"),
      arity("hashed_embedding_vec", 2)(c => HashedEmbeddingVec(c(0),
        TextHashes.litInt(c(1), "hashed_embedding_vec: dim")))))
    ext.injectFunction((
      new FunctionIdentifier("chargram_strings"),
      new ExpressionInfo(classOf[ChargramStrings].getName, "chargram_strings"),
      arity("chargram_strings", 2)(c => ChargramStrings(c(0),
        TextHashes.litInt(c(1), "chargram_strings: k")))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      arity("sorted_intersect_count", 2)(c =>
        SortedIntersectCount(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("mat_vec_affine"),
      new ExpressionInfo(classOf[MatVecAffine].getName, "mat_vec_affine"),
      arity("mat_vec_affine", 2)(c => MatVecAffine(c(0),
        TextHashes.litString(c(1), "mat_vec_affine: model")))))
    ext.injectFunction((
      new FunctionIdentifier("outer_upper"),
      new ExpressionInfo(classOf[OuterUpper].getName, "outer_upper"),
      arity("outer_upper", 1)(c => OuterUpper(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      arity("nfc_normalize", 1)(c => NfcNormalize(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("bitset_pack"),
      new ExpressionInfo(classOf[BitsetPack].getName, "bitset_pack"),
      arity("bitset_pack", 2)(c => BitsetPack(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("bitset_count_set"),
      new ExpressionInfo(classOf[BitsetCountSet].getName, "bitset_count_set"),
      arity("bitset_count_set", 2)(c => BitsetCountSet(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_atleast"),
      new ExpressionInfo(classOf[SortedIntersectAtLeast].getName,
        "sorted_intersect_atleast"),
      arity("sorted_intersect_atleast", 3)(c =>
        SortedIntersectAtLeast(c(0), c(1), c(2)))))
    ext.injectFunction((
      new FunctionIdentifier("sq_adist"),
      new ExpressionInfo(classOf[SqAdist].getName, "sq_adist"),
      arity("sq_adist", 4)(c => SqAdist(c(0), c(1), c(2), c(3)))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_segment"),
      new ExpressionInfo(classOf[BpeSegment].getName, "bpe_segment"),
      arity("bpe_segment", 2)(c => BpeSegment(c(0),
        TextHashes.litString(c(1), "bpe_segment: merges")))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode_ids"),
      new ExpressionInfo(classOf[BpeEncodeIds].getName, "bpe_encode_ids"),
      arity("bpe_encode_ids", 3)(c => BpeEncodeIds(c(0),
        TextHashes.litString(c(1), "bpe_encode_ids: merges"),
        TextHashes.litString(c(2), "bpe_encode_ids: vocab")))))
    ext.injectFunction((
      new FunctionIdentifier("unigram_segment"),
      new ExpressionInfo(classOf[UnigramSegment].getName, "unigram_segment"),
      arity("unigram_segment", 3)(c => UnigramSegment(c(0),
        TextHashes.litString(c(1), "unigram_segment: pieces"),
        TextHashes.litDouble(c(2), "unigram_segment: unkScore")))))
    ext.injectFunction((
      new FunctionIdentifier("wordpiece_segment"),
      new ExpressionInfo(classOf[WordpieceSegment].getName,
        "wordpiece_segment"),
      arity("wordpiece_segment", 3)(c => WordpieceSegment(c(0),
        TextHashes.litString(c(1), "wordpiece_segment: vocab"),
        TextHashes.litInt(c(2), "wordpiece_segment: maxInputChars")))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_hashes_all"),
      new ExpressionInfo(classOf[KgramHashesAll].getName, "kgram_hashes_all"),
      arity("kgram_hashes_all", 3)(c => KgramHashesAll(c(0),
        TextHashes.litInt(c(1), "kgram_hashes_all: k"),
        TextHashes.litInt(c(2), "kgram_hashes_all: nBytes")))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_roll_hashes_all"),
      new ExpressionInfo(classOf[KgramRollHashesAll].getName,
        "kgram_roll_hashes_all"),
      arity("kgram_roll_hashes_all", 2)(c => KgramRollHashesAll(c(0),
        TextHashes.litInt(c(1), "kgram_roll_hashes_all: k")))))
    ext.injectFunction((
      new FunctionIdentifier("word_spans"),
      new ExpressionInfo(classOf[WordSpans].getName, "word_spans"),
      arity("word_spans", 1)(c => WordSpans(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("any_in_sorted"),
      new ExpressionInfo(classOf[AnyInSorted].getName, "any_in_sorted"),
      arity("any_in_sorted", 2)(c => AnyInSorted(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("positions_in_sorted"),
      new ExpressionInfo(classOf[PositionsInSorted].getName,
        "positions_in_sorted"),
      arity("positions_in_sorted", 2)(c => PositionsInSorted(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("gopher_repetition"),
      new ExpressionInfo(classOf[GopherRepetition].getName,
        "gopher_repetition"),
      arity("gopher_repetition", 1)(c => GopherRepetition(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("sentence_chunk_spans"),
      new ExpressionInfo(classOf[SentenceChunkSpans].getName,
        "sentence_chunk_spans"),
      arity("sentence_chunk_spans", 3)(c => SentenceChunkSpans(c(0),
        TextHashes.litInt(c(1), "sentence_chunk_spans: chunkWords"),
        TextHashes.litInt(c(2), "sentence_chunk_spans: overlapWords")))))
    ext.injectFunction((
      new FunctionIdentifier("jl_project"),
      new ExpressionInfo(classOf[JlProject].getName, "jl_project"),
      arity("jl_project", 3)(c => JlProject(c(0),
        TextHashes.litInt(c(1), "jl_project: dim"),
        TextHashes.litInt(c(2), "jl_project: outDim")))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_strings"),
      new ExpressionInfo(classOf[KgramStrings].getName, "kgram_strings"),
      arity("kgram_strings", 2)(c => KgramStrings(c(0),
        TextHashes.litInt(c(1), "kgram_strings: k")))))
  }
}
