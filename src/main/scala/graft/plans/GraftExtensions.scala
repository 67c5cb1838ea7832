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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) =>
        FloatDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("float_dist_sq"),
      new ExpressionInfo(classOf[FloatDistSq].getName, "float_dist_sq"),
      (children: Seq[Expression]) =>
        FloatDistSq(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinhashSignature(children(0),
          TextHashes.litInt(children(1), "minhash_sig: numHashes"))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFingerprint].getName, "simhash_fp"),
      (children: Seq[Expression]) =>
        SimhashFingerprint(children(0),
          TextHashes.litInt(children(1), "simhash_fp: numBits"))))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix_long"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix_long"),
      (children: Seq[Expression]) =>
        Md5PrefixLong(children(0),
          TextHashes.litInt(children(1), "md5_prefix_long: nBytes"))))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix_array"),
      new ExpressionInfo(classOf[Md5PrefixArray].getName, "md5_prefix_array"),
      (children: Seq[Expression]) =>
        Md5PrefixArray(children(0),
          TextHashes.litInt(children(1), "md5_prefix_array: nBytes"))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_hashes"),
      new ExpressionInfo(classOf[KgramHashes].getName, "kgram_hashes"),
      (children: Seq[Expression]) =>
        KgramHashes(children(0),
          TextHashes.litInt(children(1), "kgram_hashes: k"),
          TextHashes.litInt(children(2), "kgram_hashes: nBytes"))))
    ext.injectFunction((
      new FunctionIdentifier("chargram_strings"),
      new ExpressionInfo(classOf[ChargramStrings].getName, "chargram_strings"),
      (children: Seq[Expression]) =>
        ChargramStrings(children(0),
          TextHashes.litInt(children(1), "chargram_strings: k"))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("kgram_strings"),
      new ExpressionInfo(classOf[KgramStrings].getName, "kgram_strings"),
      (children: Seq[Expression]) =>
        KgramStrings(children(0),
          TextHashes.litInt(children(1), "kgram_strings: k"))))
  }
}
