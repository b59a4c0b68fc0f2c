package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the custom Catalyst expressions in this package.
  * Each is the exact scalar semantics of a higher-order-function pipeline
  * the engine previously interpreted lambda-by-lambda — same element
  * order, same arithmetic, bit-identical results (the DuckDB oracles
  * replicate these folds, so bit-parity is load-bearing).
  */
object PolyHash {
  val P = 1000000007L
  val M = 131L

  /** fold(0, cp => (acc*131 + cp) mod P) over code points
    * (≙ aggregate(transform(regexp_extract_all(s,'(?s).'), ascii), ...)).
    */
  def base(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * M + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** 131^len(s) mod P (len in code points). */
  def pow(s: UTF8String): Long = {
    val str = s.toString
    var acc = 1L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * M) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

object VectorKernels {

  /** Sequential left-to-right dot product of two float arrays in double
    * precision (≙ aggregate(zip_with(a,b,(x,y)->x*y), 0.0, +)).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = acc + a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** cosine = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) with the same
    * association as the fold-based form.
    */
  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
}
