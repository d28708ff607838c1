package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns as pure
  * Column expressions (`zip_with`/`aggregate` — codegen'd, row-local).
  * Floats are widened element-wise to double before any arithmetic and
  * folded left-to-right, so results are bit-reproducible across
  * engines. */
object VectorFunctions {

  private def sumFold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    sumFold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(sumFold(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Signed projection against a constant hyperplane (for LSH). */
  def dotConst(a: Column, plane: Array[Double]): Column =
    sumFold(zip_with(a, array(plane.map(lit).toSeq: _*),
      (x, p) => x.cast("double") * p))

  /** Squared L2 distance to a constant centroid (for IVF assignment). */
  def l2sqConst(a: Column, cent: Array[Double]): Column =
    sumFold(zip_with(a, array(cent.map(lit).toSeq: _*),
      (x, c) => (x.cast("double") - c) * (x.cast("double") - c)))
}
