package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property tests for the vector kernels (SURVEY §5), evaluated directly
 * through the expressions' eval path (no Spark session): symmetry, self
 * similarity, scale invariance, norm/distance consistency.
 */
object VectorProps extends Properties("vector-kernels") {

  private val dimGen = Gen.choose(1, 64)
  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.choose(-100f, 100f))
  private val pairGen: Gen[(Array[Float], Array[Float])] =
    dimGen.flatMap(d => vecGen(d).flatMap(a => vecGen(d).map(b => (a, b))))

  private def eval2(mk: (Literal, Literal) => Any, a: Array[Float], b: Array[Float]): Double = {
    val la = Literal(ArrayData.toArrayData(a),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val lb = Literal(ArrayData.toArrayData(b),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    mk(la, lb).asInstanceOf[Double]
  }

  private def cos(a: Array[Float], b: Array[Float]): Double =
    eval2((x, y) => CosineSimilarity(x, y).eval(null), a, b)
  private def dot(a: Array[Float], b: Array[Float]): Double =
    eval2((x, y) => DotProduct(x, y).eval(null), a, b)
  private def dist(a: Array[Float], b: Array[Float]): Double =
    eval2((x, y) => L2Distance(x, y).eval(null), a, b)
  private def norm(a: Array[Float]): Double = {
    val la = Literal(ArrayData.toArrayData(a),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    L2Norm(la).eval(null).asInstanceOf[Double]
  }

  private def nonZero(v: Array[Float]): Boolean = norm(v) > 1e-3

  property("cosine symmetry") = forAll(pairGen) { case (a, b) =>
    cos(a, b) == cos(b, a) || (cos(a, b).isNaN && cos(b, a).isNaN)
  }

  property("cos(v, v) ~= 1 for nonzero v") = forAll(dimGen.flatMap(vecGen)) { v =>
    !nonZero(v) || math.abs(cos(v, v) - 1.0) < 1e-9
  }

  property("|cos| <= 1 + eps") = forAll(pairGen) { case (a, b) =>
    val c = cos(a, b); c.isNaN || math.abs(c) <= 1.0 + 1e-9
  }

  property("scale invariance: cos(k*a, b) ~= cos(a, b) for k > 0") =
    forAll(pairGen, Gen.choose(0.1f, 10f)) { case ((a, b), k) =>
      val scaled = a.map(x => x * k)
      !(nonZero(a) && nonZero(b) && nonZero(scaled)) ||
        math.abs(cos(scaled, b) - cos(a, b)) < 1e-4
    }

  property("dot symmetry") = forAll(pairGen) { case (a, b) => dot(a, b) == dot(b, a) }

  property("cos = dot / (|a|*|b|)") = forAll(pairGen) { case (a, b) =>
    !(nonZero(a) && nonZero(b)) || {
      val expect = dot(a, b) / (norm(a) * norm(b))
      math.abs(cos(a, b) - expect) < 1e-9
    }
  }

  property("dist(v, v) == 0, dist symmetric, dist >= 0") = forAll(pairGen) { case (a, b) =>
    dist(a, a) == 0.0 && dist(a, b) == dist(b, a) && dist(a, b) >= 0.0
  }

  property("norm(v) == dist(v, 0)") = forAll(dimGen.flatMap(vecGen)) { v =>
    math.abs(norm(v) - dist(v, Array.fill(v.length)(0f))) < 1e-9
  }

  property("interpreted == hand-rolled double reference") = forAll(pairGen) { case (a, b) =>
    val n = a.length
    var d = 0.0; var nx = 0.0; var ny = 0.0
    for (i <- 0 until n) {
      d += a(i).toDouble * b(i).toDouble
      nx += a(i).toDouble * a(i).toDouble
      ny += b(i).toDouble * b(i).toDouble
    }
    val expect = d / (math.sqrt(nx) * math.sqrt(ny))
    val got = cos(a, b)
    (expect.isNaN && got.isNaN) || got == expect
  }
}
