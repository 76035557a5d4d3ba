package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics pinned by FIXTURES.md §B / SURVEY.md §5:
  * identical => 1.0, orthogonal => 0.0, anti-parallel => -1.0,
  * zero vector => NaN (TensorPrimitives 0/0 semantics), null => null. */
class VectorFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import VectorFunctions._

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))

  private def df(a: Seq[Float], b: Seq[Float]) =
    spark.createDataFrame(
      java.util.List.of(Row(a, b)), schema)

  private def score(a: Seq[Float], b: Seq[Float]): Double =
    df(a, b).select(cosineSim(col("a"), col("b"))).head.getDouble(0)

  test("cosine of identical vectors is 1.0") {
    assert(math.abs(score(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0.0") {
    assert(score(Seq(1f, 0f), Seq(0f, 1f)) == 0.0)
  }

  test("cosine of anti-parallel vectors is -1.0") {
    assert(math.abs(score(Seq(1f, 2f), Seq(-1f, -2f)) + 1.0) < 1e-12)
  }

  test("cosine with zero vector is NaN") {
    assert(score(Seq(0f, 0f), Seq(1f, 2f)).isNaN)
  }

  test("cosine scale invariance: cos(av, bw) == cos(v, w) for a,b > 0") {
    val base = score(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
    val scaled = score(Seq(2f, 4f, 6f), Seq(12f, 15f, 18f))
    assert(math.abs(base - scaled) < 1e-9)
  }

  test("null input yields null (nullIntolerant)") {
    val r = df(Seq(1f, 2f), null)
      .select(cosineSim(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("interpreted eval path (nullSafeEval) matches codegen") {
    val lit = (xs: Seq[Float]) => Literal.create(xs, ArrayType(FloatType))
    val v = CosineSimilarity(lit(Seq(1f, 2f, 3f)), lit(Seq(4f, 5f, 6f)))
      .eval(null).asInstanceOf[Double]
    assert(math.abs(v - score(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))) < 1e-15)
  }

  test("dot product and norms") {
    val d = df(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)).select(
      dotProduct(col("a"), col("b")).as("dot"),
      l2Norm(col("a")).as("na"),
      l2Distance(col("a"), col("b")).as("dist")).head
    assert(d.getDouble(0) == 32.0)
    assert(math.abs(d.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(d.getDouble(2) - math.sqrt(27.0)) < 1e-12)
  }

  test("simhash_bands: interpreted eval matches codegen, keys well-formed") {
    val emb = Seq.tabulate(64)(i => math.sin(i * 1.7 + 0.3).toFloat)
    val expr = SimHashBands(
      Literal.create(emb, ArrayType(FloatType)), seed = 42L, bandBits = 7, numBands = 96)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val codegen = df(emb, emb)
      .select(simhashBands(col("a"), 42L, 7, 96).as("bands"))
      .head.getSeq[Long](0).toArray
    assert(interp.sameElements(codegen))
    assert(interp.length == 96)
    // element t carries band id t in its high bits and a 7-bit key below
    interp.zipWithIndex.foreach { case (key, t) =>
      assert(key >>> 7 == t.toLong, s"band $t key $key")
      assert((key & 0x7fL) == (key & ((1L << 7) - 1)))
    }
  }

  test("simhash_bands is scale-invariant and deterministic across rows") {
    val emb = Seq.tabulate(64)(i => math.cos(i * 0.9).toFloat)
    val scaled = emb.map(_ * 17.5f)
    val r = df(emb, scaled).select(
      simhashBands(col("a"), 42L, 7, 96).as("ba"),
      simhashBands(col("b"), 42L, 7, 96).as("bb")).head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("sign_pack: known bit pattern, interpreted matches codegen") {
    // dims 0,2,5 positive; zero and negative dims quantize to 0
    val emb = Seq(1f, -1f, 0.5f, 0f, -0.25f, 3f)
    val expected = (1L << 0) | (1L << 2) | (1L << 5)
    val interp = SignPack(Literal.create(emb, ArrayType(FloatType)))
      .eval(null).asInstanceOf[Long]
    val codegen = df(emb, emb)
      .select(signPack(col("a"))).head.getLong(0)
    assert(interp == expected)
    assert(codegen == expected)
  }

  test("sign_pack caps at 64 dims and fills bit 63") {
    val emb = Seq.fill(65)(1f) // dim 64 must be ignored, bits 0..63 set
    val v = df(emb, emb).select(signPack(col("a"))).head.getLong(0)
    assert(v == -1L) // all 64 bits set
  }

  test("sign_pack null propagates; hamming via bit_count(^) counts sign flips") {
    val a = Seq.tabulate(64)(i => math.sin(i * 1.3 + 0.1).toFloat)
    val b = a.updated(3, -a(3)).updated(17, -a(17)).updated(40, -a(40))
    val ham = df(a, b)
      .select(signPack(col("a")).as("pa"), signPack(col("b")).as("pb"))
      .selectExpr("bit_count(pa ^ pb) AS ham").head.getInt(0)
    assert(ham == 3)
    val nullRow = df(Seq(1f, 2f), null).select(signPack(col("b"))).head
    assert(nullRow.isNullAt(0))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    df(Seq(1f, 0f), Seq(1f, 0f)).createOrReplaceTempView("vf_test")
    val v = spark.sql("SELECT cosine_similarity(a, b) FROM vf_test").head.getDouble(0)
    assert(v == 1.0)
  }
}
