package graft.functions

import graft.SparkSuite
import graft.functions.{VectorFunctions => V}

/** IEEE binary16 conversion semantics ([[Fp16]]) — golden bit
  * patterns from the IEEE 754-2019 binary16 definition, plus the
  * rounding/idempotence/monotonicity properties the q_f16_* oracles
  * rely on.
  */
class Fp16Spec extends SparkSuite {
  import spark.implicits._

  private def enc(f: Float): Int = Fp16.floatToHalf(f) & 0xffff
  private def dec(h: Int): Float = Fp16.halfToFloat(h.toShort)

  test("golden encodes: exact powers, extremes, signed zero") {
    assert(enc(0.0f) === 0x0000)
    assert(enc(-0.0f) === 0x8000)
    assert(enc(1.0f) === 0x3c00)
    assert(enc(-1.0f) === 0xbc00)
    assert(enc(0.5f) === 0x3800)
    assert(enc(2.0f) === 0x4000)
    assert(enc(65504f) === 0x7bff) // largest finite half
    assert(enc(6.103515625e-5f) === 0x0400) // 2^-14, smallest normal
    assert(enc(5.9604645e-8f) === 0x0001) // 2^-24, smallest subnormal
    assert(enc(Float.PositiveInfinity) === 0x7c00)
    assert(enc(Float.NegativeInfinity) === 0xfc00)
    assert(enc(Float.NaN) === 0x7e00)
  }

  test("round-to-nearest-even at ties; overflow and underflow edges") {
    // 1 + 2^-11 is exactly midway between 0x3c00 and 0x3c01 -> even
    assert(enc(1.0f + math.pow(2, -11).toFloat) === 0x3c00)
    // 1 + 3*2^-11 is midway between 0x3c01 and 0x3c02 -> even (up)
    assert(enc(1.0f + 3 * math.pow(2, -11).toFloat) === 0x3c02)
    // 65520 is midway between 65504 (0x7bff) and 65536 -> even = 2048
    // -> carries out of the mantissa into the Inf encoding
    assert(enc(65520f) === 0x7c00)
    assert(enc(65519f) === 0x7bff)
    assert(enc(-65520f) === 0xfc00)
    // 2^-25 is midway between 0 and the smallest subnormal -> even = 0
    assert(enc(math.pow(2, -25).toFloat) === 0x0000)
    assert(enc(1.5f * math.pow(2, -25).toFloat) === 0x0001)
    // below half of the smallest subnormal: flush to signed zero
    assert(enc(1e-9f) === 0x0000)
    assert(enc(-1e-9f) === 0x8000)
  }

  test("decode goldens and roundtrip exactness of decode∘encode∘decode") {
    assert(dec(0x3c00) === 1.0f)
    assert(dec(0x7bff) === 65504f)
    assert(dec(0x0400) === 6.103515625e-5f)
    assert(dec(0x0001) === 5.9604645e-8f)
    assert(dec(0x7c00) === Float.PositiveInfinity)
    assert(dec(0xfc00) === Float.NegativeInfinity)
    assert(dec(0x7e01).isNaN)
    // every non-NaN half value decodes to a float that encodes back to
    // the SAME bits (half values are exactly representable in float32)
    var h = 0
    while (h <= 0xffff) {
      val f = dec(h)
      if (!f.isNaN) assert(enc(f) === h, s"bits 0x${h.toHexString}")
      h += 1
    }
  }

  test("rounding error bound and monotonicity over a dense value sweep") {
    val rnd = new scala.util.Random(7)
    val xs = (Array.tabulate(20000)(i =>
      (rnd.nextFloat() - 0.5f) * math.pow(2, rnd.nextInt(36) - 18).toFloat)
      ++ Array(0f, -0f, 1f, -1f, 65504f, -65504f))
    for (x <- xs) {
      val y = dec(enc(x))
      val ax = math.abs(x)
      if (ax >= math.pow(2, -14) && ax <= 65504f)
        assert(math.abs(y - x) <= math.pow(2, -11) * ax,
          s"normal-range relative error too large at $x -> $y")
      else if (ax < math.pow(2, -14))
        assert(math.abs(y - x) <= math.pow(2, -25).toFloat,
          s"subnormal absolute error too large at $x -> $y")
    }
    // quantization is monotone: sorting inputs sorts decodes
    val sorted = xs.filter(f => math.abs(f) <= 65504f).sorted
    val decs = sorted.map(f => dec(enc(f)))
    assert(decs.zip(decs.tail).forall { case (a, b) => a <= b },
      "fp16 quantization is not monotone")
  }

  test("fp16_encode/fp16_decode on the Column and SQL surfaces; " +
      "encode output type is ARRAY<SMALLINT>") {
    val df = Seq((1L, Array(1.0f, -2.5f, 0.333333f, 1e-6f)))
      .toDF("id", "v")
    val out = df.select(V.fp16_decode(V.fp16_encode($"v")).as("d"))
    assert(out.schema("d").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val d = out.as[Array[Float]].head()
    assert(d(0) === 1.0f && d(1) === -2.5f)
    assert(math.abs(d(2) - 0.333333f) < 2e-4)
    val viaSql = spark.sql(
      "SELECT fp16_decode(fp16_encode(array(1.0, -2.5))) AS d")
      .as[Array[Float]].head()
    assert(viaSql.toSeq === Seq(1.0f, -2.5f))
    val enc = df.select(V.fp16_encode($"v").as("e"))
    assert(enc.schema("e").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ShortType, containsNull = false))
  }

  test("null elements are refused loudly on both directions") {
    // constant arguments fold on the driver, so the expression's own
    // IllegalArgumentException surfaces unwrapped
    val e1 = intercept[IllegalArgumentException] {
      spark.sql("SELECT fp16_encode(array(1.0, CAST(NULL AS FLOAT)))")
        .collect()
    }
    assert(e1.getMessage.contains("fp16_encode"))
  }
}
