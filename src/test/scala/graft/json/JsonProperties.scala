package graft.json

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}

/** Property tests: any AST renders to parseable JSON that round-trips. */
object JsonProperties extends Properties("graft.json") {

  private val genScalar: Gen[JsonValue] = Gen.oneOf(
    Gen.const(JsonNull),
    Arbitrary.arbBool.arbitrary.map(JsonBool(_)),
    Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(Json.num),
    Arbitrary.arbDouble.arbitrary
      .suchThat(d => !d.isNaN && !d.isInfinite).map(Json.num),
    Gen.asciiPrintableStr.map(JsonString(_)),
    // strings with every escape class
    Gen.listOf(Gen.oneOf('"', '\\', '\n', '\r', '\t', '', 'é', 'a'))
      .map(cs => JsonString(cs.mkString)))

  private def genValue(depth: Int): Gen[JsonValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      3 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(vs => JsonArray(vs.toVector)),
      1 -> Gen.listOfN(3, for {
        k <- Gen.identifier
        v <- genValue(depth - 1)
      } yield k -> v).map(JsonObject.of(_: _*)))

  property("render/parse round-trip") = Prop.forAll(genValue(3)) { v =>
    Json.parse(v.render) == normalize(v)
  }

  /** Rendering normalizes JsonUndefined to null; mirror for comparison. */
  private def normalize(v: JsonValue): JsonValue = v match {
    case JsonUndefined      => JsonNull
    case JsonArray(items)   => JsonArray(items.map(normalize))
    case JsonObject(fields) => JsonObject(fields.map { case (k, x) => k -> normalize(x) })
    case other              => other
  }

  property("string escaping round-trips") = Prop.forAll { (s: String) =>
    (Json.parse(JsonString(s).render): @unchecked) match {
      case JsonString(back) => back == s
    }
  }

  property("numbers preserve integrality") = Prop.forAll(
    Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)) { n =>
    Json.parse(Json.num(n).render).asLong.contains(n)
  }
}
