package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the X41 merge-application algebra: the
  * engines apply a BPE merge as TWO left-to-right non-overlapping
  * literal `replace` passes over the space-joined symbol string
  * (TextAnalysis.bpeMergesFrom and the generated oracle step). The
  * claim the scaladoc makes — two passes compute exactly the textbook
  * simultaneous left-to-right merge, completing consecutive runs
  * without ever over-merging — is proven here against an independent
  * list-walking reference, over adversarial small-alphabet symbol
  * sequences where runs and overlaps are the common case, not the
  * edge case. Pure JVM string semantics (`String.replace` is the same
  * left-to-right non-overlapping contract as Spark's and DuckDB's
  * `replace`), so no Spark session is needed.
  */
object BpeMergeProps extends Properties("BpeMerge") {

  /** Textbook merge: walk the symbol list once, left to right,
    * greedily fusing every (l, r) occurrence — the semantics BPE
    * training and inference both use.
    */
  private def referenceMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
        case a :: tail => out += a; rest = tail
        case Nil => ()
      }
    }
    out.toList
  }

  private def twoPassReplace(syms: List[String], l: String, r: String): List[String] = {
    val str = syms.mkString(" ", " ", " ")
    val pat = s" $l $r "
    val rep = s" $l$r "
    str.replace(pat, rep).replace(pat, rep).trim.split(" ").filter(_.nonEmpty).toList
  }

  // tiny alphabet plus multi-char symbols that can embed each other
  // ("a" inside "ab") — the shapes where naive string surgery breaks
  private val symbol = Gen.oneOf("a", "b", "c", "ab", "ba", "aa")
  private val seqGen = Gen.listOfN(12, symbol).flatMap(s => Gen.const(s))

  property("distinct-pair merges == textbook left-to-right merge, exactly") =
    // the operator's whole domain: self-pairs (l = r) are EXCLUDED
    // from the argmax (TextAnalysis.bpeMergesFrom scaladoc) because
    // this property FOUND that the two-pass replace pairs a repeated
    // symbol's run differently from the textbook scan (and merges
    // fewer on runs >= 6); for every distinct pair the forms are
    // exhaustively identical (also verified driver-side over all
    // sequences up to length 8 of an embedded-symbol alphabet)
    Prop.forAll(seqGen, symbol, symbol) { (syms, l, r) =>
      l == r || twoPassReplace(syms, l, r) == referenceMerge(syms, l, r)
    }

  property("merging a pair absent from the sequence is the identity") =
    Prop.forAll(seqGen) { syms =>
      // "zz" never appears as a symbol, so nothing may change
      twoPassReplace(syms, "zz", "zz") == syms
    }
}
