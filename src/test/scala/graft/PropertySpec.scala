package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.geom.{CrsTransform, GeomLib}
import graft.text.TextLib

/** ScalaCheck property suites (SURVEY.md §5.2): algebraic invariants of the
  * geometry and text kernels over generated inputs. */
object GeomProperties extends Properties("GeomLib") {

  private val lon = Gen.chooseNum(-179.999, 179.999)
  private val lat = Gen.chooseNum(-89.999, 89.999)

  property("hilbert xy->d->xy identity") = forAll(
    Gen.chooseNum(0L, (1L << GeomLib.HilbertOrder) - 1),
    Gen.chooseNum(0L, (1L << GeomLib.HilbertOrder) - 1)) { (x, y) =>
    val (x2, y2) = GeomLib.hilbertD2XY(GeomLib.hilbertXY2D(x, y))
    x2 == x && y2 == y
  }

  property("hilbert index nonnegative (sortable as signed Long)") =
    forAll(lat, lon) { (la, lo) => GeomLib.hilbertEncode(la, lo) >= 0L }

  property("flip is an involution on squares") = forAll(lon, lat,
    Gen.chooseNum(0.001, 5.0)) { (x, y, h) =>
    val w = GeomLib.squareWkb(x, y, h)
    GeomLib.flip(GeomLib.flip(w)).toSeq == GeomLib.force2D(w).toSeq
  }

  property("WKB text round-trip preserves point coordinates") =
    forAll(lon, lat) { (x, y) =>
      val w = GeomLib.fromText(s"POINT ($x $y)")
      GeomLib.stX(w) == x && GeomLib.stY(w) == y
    }

  property("point constructor round-trips through JTS read") =
    forAll(lon, lat) { (x, y) =>
      val g = GeomLib.read(GeomLib.pointWkb(x, y))
      g.getCoordinate.x == x && g.getCoordinate.y == y
    }

  property("grid cell contains its input point") = forAll(lon, lat,
    Gen.chooseNum(1, 14)) { (lo, la, res) =>
    val c = GeomLib.cellEncode(lo, la, res)
    val b = GeomLib.fromText(GeomLib.cellBoundaryWkt(c))
    GeomLib.xMin(b) <= lo && lo <= GeomLib.xMax(b) &&
      GeomLib.yMin(b) <= la && la <= GeomLib.yMax(b)
  }
}

object CrsProperties extends Properties("CrsTransform") {
  // UTM zone 50: valid band around the central meridian 117E
  private val lonZ = Gen.chooseNum(111.0, 123.0)
  private val latZ = Gen.chooseNum(-79.9, 79.9)

  property("utm forward∘inverse ≈ id (<1e-8 deg)") = forAll(lonZ, latZ) { (lo, la) =>
    val (e, n) = CrsTransform.wgs84ToUtm(la, lo, 50, north = la >= 0)
    val (lo2, la2) = CrsTransform.utmToWgs84(e, n, 50, north = la >= 0)
    math.abs(lo2 - lo) < 1e-8 && math.abs(la2 - la) < 1e-8
  }

  property("web mercator forward∘inverse ≈ id") = forAll(
    Gen.chooseNum(-179.9, 179.9), Gen.chooseNum(-85.0, 85.0)) { (lo, la) =>
    val (x, y) = CrsTransform.wgs84ToWebMerc(lo, la)
    val (lo2, la2) = CrsTransform.webMercToWgs84(x, y)
    math.abs(lo2 - lo) < 1e-9 && math.abs(la2 - la) < 1e-9
  }

  property("utm easting bounded within zone") = forAll(lonZ, latZ) { (lo, la) =>
    val (e, _) = CrsTransform.wgs84ToUtm(la, lo, 50, north = la >= 0)
    e > -1000000 && e < 2000000
  }
}

object TextProperties extends Properties("TextLib") {
  // letter-only words (digits are separate BPE-ish tokens)
  private val word = Gen.oneOf((1 to 40).map(i =>
    ('a' + i % 26).toChar.toString * (1 + i % 5)))
  private val doc = Gen.listOfN(60, word).map(_.mkString(" "))

  property("jaccard(a,a) == 1") = forAll(doc) { d =>
    val sh = TextLib.shingleHashes(d, 3)
    TextLib.jaccard(sh, sh) == 1.0
  }

  property("jaccard symmetric and in [0,1]") = forAll(doc, doc) { (a, b) =>
    val (sa, sb) = (TextLib.shingleHashes(a, 3), TextLib.shingleHashes(b, 3))
    val j1 = TextLib.jaccard(sa, sb)
    j1 == TextLib.jaccard(sb, sa) && j1 >= 0.0 && j1 <= 1.0
  }

  property("minhash of identical inputs identical; est within 0.35 of exact") =
    forAll(doc, doc) { (a, b) =>
      val (sa, sb) = (TextLib.shingleHashes(a, 3), TextLib.shingleHashes(b, 3))
      val (ma, mb) = (TextLib.minHashSignature(sa, 128, 9L), TextLib.minHashSignature(sb, 128, 9L))
      val est = TextLib.minHashJaccard(ma, mb)
      val exact = TextLib.jaccard(sa, sb)
      (a != b || est == 1.0) && math.abs(est - exact) < 0.35
    }

  property("simhash distance bounded by 64 and 0 for identical") =
    forAll(doc, doc) { (a, b) =>
      val ha = TextLib.simHash64(TextLib.shingleHashes(a, 3))
      val hb = TextLib.simHash64(TextLib.shingleHashes(b, 3))
      val d = java.lang.Long.bitCount(ha ^ hb)
      d >= 0 && d <= 64 && (a != b || d == 0)
    }

  property("token count formula equals whitespace split on clean text") =
    forAll(doc) { d =>
      TextLib.bpeIshTokenCount(d) == TextLib.tokenize(d).length
    }
}
