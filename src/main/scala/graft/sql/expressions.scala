// Lives under org.apache.spark.sql so Catalyst's `private[sql]` surface
// (AbstractDataType, ImplicitCastInputTypes, ...) is usable — the standard
// packaging for Spark-native extension expressions. Public entry points stay
// in graft.sql.functions.
package org.apache.spark.sql.graft

import graft.geo.{Geohash, Geom}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the spatial function surface.
 *
 * These replace the reference's storage-side extension points — the HBase
 * pushdown predicate (reference: src/main/java/tech/stackable/gis/hbase/
 * filter/WithinFilter.java:28-185) and geohash key derivation
 * (Ingest.java:75-77) — with expressions that participate in whole-stage
 * codegen, so the predicate runs inside the scan stage on executors exactly
 * where the reference ran it on region servers.
 */

/** geohash_encode(lat, lon, precision) → base32 string. */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_encode"

  override protected def nullSafeEval(lat: Any, lon: Any, precision: Any): Any =
    UTF8String.fromString(Geohash.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, p) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.geo.Geohash.encode($lat, $lon, $p))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GeohashEncode = copy(f, s, t)
}

/** geohash_decode(gh) → struct(lat double, lon double) — cell center. */
case class GeohashDecode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    StructType(Seq(StructField("lat", DoubleType), StructField("lon", DoubleType)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_decode"

  override protected def nullSafeEval(gh: Any): Any = {
    val (lat, lon) = Geohash.decodeCenter(gh.asInstanceOf[UTF8String].toString)
    InternalRow(lat, lon)
  }
  override protected def withNewChildInternal(c: Expression): GeohashDecode = copy(c)
}

/** geohash_neighbors(gh) → array of the up-to-8 adjacent cells. */
case class GeohashNeighbors(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_neighbors"

  override protected def nullSafeEval(gh: Any): Any =
    new GenericArrayData(
      Geohash.neighbors(gh.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildInternal(c: Expression): GeohashNeighbors = copy(c)
}

/** geohash_cell_neighbors(lat, lon, precision) → array of the point's cell
  * plus its 8 adjacent cells (the spatial-join probe key set). */
case class GeohashCellNeighbors(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_cell_neighbors"
  override protected def nullSafeEval(lat: Any, lon: Any, precision: Any): Any =
    new GenericArrayData(Geohash.cellAndNeighbors(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision.asInstanceOf[Int])
      .map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GeohashCellNeighbors = copy(f, s, t)
}

/**
 * st_covers_wkt(wktPolygon, lon, lat) → boolean; boundary-inclusive
 * (JTS `covers`, NOT `contains`) per WithinFilter.java:99 and the golden
 * boundary tests (TestWithinFilter.java:108-135). NaN coordinates → false
 * (WithinFilter.java:93-96 drops the row).
 *
 * When the WKT argument is foldable (the overwhelmingly common case — one
 * constant query polygon), the polygon is parsed ONCE and shipped as a
 * codegen reference object, the Spark analog of the reference's
 * parse-once-per-filter-instance (WithinFilter.java:45-52) and JTS
 * PreparedGeometry caching.
 */
case class STCoversWkt(first: Expression, second: Expression, third: Expression,
                       pruned: Boolean = false)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_covers_wkt"

  @transient private lazy val constPolygon: Option[Geom.Geometry] =
    if (first.foldable) {
      Option(first.eval(null)).map(w => Geom.parseWkt(w.toString))
    } else None

  // Non-foldable WKT: cache the last-seen polygon. Single-field tuple keeps
  // the (wkt, polygon) pairing atomic if the instance is shared across threads.
  @transient private var cache: (String, Geom.Geometry) = _
  private def polygonFor(wkt: String): Geom.Geometry = {
    val c = cache
    if (c != null && c._1 == wkt) c._2
    else {
      val p = Geom.parseWkt(wkt)
      cache = (wkt, p)
      p
    }
  }

  override protected def nullSafeEval(wkt: Any, lon: Any, lat: Any): Any = {
    val poly = constPolygon.getOrElse(polygonFor(wkt.toString))
    poly.covers(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    constPolygon match {
      case Some(poly) =>
        val polyRef = ctx.addReferenceObj("graftPolygon", poly, classOf[Geom.Geometry].getName)
        defineCodeGen(ctx, ev, (_, lon, lat) => s"$polyRef.covers($lon, $lat)")
      case None =>
        val self = ctx.addReferenceObj("graftCovers", this, classOf[STCoversWkt].getName)
        defineCodeGen(ctx, ev, (wkt, lon, lat) =>
          s"$self.coversDyn($wkt.toString(), $lon, $lat)")
    }

  /** Called from generated code on the non-foldable path. */
  def coversDyn(wkt: String, lon: Double, lat: Double): Boolean =
    polygonFor(wkt).covers(lon, lat)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): STCoversWkt = copy(f, s, t)
}

object STCoversWkt {
  /** The query polygon when statically known (used by the pruning rule). */
  def constantPolygon(e: STCoversWkt): Option[Geom.Geometry] =
    if (e.first.foldable) Option(e.first.eval(null)).map(w => Geom.parseWkt(w.toString))
    else None
}
