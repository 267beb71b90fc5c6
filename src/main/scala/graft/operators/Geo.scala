package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial neighbor join by grid-cell blocking: all point pairs within a
  * radius, WITHOUT a cross join.
  *
  * The reference's location dimension (models/marts/dim_locations.sql)
  * carries charger coordinates; "what is near this site" is the canonical
  * spatial question over it. At 100 TB of points the only viable plan is
  * the blocking one every spatial engine uses: quantize coordinates to a
  * grid of cells sized ≥ the search radius, expand each point to its 3×3
  * cell neighborhood ON ONE SIDE ONLY (9× row fan-out, a constant), then a
  * plain equi-shuffle join on cell id + an exact distance filter. Every
  * candidate pair is generated exactly once (expansion side a < home side
  * b), cost is Σ|cell|·|neighborhood| — never |points|².
  *
  * All geometry is exact int64 microdegree arithmetic on a flat grid
  * (squared Euclidean distance in µdeg; adequate for radius ≪ 1° and
  * bit-identical in every engine — no haversine, whose trig is not
  * bit-portable). The distance filter compares squared integers: no sqrt,
  * no float.
  */
object Geo {

  /** Exact floor division for non-negative int64 columns: subtracting the
    * remainder first makes the double division exact (the numerator is a
    * representable multiple k·b with k·b < 2^53, so k comes back bit-exact)
    * — no reliance on float rounding near cell boundaries.
    */
  def intDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Grid cell ids for integer µdeg coordinates; `cellUdeg` must be ≥ the
    * search radius so the 3×3 neighborhood is a superset of every match.
    * Coordinates must be non-negative (translate first): floor division
    * then matches SQL integer `//` in every engine.
    */
  def cellOf(latUdeg: Column, lonUdeg: Column, cellUdeg: Long): (Column, Column) =
    (intDiv(latUdeg, cellUdeg), intDiv(lonUdeg, cellUdeg))

  /** All unordered point pairs within `radiusUdeg` (flat-grid Euclidean on
    * µdeg): `points` must carry `idCol` (unique), `lat_udeg`, `lon_udeg`
    * (non-negative longs). Output: id_a < id_b, d2 = squared distance.
    */
  def neighborPairs(points: DataFrame, idCol: String, cellUdeg: Long,
      radiusUdeg: Long): DataFrame = {
    require(cellUdeg >= radiusUdeg,
      s"cell ($cellUdeg) must be >= radius ($radiusUdeg) for 3x3 coverage")
    val (cla, clo) = cellOf(col("lat_udeg"), col("lon_udeg"), cellUdeg)
    val home = points.select(col(idCol), col("lat_udeg"), col("lon_udeg"),
      cla.as("c_lat"), clo.as("c_lon"))
    // one side fans out to its 9 neighbor cells; the other stays home, so
    // each candidate pair materializes exactly once per (a-cell, b-cell)
    val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
    val expanded = home.select(
        col(idCol).as("id_a"), col("lat_udeg").as("lat_a"), col("lon_udeg").as("lon_a"),
        explode(offsets).as("o"), col("c_lat"), col("c_lon"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        (col("c_lat") + col("o.dy")).as("c_lat"),
        (col("c_lon") + col("o.dx")).as("c_lon"))
    val d2 = (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
      (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b"))
    expanded.join(
        home.select(col(idCol).as("id_b"), col("lat_udeg").as("lat_b"),
          col("lon_udeg").as("lon_b"), col("c_lat"), col("c_lon")),
        Seq("c_lat", "c_lon"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), d2.as("d2"))
      .where(col("d2") <= lit(radiusUdeg * radiusUdeg))
  }
}
