package graft.core

/** Column-role declaration for a long ("tidy") time-series table.
  *
  * Mirrors the reference's parameter objects, which declare id/timestamp/
  * numeric/categorical roles while dtypes stay schema-on-read
  * (reference: paqarin/generators/timegan.py:24-71,
  * paqarin/generators/doppleganger.py:23-91, paqarin/generators/par.py:17-50).
  *
  * @param itemIdCols  entity-identity columns (composite keys allowed,
  *                    reference: paqarin/generators/par.py:21,40)
  * @param tsCol       timestamp column
  * @param numericCols measurement columns (per-timestep values)
  * @param catCols     static categorical attribute columns (per-entity,
  *                    reference: paqarin/generators/doppleganger.py:39-41)
  * @param dateFormat  strftime pattern for string-typed timestamps (the
  *                    reference's format convention, default
  *                    paqarin/utils/data_utils.py:38); translated to the
  *                    JDK pattern by `core.DateFormats.strftimeToJdk`
  *                    wherever it is applied
  * @param frequency   tumbling-bucket width for resampling, as a Spark
  *                    interval string ("1 day" ~ pandas freq "D"/"1D")
  */
final case class TsSchema(
    itemIdCols: Seq[String],
    tsCol: String,
    numericCols: Seq[String],
    catCols: Seq[String] = Nil,
    dateFormat: String = "%d/%m/%Y",
    frequency: String = "1 day") {
  require(itemIdCols.nonEmpty, "at least one item-id column")
  require(numericCols.nonEmpty, "at least one numeric column")
}
