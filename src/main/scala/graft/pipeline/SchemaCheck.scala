package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema validation (ref `SchemaValidator`, `src/validation.py:336-424`):
  * required-field presence plus expected type-family checks, returning a
  * structured report instead of failing the pipeline (validation failures
  * are non-fatal, `src/pipeline.py:126-129`).
  */
object SchemaCheck {

  sealed trait TypeFamily
  case object StringF extends TypeFamily
  case object NumericF extends TypeFamily
  case object DateF extends TypeFamily

  /** Expected dtype families (`src/validation.py:373-380`): order_id /
    * customer_name / product are object(str); quantity int|float;
    * price float|int; order_date object (parsed later). */
  final val ExpectedTypes: Seq[(String, TypeFamily)] = Seq(
    "order_id" -> StringF,
    "customer_name" -> StringF,
    "product" -> StringF,
    "quantity" -> NumericF,
    "price" -> NumericF,
    "order_date" -> DateF)

  final case class FieldCheck(field: String, present: Boolean, typeOk: Boolean,
      actualType: Option[String])
  final case class SchemaReport(valid: Boolean, checks: Seq[FieldCheck],
      missingRequired: Seq[String], extraColumns: Seq[String])

  private def familyOk(dt: DataType, fam: TypeFamily): Boolean = fam match {
    case StringF => dt.isInstanceOf[StringType]
    case NumericF => dt.isInstanceOf[NumericType]
    case DateF => dt.isInstanceOf[DateType] || dt.isInstanceOf[TimestampType] ||
      dt.isInstanceOf[TimestampNTZType] || // parquet TIMESTAMP without tz (Spark 4 NTZ inference)
      dt.isInstanceOf[StringType] // pre-repair string dates are repaired by Clean (F5)
  }

  def validate(df: DataFrame,
      requiredFields: Seq[String] = Quality.RequiredFields): SchemaReport = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val checks = ExpectedTypes.map { case (name, fam) =>
      types.get(name) match {
        case Some(dt) => FieldCheck(name, present = true, familyOk(dt, fam),
          Some(dt.simpleString))
        case None => FieldCheck(name, present = false, typeOk = false, None)
      }
    }
    val missing = requiredFields.filterNot(types.contains)
    val extra = df.columns.filterNot(c =>
      ExpectedTypes.exists(_._1 == c) || Quality.CanonicalColumns.contains(c)).toSeq
    SchemaReport(
      valid = missing.isEmpty && checks.forall(c => !c.present || c.typeOk),
      checks = checks, missingRequired = missing, extraColumns = extra)
  }
}
