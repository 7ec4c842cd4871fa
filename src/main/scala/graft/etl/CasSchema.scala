package graft.etl

import org.apache.spark.sql.types._

/** Schemas for the CAS domain (SURVEY.md §1.2 inferred DDL) and the
  * Zenput-shaped submission JSON the ETL consumes
  * (reference etl_sync.py:206-224).
  */
object CasSchema {

  /** One REST-API submission: nested metadata + variable-length answers. */
  val submission: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("smetadata", StructType(Seq(
      StructField("date_submitted", StringType), // ISO timestamp string
      StructField("lat", DoubleType),
      StructField("lon", DoubleType),
      StructField("location", StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType)))),
      StructField("created_by", StructType(Seq(
        StructField("display_name", StringType)))))),
    ),
    StructField("answers", ArrayType(StructType(Seq(
      StructField("field_type", StringType),
      StructField("title", StringType),
      StructField("value", DoubleType)))))))

  val periodos: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("codigo", StringType),
    StructField("nombre", StringType),
    StructField("fecha_inicio", DateType),
    StructField("fecha_fin", DateType),
    StructField("activo", BooleanType)))

  val grupos: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("nombre", StringType),
    StructField("activo", BooleanType)))

  val sucursales: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("nombre", StringType),
    StructField("estado", StringType),
    StructField("clasificacion", StringType),
    StructField("latitud", DoubleType),
    StructField("longitud", DoubleType),
    StructField("grupo_operativo_id", IntegerType),
    StructField("zenput_location_id", LongType),
    StructField("activo", BooleanType)))

  val catalogo: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("codigo", StringType),
    StructField("nombre", StringType),
    StructField("numero", IntegerType)))

  /** Master fact (both supervision types share it; seguridad leaves
    * lat/lon null — etl_sync.py:313-320).
    */
  val supervisiones: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("zenput_submission_id", StringType),
    StructField("sucursal_id", IntegerType),
    StructField("periodo_id", IntegerType),
    StructField("supervisor", StringType),
    StructField("fecha_supervision", TimestampType),
    StructField("calificacion_general", DoubleType),
    StructField("lat_entrega", DoubleType),
    StructField("lon_entrega", DoubleType)))

  /** Detail fact (supervision_areas / seguridad_kpis shape). */
  val detalle: StructType = StructType(Seq(
    StructField("supervision_id", LongType, nullable = false),
    StructField("area_id", IntegerType, nullable = false),
    StructField("porcentaje", DoubleType)))

  val checkpoints: StructType = StructType(Seq(
    StructField("formulario", StringType),
    StructField("ultima_fecha", TimestampType)))

  val syncLog: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("workflow", StringType),
    StructField("inicio", TimestampType),
    StructField("fin", TimestampType),
    StructField("registros_nuevos", LongType),
    StructField("estado", StringType)))
}
