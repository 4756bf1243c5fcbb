package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, SQLUserDefinedType, UserDefinedType}

/** A UserDefinedType — the type-system extension surface of SURVEY §2.8,
  * complementing the expression/aggregate/generator extensions already
  * covered: a domain object ([[Vec2]], a 2-D point) that flows through
  * Datasets, shuffles, and PARQUET round trips as a first-class column
  * while storing as a plain `array<double>`.
  *
  * This is how engine-adjacent libraries ship typed columns (Spark MLlib's
  * VectorUDT is the canonical instance): the annotation on the case class
  * routes encoder derivation through [[Vec2UDT]], the writer stores the
  * underlying sqlType plus the UDT class in the parquet footer's Spark
  * schema metadata, and a reader with the class on its classpath
  * reconstitutes `Vec2` objects transparently (q199 proves the full
  * write → footer → read → deserialize chain against a DuckDB oracle that
  * reads the same values from the SOURCE table — and OperatorSpec proves
  * DuckDB sees the stored file as a plain array<double>, i.e. the storage
  * representation stays open, not engine-private).
  */
@SQLUserDefinedType(udt = classOf[Vec2UDT])
case class Vec2(x: Double, y: Double)

class Vec2UDT extends UserDefinedType[Vec2] {
  override def sqlType: DataType = ArrayType(DoubleType, containsNull = false)

  override def serialize(obj: Vec2): ArrayData =
    new GenericArrayData(Array(obj.x, obj.y))

  override def deserialize(datum: Any): Vec2 = datum match {
    case a: ArrayData =>
      require(a.numElements() == 2, s"Vec2 needs 2 elements, got ${a.numElements()}")
      Vec2(a.getDouble(0), a.getDouble(1))
    case other =>
      throw new IllegalArgumentException(s"cannot deserialize $other to Vec2")
  }

  override def userClass: Class[Vec2] = classOf[Vec2]

  // all Vec2UDT instances describe the same type — required for plan
  // equality (exchange reuse) across separately-constructed instances
  override def equals(o: Any): Boolean = o.isInstanceOf[Vec2UDT]
  override def hashCode(): Int = classOf[Vec2UDT].getName.hashCode
}
