package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 FunctionCatalog — the SQL-addressable function-registration surface
  * (the catalog-plugin complement to the `GraftExtensions` native
  * expression registrations): configured as
  * `spark.sql.catalog.graft_fn = graft.sources.GraftFunctionCatalog`
  * (wired in `GraftSession.tune`), after which plain SQL resolves
  * `graft_fn.fn.cents(x)` / `graft_fn.fn.dot_f(a, b)` through
  * `loadFunction` → `bind` → the bound `ScalarFunction`.
  *
  * Both functions carry the MAGIC METHOD (`invoke` with exact Catalyst
  * argument types), so the analyzer compiles the call to a direct
  * `Invoke` on this object inside whole-stage codegen — no row boxing,
  * no reflection per row; `produceResult` stays as the documented
  * interpreted fallback. At 100 TB this is the difference between a
  * catalog function and a black-box UDF: the call site fuses into the
  * same generated loop as built-in expressions.
  *
  * Semantics are the house conventions so DuckDB oracles carry:
  * `cents` is the q94/q95 money coding (floor(x·100) as BIGINT);
  * `dot_f` accumulates float pairs in index order in double precision —
  * the same loop as the native `cosine_similarity` expression, which is
  * what makes `list_dot_product(a::DOUBLE[], b::DOUBLE[])` an exact
  * oracle for it (s01's established precedent).
  */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {

  private var catalogName: String = "graft_fn"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("fn")

  private val ns = Array("fn")

  private val fns: Map[String, UnboundFunction] = Map(
    "cents" -> GraftFunctionCatalog.Cents,
    "dot_f" -> GraftFunctionCatalog.DotF)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(ns))
      fns.keys.toArray.sorted.map(Identifier.of(ns, _))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().sameElements(ns) || ident.namespace().isEmpty)
      fns.getOrElse(ident.name(), throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)
}

object GraftFunctionCatalog {

  /** cents(double) → BIGINT: floor(x·100), the engine's money coding. */
  object Cents extends UnboundFunction with ScalarFunction[java.lang.Long] {
    override def name(): String = "cents"
    override def description(): String = "cents(double) -> floor(x*100) AS BIGINT"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 1 && inputType.head.dataType == DoubleType,
        s"cents expects (DOUBLE), got ${inputType.catalogString}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(DoubleType)
    override def resultType(): DataType = LongType
    override def canonicalName(): String = "graft.cents"
    // magic method: the analyzer compiles the call site to Invoke(this,
    // "invoke", ...) inside whole-stage codegen (nulls short-circuit)
    def invoke(x: Double): Long = math.floor(x * 100).toLong
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else invoke(input.getDouble(0))
  }

  /** dot_f(array<float>, array<float>) → DOUBLE: index-ordered float-pair
    * dot accumulated in double — the `cosine_similarity` loop's dot term. */
  object DotF extends UnboundFunction with ScalarFunction[java.lang.Double] {
    override def name(): String = "dot_f"
    override def description(): String =
      "dot_f(array<float>, array<float>) -> DOUBLE (index-ordered, double accumulation)"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.size == 2 && inputType.forall(f => f.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      require(ok, s"dot_f expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got ${inputType.catalogString}")
      this
    }
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(FloatType), ArrayType(FloatType))
    override def resultType(): DataType = DoubleType
    override def canonicalName(): String = "graft.dot_f"
    def invoke(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      dot
    }
    override def produceResult(input: InternalRow): java.lang.Double =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else invoke(input.getArray(0), input.getArray(1))
  }
}
