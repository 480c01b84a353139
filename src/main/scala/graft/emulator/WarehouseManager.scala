package graft.emulator

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Warehouse metadata CRUD (reference `pkg/warehouse/manager.go:25-214`).
  * Warehouses are pure metadata — no compute attached in the reference and
  * none here (Spark's parallelism is the session's, not the "warehouse"'s).
  */
final class WarehouseManager {

  val ValidSizes: Set[String] = Set(
    "X-SMALL", "SMALL", "MEDIUM", "LARGE", "X-LARGE",
    "2X-LARGE", "3X-LARGE", "4X-LARGE", "5X-LARGE", "6X-LARGE")

  final case class Warehouse(
      name: String,
      size: String,
      state: String, // SUSPENDED | ACTIVE (reference `warehouse/manager.go:18-23`)
      autoSuspend: Int,
      autoResume: Boolean,
      createdOn: Long)

  private val warehouses = new ConcurrentHashMap[String, Warehouse]()

  private def norm(name: String) = name.trim.toUpperCase(java.util.Locale.ROOT)

  def create(name: String, size: String = "X-SMALL",
      autoSuspend: Int = 600, autoResume: Boolean = true,
      ifNotExists: Boolean = false): Warehouse = {
    val n = norm(name)
    val sz = norm(size)
    if (!ValidSizes.contains(sz))
      throw SnowflakeError(SnowflakeError.CodeInvalidParameter, s"invalid warehouse size: $size")
    val existing = warehouses.get(n)
    if (existing != null) {
      if (ifNotExists) return existing
      throw SnowflakeError.alreadyExists(s"warehouse $n already exists")
    }
    // created SUSPENDED, the reference's default state
    // (`warehouse/manager.go:82` StateSuspended; its e2e pins it at
    // `tests/e2e/rest_api_v2_test.go:472-474`)
    val w = Warehouse(n, sz, "SUSPENDED", autoSuspend, autoResume,
      System.currentTimeMillis())
    warehouses.put(n, w)
    w
  }

  def get(name: String): Option[Warehouse] = Option(warehouses.get(norm(name)))

  def list(): Seq[Warehouse] =
    warehouses.values.asScala.toSeq.sortBy(_.name)

  def suspend(name: String): Warehouse = update(name)(_.copy(state = "SUSPENDED"))
  def resume(name: String): Warehouse = update(name)(_.copy(state = "ACTIVE"))
  def resize(name: String, size: String): Warehouse = {
    val sz = norm(size)
    if (!ValidSizes.contains(sz))
      throw SnowflakeError(SnowflakeError.CodeInvalidParameter, s"invalid warehouse size: $size")
    update(name)(_.copy(size = sz))
  }

  private def update(name: String)(f: Warehouse => Warehouse): Warehouse = {
    val n = norm(name)
    val w = warehouses.get(n)
    if (w == null) throw SnowflakeError.notFound(s"warehouse $n does not exist")
    val w2 = f(w)
    warehouses.put(n, w2)
    w2
  }

  def drop(name: String, ifExists: Boolean = false): Boolean = {
    val removed = warehouses.remove(norm(name)) != null
    if (!removed && !ifExists)
      throw SnowflakeError.notFound(s"warehouse ${norm(name)} does not exist")
    removed
  }
}
