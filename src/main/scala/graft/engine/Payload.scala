package graft.engine

/** Result of [[Engine.execute]] — one variant per statement family,
  * mirroring the reference's payload surface
  * (/root/reference/src/executor/execute.rs:37-52): Success, Create,
  * Insert(n), Select{labels, rows}, Delete(n), Update(n), DropTable,
  * AlterTable, TruncateTable.
  */
sealed trait Payload

object Payload {
  /** Statements with no row result (SET, CREATE DATABASE, EXECUTE …). */
  case object Success extends Payload
  /** CREATE TABLE / CREATE VIEW / CREATE INDEX. */
  case object Create extends Payload
  final case class Insert(n: Long) extends Payload
  /** Collected SELECT result. For result sets too large to collect,
    * use [[Engine.query]] and keep the DataFrame distributed. */
  final case class Select(labels: Seq[String], rows: Seq[Seq[Any]]) extends Payload
  final case class Delete(n: Long) extends Payload
  final case class Update(n: Long) extends Payload
  case object DropTable extends Payload
  case object AlterTable extends Payload
  case object TruncateTable extends Payload
}
