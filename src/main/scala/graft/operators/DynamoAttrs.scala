package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DynamoDB-stream flavor of the record payload (SURVEY §1.2): values
  * arrive as attribute-typed maps `{"S": "text"} / {"N": "123"} /
  * {"BOOL": true}` under `Keys` / `NewImage` / `OldImage`
  * (reference sample shapes `/root/reference/test/samples.js:289-353`;
  * the sibling core consumes them the same way).
  *
  * Decoding is pure JSON-path projection — `get_json_object` is
  * codegen'd and the scan stays one pass. For a fixed schema, prefer
  * [[typed]] with an explicit list of (name, kind) pairs. */
object DynamoAttrs {

  /** The `NewImage`/`OldImage`/`Keys` sub-document of a stream record. */
  def image(record: Column, which: String): Column =
    get_json_object(record, s"$$.$which")

  def attrString(image: Column, name: String): Column =
    get_json_object(image, s"$$.$name.S")

  def attrNumber(image: Column, name: String): Column = {
    val n = get_json_object(image, s"$$.$name.N")
    when(n.rlike("^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"), n.cast("double"))
  }

  def attrLong(image: Column, name: String): Column = {
    val n = get_json_object(image, s"$$.$name.N")
    when(n.rlike("^-?\\d+$"), n.cast("long"))
  }

  def attrBool(image: Column, name: String): Column =
    get_json_object(image, s"$$.$name.BOOL").cast("boolean")

  /** Base64 binary attribute (`{"B": "..."}`) decoded to bytes. */
  def attrBinary(image: Column, name: String): Column =
    try_to_binary(get_json_object(image, s"$$.$name.B"), lit("base64"))

  /** Untyped fallback: first present of S/N/BOOL as a string — the
    * lookup chain a schemaless consumer uses. */
  def attrValue(image: Column, name: String): Column =
    coalesce(
      get_json_object(image, s"$$.$name.S"),
      get_json_object(image, s"$$.$name.N"),
      get_json_object(image, s"$$.$name.BOOL"))
}
