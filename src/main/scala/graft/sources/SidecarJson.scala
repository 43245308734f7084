package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** The ONE small-JSON-sidecar I/O discipline every store sidecar shares
  * (`_schema.json`, `_consumer-<name>.json`; the commit manifests and
  * `_last_commit` predate this helper and carry extra replay fields):
  * writes are write-then-RENAME so the sidecar appears atomically — a
  * crash mid-write leaves only a `.tmp` nothing reads — and reads
  * return the parsed tree or None when absent. Extracted (r20 review)
  * so an atomicity fix (e.g. rename semantics per filesystem) lands
  * once, not per copy.
  */
private[sources] object SidecarJson {

  def write(fs: FileSystem, live: Path, fileName: String)
           (build: ObjectNode => Unit): Unit = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    build(root)
    writeRaw(fs, live, fileName, om.writeValueAsBytes(root))
  }

  /** The atomicity half alone, for sidecars whose payload is not an
    * object tree (e.g. the raw `StructType.json` meta). */
  def writeRaw(fs: FileSystem, live: Path, fileName: String,
               bytes: Array[Byte]): Unit = {
    val target = new Path(live, fileName)
    val tmp = new Path(live, fileName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(target, false) // rename-over differs per FS; delete first
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"dailystore: sidecar rename failed: $tmp -> $target")
  }

  def read(fs: FileSystem, live: Path, fileName: String): Option[JsonNode] =
    readRaw(fs, live, fileName).map(new ObjectMapper().readTree(_))

  def readRaw(fs: FileSystem, live: Path,
              fileName: String): Option[Array[Byte]] = {
    val p = new Path(live, fileName)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    Some(try in.readAllBytes() finally in.close())
  }
}
