package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Shared control-plane job store: one JSON file per job, atomically
  * replaced, with synchronized read-modify-write (a worker's progress
  * update racing a user's cancel must not drop the cancel) and
  * max-id+1 allocation. Both daemon job kinds (embedding, autotune)
  * persist their state through this; each supplies only its
  * serialization and id accessor.
  */
private[streaming] abstract class JsonJobStore[S](dir: String,
    filePrefix: String) {
  Files.createDirectories(Paths.get(dir))

  protected def ser(st: S): String
  protected def deser(json: String): S
  protected def idOf(st: S): Long

  private def path(id: Long) = Paths.get(dir, s"$filePrefix$id.json")

  def write(st: S): Unit = synchronized {
    val tmp = Paths.get(dir, s".$filePrefix${idOf(st)}.tmp")
    Files.writeString(tmp, ser(st))
    Files.move(tmp, path(idOf(st)), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def get(id: Long): S = {
    require(Files.exists(path(id)), s"no such job: $filePrefix$id")
    deser(Files.readString(path(id)))
  }

  def update(id: Long)(f: S => S): S =
    synchronized { val st = f(get(id)); write(st); st }

  def list(): Seq[S] = {
    val stream = Files.list(Paths.get(dir))
    try stream.iterator().asScala
      .filter(_.getFileName.toString.startsWith(filePrefix))
      .map(p => deser(Files.readString(p)))
      .toSeq.sortBy(idOf)
    finally stream.close()
  }

  protected def nextId(): Long =
    list().map(idOf).foldLeft(0L)(math.max) + 1
}

private[streaming] object JsonJobStore {
  /** Extract one `"key": value` field from a flat JSON object; string
    * values tolerate escaped characters.
    */
  def field(json: String, key: String): Option[String] = {
    val m = ("\"" + key + "\":(\"((?:[^\"\\\\]|\\\\.)*)\"|null|-?[0-9.]+)").r
      .findFirstMatchIn(json)
    m.flatMap { g =>
      val raw = g.group(1)
      if (raw == "null") None
      else Some(Option(g.group(2)).map(graft.util.Json.unescape)
        .getOrElse(raw))
    }
  }
}
