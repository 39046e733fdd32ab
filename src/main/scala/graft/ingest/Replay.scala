package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The reference's resumable replay cursor
  * (`reference:airflow_docker/dags/ecomm_pipeline/extractor.py:13,25-41,
  * 144-154`): a tiny JSON checkpoint holding the month being replayed and a
  * global row offset, advanced once per run and rotated to the next month
  * when a month is exhausted.
  *
  * Structured Streaming owns real checkpointing (`checkpointLocation` WAL +
  * state store — see [[graft.streaming.StreamingQueries]]); this file-based
  * cursor exists for batch replay parity and is written atomically
  * (tmp + move) so a crashed run can't half-write it.
  */
final case class ReplayCheckpoint(month: String, offset: Long) {
  def advance(rowsSent: Long): ReplayCheckpoint = copy(offset = offset + rowsSent)
  def rotate(nextMonth: String): ReplayCheckpoint = ReplayCheckpoint(nextMonth, 0L)
  def toJson: String = s"""{"month":"$month","offset":$offset}"""
}

object ReplayCheckpoint {
  private val Pattern =
    """\{\s*"month"\s*:\s*"([^"]+)"\s*,\s*"offset"\s*:\s*(\d+)\s*\}""".r

  def load(path: String, default: ReplayCheckpoint): ReplayCheckpoint = {
    val p = Paths.get(path)
    if (!Files.exists(p)) default
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim match {
      case Pattern(month, offset) => ReplayCheckpoint(month, offset.toLong)
      case other =>
        throw new IllegalStateException(s"corrupt replay checkpoint: $other")
    }
  }

  def save(path: String, ck: ReplayCheckpoint): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, ck.toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
