package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous vector-store maintenance: a stream of upserts
  * (embeddingController.js addEmbeddedText/updateEmbeddedText as a
  * stream) folded into latest-wins state per vec_id, emitting the
  * current version on every change (Update mode downstream). The batch
  * twin is graft.operators.Similarity.v1Upsert. */
object StreamingUpsert {

  case class Upsert(vec_id: Long, seq: Long, label: Int, embedding: Array[Float])

  def latestWins(upserts: Dataset[Upsert]): Dataset[Upsert] = {
    import upserts.sparkSession.implicits._
    upserts.groupByKey(_.vec_id)
      .mapGroupsWithState[Upsert, Upsert](GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Upsert], state: GroupState[Upsert]) =>
          val incoming = rows.maxBy(_.seq)
          val winner = state.getOption match {
            case Some(cur) if cur.seq >= incoming.seq => cur
            case _ => incoming
          }
          state.update(winner)
          winner
      }
  }
}
