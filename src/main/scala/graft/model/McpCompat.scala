package graft.model

/** R12 legacy flatten (reference
  * `backend/src/second_brain/schemas.py:6-57`): the compatibility
  * envelope re-emits `candidates`/`branch`/`confidence` as flat
  * top-level copies of the nested packet — additive only, canonical
  * nested fields unchanged. With include_legacy=false the flat fields
  * take their declared defaults (empty list / "" / 0.0). */
final case class McpCompatResponse(
    contextPacket: ContextPacket,
    nextAction: NextAction,
    candidates: Seq[ContextCandidate],
    branch: String,
    confidence: Double,
    routingMetadata: Map[String, String])

object McpCompatResponse {

  def fromRetrievalResponse(
      response: RetrievalResponse,
      includeLegacy: Boolean = true): McpCompatResponse = {
    val packet = response.contextPacket
    if (includeLegacy)
      McpCompatResponse(packet, response.nextAction,
        packet.candidates, packet.summary.branch,
        packet.summary.top_confidence, response.routingMetadata)
    else
      McpCompatResponse(packet, response.nextAction,
        Seq.empty, "", 0.0, response.routingMetadata)
  }
}
