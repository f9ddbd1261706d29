package graft.queries

/** Id arithmetic for SELF-PLANTED probe documents — the gates that
  * re-inject corpus docs as shifted-id duplicates (#91b/#91c offset
  * dedup, the #206/#211/#212/#216 ingest chains, the #219 week) all
  * share these shifts.
  *
  * ASSUMPTION (shared with every DuckDB oracle, which replays the
  * same literals): real doc_ids stay BELOW [[Shift1]] at every
  * shipped scale factor — max doc_id ≈ 6·10^4 at sf0.1 in the
  * driver-provided testdata, three orders of magnitude of headroom.
  * At a scale factor where ids could cross 10^6 the plants would
  * collide with real ids; a deployment at that scale derives its
  * shift from max(doc_id) instead (and regenerates the oracle SQL
  * with the same value). Keeping the shift a LITERAL is what lets
  * the DuckDB side replay it verbatim.
  */
private[queries] object Plants {
  /** First planted generation (day-1 copies). */
  val Shift1 = 1000000L
  /** Second planted generation (day-2 copies). */
  val Shift2 = 2000000L
  /** Third planted generation (a second day-2 component whose ids
    * must not collide with copies-of-day-1 plants at [[Shift2]]). */
  val Shift3 = 3000000L
}
