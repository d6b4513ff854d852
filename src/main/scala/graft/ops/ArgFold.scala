package graft.ops

/** The nearest-candidate FOLD shared by every broadcast-array argmin /
  * argmax in the engine (round 18): one SQL-text builder so the
  * ordering discipline — seed sentinel, null-coalescing, tie
  * direction — lives in exactly one place. The sentinel-leak class of
  * defect this centralizes was found twice during review (empty-array
  * and all-null inputs), once per hand-built copy; see
  * [[Similarity.ivfAssignWith]] for the semantics discussion.
  *
  * Contract (mirrors the window-rank formulations these folds
  * replaced):
  *  - `max = true` is (score DESC, id ASC): greatest() over
  *    struct(s, i) with the caller passing a NEGATED id expression so
  *    the id leg breaks ties toward the smallest id; seed s =
  *    -Infinity.
  *  - `max = false` is (score ASC, id ASC): least() over struct(s, i)
  *    with the id passed as-is; seed s = NaN (NaN sorts LARGEST, so
  *    the seed loses every real comparison and ties only against
  *    all-null rows, where the id leg picks the smallest id).
  *  - scores are null-coalesced TO THE SEED sentinel: a null score
  *    (ragged vectors under graft_dot/graft_l2sq) must LOSE against
  *    any real score in both directions — without the coalesce a null
  *    struct field sorts smallest, which wins least() outright and
  *    leaks the seed under greatest(). In the MAX direction this
  *    matches the replaced window's DESC ordering (NULLS LAST). In
  *    the MIN direction it is an INTENTIONAL divergence from the
  *    replaced ASC windows (Spark's default ASC is NULLS FIRST, where
  *    a null/ragged score WON the rank): a cell whose distance cannot
  *    be computed must never beat a cell whose distance can — the
  *    fold fixes that, and AssignFoldSpec pins the new behavior on
  *    the min paths (Clustering.assign, pqEncode) explicitly.
  *  - `idSeed` must lose every id tie: pass the most-negative value
  *    for max (negated ids) and the most-positive for min.
  *
  * Callers read the winner as `<alias>.s` / `<alias>.i`. The EMPTY
  * array case still returns the seed — callers whose array comes from
  * a global collect_list must filter `size(arr) > 0` first (the
  * empty-frame-in, empty-frame-out contract). */
private[ops] object ArgFold {
  def best(arr: String, scoreSql: String, idSql: String, idSeed: String,
      max: Boolean): String = {
    val (fn, sentinel) =
      if (max) ("greatest", "'-Infinity'") else ("least", "'NaN'")
    s"""aggregate($arr,
       |  struct(cast($sentinel as double) as s, $idSeed as i),
       |  (acc, c) -> $fn(acc,
       |    struct(coalesce($scoreSql, cast($sentinel as double)) as s,
       |           $idSql as i)))""".stripMargin
  }
}
