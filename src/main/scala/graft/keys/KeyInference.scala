package graft.keys

/**
 * Primary-key guessing for Canvas warehouse tables — a verbatim port of
 * `get_id_like_column_from_columns` (`/root/reference/src/importer.rs:148-186`),
 * including the quirky double-suffix-strip. The inferred key is the merge key
 * for incremental upserts (SURVEY §2 op K-1 feeding I-3).
 *
 * Rules, in order:
 *  1. a column literally named `id` wins;
 *  2. strip the last `_`-suffix from the table name, try `{prefix}_id`
 *     (e.g. `assignment_fact` → `assignment_id`);
 *  3. strip one more suffix, try again
 *     (e.g. `quiz_question_answer_dim` → `quiz_question_answer` →
 *     `quiz_question_id` via `quiz_question`);
 *  4. otherwise None (caller must treat the table as volatile or error,
 *     matching `importer.rs:349-356`).
 *
 * Deliberately NOT "improved": SURVEY §7 calls this out as
 * port-exactly-don't-fix.
 */
object KeyInference {

  def idLikeColumn(tableName: String, columns: Iterable[String]): Option[String] = {
    val colSet = columns.toSet
    if (colSet.contains("id")) Some("id")
    else {
      val lastUnderscore = tableName.lastIndexOf('_')
      if (lastUnderscore < 0) None
      else {
        val prefix = tableName.substring(0, lastUnderscore)
        if (colSet.contains(s"${prefix}_id")) Some(s"${prefix}_id")
        else {
          val lastUnderscore2 = prefix.lastIndexOf('_')
          if (lastUnderscore2 < 0) None
          else {
            val prefix2 = prefix.substring(0, lastUnderscore2)
            if (colSet.contains(s"${prefix2}_id")) Some(s"${prefix2}_id") else None
          }
        }
      }
    }
  }
}
