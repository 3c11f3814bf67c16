package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-turn conversation assembly — the SFT/chat-data prep stage that
  * turns an event log into training-ready transcripts. The reference
  * processed event streams as grouped sorted reduces (kvgroup over
  * sorted runs, lib/disco/util.py:101-110); this is that shape composed
  * into the three cleanups every chat-corpus builder runs:
  *
  *  1. TURN THREADING: events of one thread ordered by (ts, seq);
  *  2. ROLE-RUN COLLAPSE: consecutive same-role events merge into one
  *     turn (payloads joined in event order) — chat corpora are full of
  *     double-sends, and alternation-expecting trainers choke on them;
  *  3. CONTEXT TRIM: keep only the LAST `maxTurns` turns per thread
  *     (context windows truncate from the head, not the tail);
  *  4. ASSEMBLY: "role: content" lines joined newline-ordered.
  *
  * Shape at 100 TB: two thread-partitioned windows (lag + running sum —
  * one shuffle on the thread key, reused by every later stage since the
  * partitioning survives the groupBys on (thread, run)) and two ordered
  * aggregations; nothing leaves the thread's partition, and state per
  * thread is its own events only. Determinism: runs are numbered by an
  * explicit ROWS-framed running sum over unique (ts, seq); every
  * string_agg orders on that same key, so the transcript bytes are
  * engine-portable.
  *
  * Output: (thread, n_turns, n_kept, n_events, transcript) — total turn
  * count before trimming, kept turns, events inside kept turns, and the
  * assembled transcript.
  */
object Dialog {

  /** The shared front half: thread → role-run collapse → context trim.
    * Returns the KEPT-turns frame (thread, run, role, n_events, content,
    * n_turns) that both [[assembleThreads]] and [[lossMaskSpans]] root
    * on — one definition, so the transcript and its spans cannot drift.
    */
  private def keptTurns(df: DataFrame, threadCol: String, tsCol: String,
                        seqCol: String, roleCol: String, payloadCol: String,
                        maxTurns: Int): DataFrame = {
    require(maxTurns >= 1, s"assembleThreads maxTurns: $maxTurns")
    val w = Window.partitionBy("thread").orderBy(col("ts"), col("seq"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = df.select(col(threadCol).as("thread"), col(tsCol).as("ts"),
        col(seqCol).as("seq"), col(roleCol).as("role"),
        col(payloadCol).as("payload"))
      .withColumn("_prev", lag(col("role"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("_prev") =!= col("role"), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("_new")).over(wRows))
    val turns = runs.groupBy("thread", "run")
      .agg(min(col("role")).as("role"), // constant within a run
        count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("seq"),
            col("payload").as("p")))),
          x => x.getField("p")), " | ").as("content"))
    turns
      .withColumn("n_turns", max(col("run")).over(Window.partitionBy("thread")))
      .filter(col("run") > col("n_turns") - maxTurns)
  }

  def assembleThreads(df: DataFrame, threadCol: String, tsCol: String,
                      seqCol: String, roleCol: String, payloadCol: String,
                      maxTurns: Int): DataFrame = {
    val kept = keptTurns(df, threadCol, tsCol, seqCol, roleCol, payloadCol,
      maxTurns)
    kept.groupBy("thread")
      .agg(max(col("n_turns")).as("n_turns"),
        count(lit(1)).as("n_kept"),
        sum(col("n_events")).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("run"),
            concat(col("role"), lit(": "), col("content")).as("line")))),
          x => x.getField("line")), "\n").as("transcript"))
  }

  /** LOSS-MASK SPANS — the SFT masking prep: for each thread, the
    * character spans of `maskRole`'s turn CONTENT inside the transcript
    * [[assembleThreads]] builds with the same parameters, so a trainer
    * can compute loss on the model's turns only. Spans are 0-based
    * half-open [start, end) over the transcript; each covers exactly the
    * content after its "role: " header (headers and the joining
    * newlines stay masked out).
    *
    * Both ops root on the SAME [[keptTurns]] frame — the span arithmetic
    * (a per-thread ROWS-framed running sum of line lengths + 1) is the
    * only addition, so spans cannot drift from the transcript bytes; the
    * spec pins substring(transcript, start, end) == content per span.
    *
    * Shape at 100 TB: everything stays inside the thread-partitioned
    * window — no new shuffle beyond [[assembleThreads]]' own. Output:
    * (thread, turn, start, end) per maskRole turn, turn = 1-based kept
    * index.
    */
  def lossMaskSpans(df: DataFrame, threadCol: String, tsCol: String,
                    seqCol: String, roleCol: String, payloadCol: String,
                    maxTurns: Int, maskRole: String): DataFrame = {
    val kept = keptTurns(df, threadCol, tsCol, seqCol, roleCol, payloadCol,
      maxTurns)
    val wk = Window.partitionBy("thread").orderBy("run")
    val wkRows = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept
      .withColumn("_line_len",
        length(concat(col("role"), lit(": "), col("content"))).cast("long"))
      // cumulative chars through this line AS IF newline-terminated; the
      // line itself starts at cum − (len + 1)
      .withColumn("_cum", sum(col("_line_len") + lit(1L)).over(wkRows))
      .withColumn("turn", row_number().over(wk))
      .filter(col("role") === maskRole)
      .select(col("thread"), col("turn"),
        (col("_cum") - col("_line_len") - lit(1L) +
          length(col("role")).cast("long") + lit(2L)).as("start"),
        (col("_cum") - lit(1L)).as("end"))
  }
}
