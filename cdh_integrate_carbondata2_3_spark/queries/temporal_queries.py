"""Temporal-join gate queries over the events table.

As-of / range joins are absent from the reference (SURVEY.md §2.3) —
this is the event-stream extension surface. DuckDB's native ASOF JOIN
and a plain theta join serve as independently-implemented oracles for
the engine's union+window / bucketized formulations.

Null payloads (left rows with no match) are COALESCEd to sentinels on
BOTH sides: pandas widens nullable int columns to float on one side
but not always the other, which would break the value hash even when
the data agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join
from . import query
from .relational import _t


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"))


@query("join_asof_events", oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       COALESCE(c.click_id, -1) AS click_id,
       COALESCE(CAST(c.ts AS VARCHAR), '') AS click_ts
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""", spark_oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.purchase_id, p.user_id, c.click_id, c.ts AS cts,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.ts DESC) AS rn
  FROM purchases p LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id,
       COALESCE(click_id, -1) AS click_id,
       COALESCE(CAST(cts AS STRING), '') AS click_ts
FROM j WHERE rn = 1
""")
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: for each purchase, the user's most recent
    click at-or-before it (union+window, one shuffle — see
    operators/temporal.py)."""
    e = _t(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts").agg(F.max("event_id").alias("click_id")))
    j = asof_join(_purchases(spark, sf_dir), clicks, on="user_id")
    return j.select(
        "purchase_id", "user_id",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("matched_ts").cast("string"), F.lit("")).alias("click_ts"))


@query("join_asof_forward_tol", oracle="""
WITH errors AS (
  SELECT user_id, ts, MAX(event_id) AS error_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
), purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       COALESCE(CASE WHEN e.ts <= p.ts + INTERVAL 2 HOUR THEN e.error_id END,
                -1) AS error_id
FROM purchases p ASOF LEFT JOIN errors e
  ON p.user_id = e.user_id AND p.ts <= e.ts
""")
def join_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: the first error after each
    purchase, only if within 2 hours."""
    e = _t(spark, sf_dir, "events")
    errors = (e.filter(F.col("event_type") == "error")
              .groupBy("user_id", "ts").agg(F.max("event_id").alias("error_id")))
    j = asof_join(_purchases(spark, sf_dir), errors, on="user_id",
                  direction="forward", tolerance="INTERVAL 2 HOURS")
    return j.select("purchase_id", "user_id",
                    F.coalesce("error_id", F.lit(-1)).alias("error_id"))


@query("join_range_events", oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       COUNT(*) AS n_views,
       CAST(SUM(CAST(v.value AS DECIMAL(18,4))) AS DOUBLE) AS view_value
FROM events p JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 6 HOUR AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
""")
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: views in the 6 hours before each purchase,
    via the bucketized (key, time-bucket) equi-join."""
    e = _t(spark, sf_dir, "events")
    p = (_purchases(spark, sf_dir)
         .select("purchase_id", "user_id",
                 (F.col("ts") - F.expr("INTERVAL 6 HOURS")).alias("w_start"),
                 F.col("ts").alias("w_end")))
    v = (e.filter(F.col("event_type") == "view")
         .select("user_id", "ts", "value"))
    j = range_join(p, v, on="user_id", start_col="w_start", end_col="w_end",
                   bucket_s=6 * 3600)
    return (j.groupBy("purchase_id", "user_id")
            .agg(F.count(F.lit(1)).alias("n_views"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("view_value")))


@query("join_fuzzy_editdist", oracle="""
WITH L AS (SELECT DISTINCT c_name AS l FROM customer),
R AS (SELECT DISTINCT CASE WHEN c_custkey % 3 = 0
        THEN substr(c_name, 1, length(c_name) - 1)
        ELSE c_name END AS r
      FROM customer)
SELECT l, r, levenshtein(l, r) AS dist
FROM L, R
WHERE levenshtein(l, r) <= 1
""")
def join_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string similarity join (operators/fuzzyjoin):
    customer names against a perturbed copy (every third name loses
    its final character), pairs within ONE Levenshtein edit — which
    also catches full-name pairs differing in a single digit, so the
    result is dominated by genuine cross-matches, not the staged
    truncations. Spark blocks on the deletion neighborhood (SymSpell
    derivation — no cross join anywhere in the plan) then verifies
    with the built-in levenshtein; the oracle brute-forces the small
    gate corpus with a nested-loop join, so the blocking's
    COMPLETENESS is what's being checked."""
    from ..operators.fuzzyjoin import editdist_join
    cust = _t(spark, sf_dir, "customer")
    left = cust.select("c_name")
    right = cust.select(
        F.when(F.col("c_custkey") % 3 == 0,
               F.expr("substring(c_name, 1, length(c_name) - 1)"))
        .otherwise(F.col("c_name")).alias("pname"))
    return editdist_join(left, right, "c_name", "pname", max_edits=1)


@query("trajectory_similarity_nn", oracle="""
WITH seqs AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
             AS s
    FROM events GROUP BY user_id),
pairs AS (
    SELECT a.user_id AS ua, b.user_id AS ub, levenshtein(a.s, b.s) AS d
    FROM seqs a JOIN seqs b ON a.user_id <> b.user_id
    WHERE abs(length(a.s) - length(b.s)) <= 34
      AND levenshtein(a.s, b.s) <= 34),
ranked AS (
    SELECT ua, ub, d,
           ROW_NUMBER() OVER (PARTITION BY ua ORDER BY d, ub) AS rn
    FROM pairs)
SELECT ua AS user_id, ub AS nn_user, CAST(d AS BIGINT) AS nn_dist
FROM ranked WHERE rn = 1
""")
def trajectory_similarity_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-trajectory nearest neighbor (REPOSE ICDE 2021
    line of work, discrete-sequence variant): each user's time-ordered
    event-type sequence is one trajectory string; the all-pairs
    sequence-similarity join blocks on the LENGTH lower bound
    (|len(a)−len(b)| ≤ dist → same/adjacent length bands only, no
    cross join — plan-asserted in tests/test_fuzzyjoin) with the
    exact levenshtein refine JVM-side, then one min_by partial
    aggregate picks each user's nearest neighbor within distance 34
    (ties to the lower user id; users with no neighbor that close
    are absent — the threshold is sized SELECTIVE at every shipped
    sf, because a threshold comparable to sequence length makes
    every pair an output row and the join inherently quadratic —
    the r4 'the gate is the artifact a user copies' rule). The
    oracle brute-forces the small gate corpus with a nested-loop
    self-join, so the blocking's COMPLETENESS is what's
    hash-checked."""
    from . import cache_tracked
    from ..operators.fuzzyjoin import sequence_similarity_join
    # both the join (probe+build branches) and the symmetrizing union
    # reference these frames more than once — cache the derived form
    # or the events scan + sequence build + 22k levenshteins rerun
    # per branch (the round-6 recomputation pitfall)
    seqs = cache_tracked(
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.concat_ws("", F.transform(
            F.array_sort(F.collect_list(F.struct(
                "ts", "event_id",
                F.substring("event_type", 1, 1).alias("c")))),
            lambda r: r["c"])).alias("s")))
    pairs = cache_tracked(
        sequence_similarity_join(seqs, "user_id", "s", max_dist=34))
    sym = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"),
                     F.col("id_a").alias("id_b"), "dist"))
    return (sym.groupBy(F.col("id_a").alias("user_id"))
            .agg(F.min_by(F.col("id_b"), F.struct("dist", "id_b"))
                 .alias("nn_user"),
                 F.min(F.struct("dist", "id_b")).getField("dist")
                 .alias("nn_dist")))


# ---------------------------------------------------------------------------
# Funnel analysis + Markov transitions — round 8
# ---------------------------------------------------------------------------

_FUN_WINDOW_H = 72          # purchase must land within 72h of the view


@query("events_funnel_conversion", oracle=f"""
WITH e AS (SELECT user_id, ts, event_type, value FROM events),
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT s1.user_id, s1.t1,
              MIN(CASE WHEN e.event_type = 'click' AND e.value > 10.0
                        AND e.ts > s1.t1
                        AND e.ts <= s1.t1 + INTERVAL {_FUN_WINDOW_H} HOUR
                       THEN e.ts END) AS t2
       FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
       GROUP BY s1.user_id, s1.t1),
s3 AS (SELECT s2.user_id, s2.t1, s2.t2,
              MIN(CASE WHEN e.event_type = 'signup' AND e.value > 14.0
                        AND e.ts > s2.t2
                        AND e.ts <= s2.t1 + INTERVAL {_FUN_WINDOW_H} HOUR
                       THEN e.ts END) AS t3
       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
       GROUP BY s2.user_id, s2.t1, s2.t2),
s4 AS (SELECT s3.user_id, s3.t1, s3.t2, s3.t3,
              MIN(CASE WHEN e.event_type = 'purchase' AND e.value > 17.0
                        AND e.ts > s3.t3
                        AND e.ts <= s3.t1 + INTERVAL {_FUN_WINDOW_H} HOUR
                       THEN e.ts END) AS t4
       FROM s3 LEFT JOIN e ON e.user_id = s3.user_id
       GROUP BY s3.user_id, s3.t1, s3.t2, s3.t3),
c AS (SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3,
             COUNT(t4) AS n4 FROM s4)
SELECT step, step_name, n_users,
       CASE WHEN n1 = 0 THEN 0.0
            ELSE CAST(ROUND(n_users / CAST(n1 AS DOUBLE), 6) AS DOUBLE)
       END AS conversion
FROM c, (VALUES (1, 'view'), (2, 'click_gt10'), (3, 'signup_gt14'),
                (4, 'purchase_gt17')) AS st(step, step_name),
LATERAL (SELECT CASE st.step WHEN 1 THEN n1 WHEN 2 THEN n2
                             WHEN 3 THEN n3 ELSE n4 END AS n_users)
""")
def events_funnel_conversion(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """First-touch funnel (operators/funnel.py): view → high-value
    click → high-value signup → high-value purchase, each strictly
    after the previous step and inside a 72 h window of the first
    view. One filter→groupBy(user).min(ts) pass per step, user-keyed
    joins between — no whole-stream window, no per-user sort, no UDF.
    The oracle replays every step's earliest-next rule (greedy is
    optimal for completion — see the operator docstring) plus the
    window arithmetic, so a green hash pins ordering semantics,
    NULL-step propagation, and the conversion math."""
    from ..operators.funnel import funnel_counts
    e = _t(spark, sf_dir, "events")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click_gt10", (F.col("event_type") == "click")
         & (F.col("value") > 10.0)),
        ("signup_gt14", (F.col("event_type") == "signup")
         & (F.col("value") > 14.0)),
        ("purchase_gt17", (F.col("event_type") == "purchase")
         & (F.col("value") > 17.0)),
    ]
    return funnel_counts(e, steps, within_hours=_FUN_WINDOW_H)


@query("events_markov_transitions", oracle="""
WITH seq AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT cur, nxt, COUNT(*) AS n,
       CAST(ROUND(COUNT(*) / CAST(SUM(COUNT(*))
                  OVER (PARTITION BY cur) AS DOUBLE), 6) AS DOUBLE)
         AS p
FROM seq WHERE nxt IS NOT NULL
GROUP BY cur, nxt
""")
def events_markov_transitions(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-user behavioral Markov chain: (state → next state)
    transition counts and row-normalized probabilities. LEAD windows
    partition by user (narrow, user-keyed shuffle — never a global
    sort), the count groupBy is state-pair-keyed, and the
    normalization rides a partition-by-state window over the tiny
    aggregated frame. The session-model view of an interaction log —
    input for simulation, anomaly scoring, or curriculum mixing."""
    e = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"))
    counts = (seq.filter(F.col("nxt").isNotNull())
              .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")))
    tot = W.partitionBy("cur")
    return counts.select(
        "cur", "nxt", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).cast("double")
        .alias("p"))


_DECAY_US = 7 * 86400 * 1_000_000       # half-life-ish: 1/e per week


@query("events_time_decay_score", oracle=f"""
WITH t AS (
  SELECT user_id, value, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS mx
  FROM events)
SELECT user_id, COUNT(*) AS n_events,
       CAST(ROUND(SUM(value * exp(-((mx - us) / {_DECAY_US}.0))), 6)
            AS DOUBLE) AS decayed
FROM t GROUP BY user_id
""", spark_oracle=f"""
WITH t AS (
  SELECT user_id, value, ts,
         MAX(ts) OVER (PARTITION BY user_id) AS mx
  FROM events)
SELECT user_id, COUNT(*) AS n_events,
       CAST(ROUND(SUM(value
                      * exp(-(timestampdiff(MICROSECOND, ts, mx)
                              / {_DECAY_US}.0))), 6)
            AS DOUBLE) AS decayed
FROM t GROUP BY user_id
""")
def events_time_decay_score(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per user — the
    recency-weighted engagement/quality signal (weight 1/e per week
    of age relative to the user's LAST event). One user-partitioned
    window (max ts) + one groupBy — both narrow user-keyed shuffles;
    the decay weight is pure codegen arithmetic. Timezone-proof by
    construction: Spark diffs TIMESTAMP_NTZ values directly
    (timestampdiff never consults the session zone) and the oracle
    diffs epoch_us values — the same integer microseconds — so the
    hash holds under any driver session timezone."""
    from pyspark.sql import Window as W
    e = _t(spark, sf_dir, "events")
    mx = F.max("ts").over(W.partitionBy("user_id"))
    w = F.exp(-(F.expr("timestampdiff(MICROSECOND, ts, mx)")
                / F.lit(float(_DECAY_US))))
    return (e.select("user_id", "value", mx.alias("mx"), "ts")
            .select("user_id", (F.col("value") * w).alias("wv"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("wv"), 6).cast("double")
                 .alias("decayed")))


# ---------------------------------------------------------------------------
# Robust anomaly detection (median/MAD) — round 9
# ---------------------------------------------------------------------------

_MAD_K = 3.0          # flag |v - med| > K * 1.4826 * MAD
_MAD_C = 1.4826       # normal-consistency constant


_MAD_ORACLE = f"""
WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY event_type),
d AS (SELECT e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS dev
      FROM events e JOIN m ON e.event_type = m.event_type),
md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
       FROM d GROUP BY event_type)
SELECT d.event_type,
       COUNT(*) AS n,
       CAST(ROUND(d.med, 6) AS DOUBLE) AS med,
       CAST(ROUND(md.mad, 6) AS DOUBLE) AS mad,
       CAST(SUM(CASE WHEN ROUND(d.dev, 9)
                       > ROUND({_MAD_K} * {_MAD_C} * md.mad, 9)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM d JOIN md ON d.event_type = md.event_type
GROUP BY d.event_type, d.med, md.mad
"""


# Spark twin: identical SQL — only the exact-percentile function name
# differs (DuckDB quantile_cont / Spark percentile, same linear
# interpolation; the 9-dp rounding both sides absorbs ulp drift).
@query("events_anomaly_mad", oracle=_MAD_ORACLE,
       spark_oracle=_MAD_ORACLE.replace("quantile_cont", "percentile"))
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group anomaly detection: median/MAD z-scores
    (Hampel's rule — |v − median| > K·1.4826·MAD), the outlier flag
    that survives the outliers themselves, unlike mean/stddev which
    the anomalies drag. Two grouped EXACT percentile aggregations
    (median, then median absolute deviation) + one flag count — the
    pipeline pass that screens metric/telemetry streams before they
    poison a training mix. Deviations and thresholds are rounded to
    9 dp on BOTH sides before comparison so last-ulp interpolation
    differences between engines cannot flip a flag; a green hash
    pins medians, MADs, and every per-row anomaly decision."""
    e = _t(spark, sf_dir, "events").select("event_type", "value")
    med = (e.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5)").alias("med")))
    d = (e.join(med, "event_type")
         .withColumn("dev", F.abs(F.col("value") - F.col("med"))))
    mad = (d.groupBy("event_type")
           .agg(F.expr("percentile(dev, 0.5)").alias("mad")))
    return (d.join(mad, "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.round(F.col("dev"), 9)
                              > F.round(F.lit(_MAD_K * _MAD_C)
                                        * F.col("mad"), 9), 1)
                       .otherwise(0)).cast("bigint")
                 .alias("n_anomalies"))
            .select("event_type", "n",
                    F.round("med", 6).cast("double").alias("med"),
                    F.round("mad", 6).cast("double").alias("mad"),
                    "n_anomalies"))
