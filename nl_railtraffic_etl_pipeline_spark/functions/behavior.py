"""Behavioral / product analytics over event streams: ordered funnels,
cohort retention, and transition (Markov) matrices.

The reference's analytics layer answers "what happened" questions over rail
disruptions (aggregators.py Q1-Q6); these are the same class of question
over a user-event stream — the workload an events table
(user_id, ts, event_type) exists for.  All three are pure DataFrame plans:

- ``funnel``: strictly-ordered stage conversion.  A user counts for stage
  i+1 only with an event AFTER their stage-i entry time (not merely "did
  both sometime") — the semantics product funnels mean and naive
  conditional aggregation gets wrong.
- ``cohort_retention``: users bucketed by first-activity week; per
  (cohort, week-offset) distinct active users and the retained share.
- ``event_transitions``: consecutive event-type bigrams per user — the
  empirical Markov transition matrix of the event stream.

Scale shape (100 TB of events): every stage is either a map-side filter,
a ``user_id``-keyed aggregation/join (one hash partitioning reused across
stages — co-partitioned, no broadcast of the fact side), or an
aggregation onto a frame whose size is the number of stages / cohorts /
type-pairs (metadata-scale).  Windows only ever run per-user
(``event_transitions``) or over post-aggregation frames; nothing funnels
the raw stream through a single partition.

Whale keys (window skew): a per-user window still sorts ONE user's whole
history in one task, so a bot owning a macroscopic share of events makes
that task the straggler.  Both stream-windowed operators therefore ship
an exact whale-safe twin — ``funnel(chain="join")`` (partial-aggregating
join chain, no per-user sort anywhere) and
``event_transitions(bucket_seconds=...)`` (time-segmented pair
decomposition; the whale spreads across one task per active bucket).
``cohort_retention(prestamp="join")`` (first-activity stamp via
partial-aggregating groupBy joined back, instead of the unordered
per-user window that buffers the whale's frame).  SCALE.md "Window
skew" has measured probe numbers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel",
    "funnel_windowed",
    "cohort_retention",
    "event_transitions",
    "trailing_anomalies",
    "rfm_segments",
    "attribute_conversions",
    "churn_labels",
    "time_to_convert",
    "dau_wau_stickiness",
    "session_funnel",
    "rate_limit_violations",
]


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    chain: str = "window",
) -> DataFrame:
    """Strictly-ordered funnel conversion counts.

    ``stages`` is the ordered event-type sequence (e.g. ``["view",
    "click", "purchase"]``).  A user reaches stage 1 with any stage-1
    event; stage i+1 with any stage-(i+1) event strictly after their
    EARLIEST qualifying stage-i event.  Earliest-entry semantics make the
    result deterministic and monotone (stage counts never increase).

    Returns (stage, stage_name, users, conversion_pct) — one row per
    stage, conversion_pct relative to stage 1 (rounded 2, NULL when stage
    1 is empty).

    ``chain`` picks the physical strategy; both are exact and produce
    identical rows:

    - ``"window"`` (default): ONE user-keyed shuffle — each stage's entry
      time is a conditional min over the same user partitioning, stacked
      Window nodes on one Exchange.  Fewest shuffles, but a whale key (one
      user holding a macroscopic share of events) funnels that user's
      whole filtered history through one task's window sort.
    - ``"join"``: per-stage conditional minima via partial-aggregating
      ``groupBy`` + shuffle-hash joins.  More (filtered, slice-sized)
      shuffles, but NO per-user sort anywhere: map-side combine collapses
      a whale to one row per map task before each shuffle, and the
      whale's slice rows STREAM through the hash join probe side straight
      into the next partial aggregation.  This is the whale-safe plan for
      bot-heavy streams (SCALE.md "window skew" section has probe
      numbers).

    Either way the stream is pre-filtered to the stage types — events of
    other types can never contribute an entry (their rows only carried
    all-NULL window flags), so dropping them map-side before the shuffle
    is free and exact.
    """
    if not stages:
        raise ValueError("need at least one funnel stage")
    if chain not in ("window", "join"):
        raise ValueError(f"funnel chain must be window/join, not {chain!r}")
    cur = events.filter(F.col(type_col).isin(list(stages))).select(
        user_col, F.col(type_col).alias("_type"), F.col(ts_col).alias("_ts")
    )
    entry_cols = [f"_entry_{i}" for i in range(len(stages))]
    if chain == "window":
        w = Window.partitionBy(user_col)
        prev_entry = None
        for i, stage_type in enumerate(stages):
            qualifies = F.col("_type") == stage_type
            if prev_entry is not None:
                qualifies = qualifies & (F.col("_ts") > F.col(prev_entry))
            cur = cur.withColumn(
                entry_cols[i], F.min(F.when(qualifies, F.col("_ts"))).over(w)
            )
            prev_entry = entry_cols[i]
        # per-user flags -> one global 1-row aggregate of cardinalities
        one_per_user = cur.groupBy(user_col).agg(
            *[F.max(F.col(c).isNotNull()).alias(c) for c in entry_cols]
        )
        counts = one_per_user.agg(
            *[
                F.coalesce(F.sum(F.col(c).cast("bigint")), F.lit(0)).alias(
                    f"_users_{i}"
                )
                for i, c in enumerate(entry_cols)
            ]
        )
    else:
        # join chain: E_i = (stage-i slice ⋈ E_{i-1}) filtered to later
        # timestamps, min-aggregated.  groupBy partial aggregation is the
        # whale killer: each map task emits ONE candidate row per local
        # user before the shuffle.  The shuffle_hash hint keeps the entry
        # frame the build side so the event slice streams (sort-merge
        # would re-sort the whale's rows — exactly the cost we're
        # avoiding).
        entries = (
            cur.filter(F.col("_type") == stages[0])
            .groupBy(user_col)
            .agg(F.min("_ts").alias("_prev"))
        )
        frames = [entries]
        for stage_type in stages[1:]:
            entries = (
                cur.filter(F.col("_type") == stage_type)
                .join(entries.hint("shuffle_hash"), user_col)
                .filter(F.col("_ts") > F.col("_prev"))
                .groupBy(user_col)
                .agg(F.min("_ts").alias("_prev"))
            )
            frames.append(entries)
        # k metadata-scale counts (one row each), cross-joined into the
        # same 1-row shape the window path builds
        counts = frames[0].agg(F.count("*").alias("_users_0"))
        for i, f in enumerate(frames[1:], start=1):
            counts = counts.crossJoin(
                f.agg(F.count("*").alias(f"_users_{i}"))
            )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(stage_type).alias("stage_name"),
                F.col(f"_users_{i}").alias("users"),
            )
            for i, stage_type in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(stage_rows).alias("s"), F.col("_users_0"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_name").alias("stage_name"),
            F.col("s.users").alias("users"),
            F.round(
                F.lit(100.0)
                * F.col("s.users")
                / F.nullif(F.col("_users_0"), F.lit(0)),
                2,
            ).alias("conversion_pct"),
        )
    )


def funnel_windowed(
    events: DataFrame,
    stages: Sequence[str],
    max_gap_hours: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-window funnel: each stage must land within
    ``max_gap_hours`` of the PREVIOUS stage's entry.

    Same earliest-entry semantics as :func:`funnel` plus the deadline —
    the form product analytics actually uses ("clicked within 4 h of the
    view"), which unbounded funnels overstate.  A user enters stage i+1
    with an event of that type in the half-open window
    ``(entry_i, entry_i + gap]``; entry times remain minima, so stage
    counts stay monotone non-increasing.

    Returns the same (stage, stage_name, users, conversion_pct) frame as
    :func:`funnel`.

    Plan: the join-chain shape (partial-aggregating groupBy per stage +
    shuffle-hash join on user) — whale-safe for the same reason as
    ``funnel(chain="join")``: no per-user window sort anywhere, a bot's
    slice collapses map-side before every shuffle.  Timestamps are
    integral micros and the deadline is exact interval arithmetic, so
    the boundary row (ts == entry + gap) is included identically in any
    engine.
    """
    if not stages:
        raise ValueError("need at least one funnel stage")
    if max_gap_hours <= 0:
        raise ValueError(f"max_gap_hours must be > 0, got {max_gap_hours}")
    gap = F.expr(f"INTERVAL {int(max_gap_hours)} HOURS")
    cur = events.filter(F.col(type_col).isin(list(stages))).select(
        user_col, F.col(type_col).alias("_type"), F.col(ts_col).alias("_ts")
    )
    entries = (
        cur.filter(F.col("_type") == stages[0])
        .groupBy(user_col)
        .agg(F.min("_ts").alias("_prev"))
    )
    frames = [entries]
    for stage_type in stages[1:]:
        entries = (
            cur.filter(F.col("_type") == stage_type)
            .join(entries.hint("shuffle_hash"), user_col)
            .filter(
                (F.col("_ts") > F.col("_prev"))
                & (F.col("_ts") <= F.col("_prev") + gap)
            )
            .groupBy(user_col)
            .agg(F.min("_ts").alias("_prev"))
        )
        frames.append(entries)
    counts = frames[0].agg(F.count("*").alias("_users_0"))
    for i, fr in enumerate(frames[1:], start=1):
        counts = counts.crossJoin(fr.agg(F.count("*").alias(f"_users_{i}")))
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(stage_type).alias("stage_name"),
                F.col(f"_users_{i}").alias("users"),
            )
            for i, stage_type in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(stage_rows).alias("s"), F.col("_users_0"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_name").alias("stage_name"),
            F.col("s.users").alias("users"),
            F.round(
                F.lit(100.0)
                * F.col("s.users")
                / F.nullif(F.col("_users_0"), F.lit(0)),
                2,
            ).alias("conversion_pct"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    prestamp: str = "window",
) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = ISO week (Monday-truncated) of the user's first event;
    ``week_offset`` counts weeks since then.  Returns (cohort_week,
    week_offset, active_users, retention_pct) where retention_pct is the
    share of the cohort active in that offset week (offset 0 is 100 by
    construction).

    Plan: ONE user-keyed shuffle of the (user, ts) stream — the first-
    activity stamp is a per-user window min over that partitioning, not a
    groupBy + join back (which would shuffle the stream twice and add a
    join).  Then a distinct on (user, cohort, offset) and a count onto
    the cohorts x offsets frame — whose size is weeks^2, metadata-scale
    at any event volume.  Cohort sizes broadcast back onto it.

    ``prestamp="join"`` is the exact whale-safe twin of that first stage:
    the unordered window buffers each user's whole frame in one task, so
    a whale key turns it into the straggler; the join form partial-
    aggregates the min (whale -> one row per map task) and STREAMS the
    events through a shuffle-hash join probe side — no per-user buffer.
    """
    if prestamp not in ("window", "join"):
        raise ValueError(
            f"cohort_retention prestamp must be window/join, not {prestamp!r}"
        )
    if prestamp == "join":
        firsts = events.groupBy(user_col).agg(
            F.min(ts_col).alias("_first")
        )
        base = events.select(user_col, ts_col).join(
            firsts.hint("shuffle_hash"), user_col
        )
    else:
        w_user = Window.partitionBy(user_col)
        base = events.select(user_col, ts_col).withColumn(
            "_first", F.min(ts_col).over(w_user)
        )
    cohort = F.to_date(F.date_trunc("week", F.col("_first")))
    # every event is >= the user's first event, so week_offset >= 0 by
    # construction — no post-hoc filter needed
    activity = (
        base.select(
            F.col(user_col),
            cohort.alias("cohort_week"),
            F.expr(
                f"datediff(to_date(date_trunc('week', {ts_col})), "
                "to_date(date_trunc('week', _first))) div 7"
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    # cohort size == offset-0 user count (every user is active in their own
    # first week), so sizes come from `activity` itself — the two consumers
    # share the distinct's exchange (ReuseExchange) instead of re-running
    # the stream window
    sizes = (
        activity.filter(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.count("*").alias("_cohort_size"))
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            F.round(
                F.lit(100.0) * F.col("active_users") / F.col("_cohort_size"), 2
            ).alias("retention_pct"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Empirical Markov transition matrix of per-user event sequences.

    Consecutive (by ``ts_col``, tie-broken on ``order_cols`` for a total
    order — cross-engine determinism) event-type pairs per user, counted
    corpus-wide.  Returns (src, dst, n_transitions, share_pct) where
    share_pct normalizes each source row to 100 (rounded 2).

    ``bucket_seconds=None``: ONE user-keyed window (the only shuffle of
    the raw stream), then aggregation onto the |types|^2 frame; the share
    window runs over that metadata-scale frame, never the stream.  A
    whale user's whole history sorts in one task under this plan.

    ``bucket_seconds=<width>``: the exact whale-safe decomposition.
    Events are segmented by (user, time bucket); within-bucket pairs come
    from a window partitioned on BOTH keys — a whale's history spreads
    across as many tasks as it spans buckets — and the cross-boundary
    pairs come from a per-(user, bucket) first/last summary (built by
    partial-aggregating ``min_by``/``max_by``, whale-proof by map-side
    combine).  The summary holds ≤ one row per active bucket per user —
    bounded by time-range/width, NOT by event count — so its user-keyed
    lead window never sees more than that many rows per user.  The pair
    multiset is identical: a consecutive pair is either within one bucket
    (emitted by the segment window exactly once) or spans nonempty
    buckets (emitted by the summary lead exactly once; time-bucketing is
    monotone in the sort order, ties share a bucket).
    """
    order = [F.col(c) for c in order_cols]
    if bucket_seconds is None:
        w = Window.partitionBy(user_col).orderBy(F.col(ts_col), *order)
        raw_pairs = events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
    else:
        ord_struct = F.struct(F.col(ts_col), *order)
        ev = events.select(
            user_col,
            F.col(type_col).alias("_t"),
            ts_col,
            *order_cols,
            F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).alias(
                "_b"
            ),
        )
        w_seg = Window.partitionBy(user_col, "_b").orderBy(
            F.col(ts_col), *order
        )
        within = ev.select(
            F.col("_t").alias("src"), F.lead("_t").over(w_seg).alias("dst")
        )
        summary = ev.groupBy(user_col, "_b").agg(
            F.min_by("_t", ord_struct).alias("_first"),
            F.max_by("_t", ord_struct).alias("_last"),
        )
        w_sum = Window.partitionBy(user_col).orderBy("_b")
        boundary = summary.select(
            F.col("_last").alias("src"),
            F.lead("_first").over(w_sum).alias("dst"),
        )
        raw_pairs = within.unionByName(boundary)
    pairs = (
        raw_pairs.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_transitions"))
    )
    share = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.lit(100.0)
            * F.col("n_transitions")
            / F.sum("n_transitions").over(share),
            2,
        ).alias("share_pct"),
    )


def trailing_anomalies(
    events: DataFrame,
    window_rows: int = 10,
    min_prior: int = 5,
    factor: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity trailing-baseline anomaly detection: an event is
    anomalous when its value exceeds ``factor`` x the mean of that user's
    previous ``window_rows`` values (at least ``min_prior`` priors
    required — cold-start rows are never flagged).

    Cross-engine-exact by construction: values quantize to decimal via
    the double's shortest-roundtrip string, and the mean comparison is
    multiplied out (``value * n > factor * sum``) so the decision is pure
    decimal arithmetic — no float accumulation, no division until the
    reported ``trailing_mean`` display column (one IEEE division, then
    ROUND).  The window orders by (ts, id) — a total order, so frame
    contents are engine-independent under timestamp ties.

    Plan: ONE user-keyed shuffle; the trailing frame is a bounded ROWS
    frame (running state of ``window_rows`` values per task).  Trailing
    windows are inherently per-key sequential — for whale keys the same
    caveat and mitigations as the funnel family apply (see
    SCALE.md "Window skew").
    """
    dv = F.col(value_col).cast("string").cast("decimal(24,10)")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window_rows, -1)
    )
    base = events.select(
        user_col, ts_col, id_col, value_col, dv.alias("_dv")
    ).select(
        "*",
        F.count("_dv").over(w).alias("_n"),
        F.sum("_dv").over(w).alias("_sum"),
    )
    return base.filter(
        (F.col("_n") >= min_prior)
        & (F.col("_dv") * F.col("_n") > F.lit(factor) * F.col("_sum"))
    ).select(
        user_col,
        id_col,
        value_col,
        F.round(F.col("_sum").cast("double") / F.col("_n"), 4).alias(
            "trailing_mean"
        ),
        F.col("_n").cast("int").alias("n_prior"),
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation.

    Per user: days since last event (vs the corpus max date), event
    count, and decimal-exact value sum; each metric scored 1-4 against
    the EXACT corpus quartiles of the user-level frame (higher is better
    for F/M; for recency, lower — more recent — is better), plus the
    concatenated segment label ('444' = best).

    Deliberately NOT ``ntile``: a global NTILE over users funnels the
    whole user frame through one window task.  The quartile thresholds
    come from a distributed two-stage ``percentile`` aggregation
    (bit-matched to DuckDB quantile_cont — same contract as the quantile
    gates), broadcast as one row, and scoring is map-side.  Plan: one
    user-keyed aggregation, two metadata-scale aggs, zero windows.
    Boundary semantics are strict (``> q`` / ``< q``): a metric exactly
    AT a quartile stays in the lower score band — documented, exact, and
    identical cross-engine because both engines compare the same doubles.
    """
    dv = F.col(value_col).cast("string").cast("decimal(24,10)")
    per_user = events.groupBy(user_col).agg(
        F.max(ts_col).alias("_last"),
        F.count("*").alias("frequency"),
        F.sum(dv).alias("_msum"),
    )
    gmax = events.agg(F.max(ts_col).alias("_gmax"))
    pu = per_user.crossJoin(F.broadcast(gmax)).select(
        user_col,
        F.datediff(F.col("_gmax"), F.col("_last")).alias("recency_days"),
        "frequency",
        F.col("_msum").cast("double").alias("monetary"),
    )
    q = pu.agg(
        *[
            F.percentile("recency_days", p).alias(f"_r{i}")
            for i, p in enumerate((0.25, 0.5, 0.75), 1)
        ],
        *[
            F.percentile("frequency", p).alias(f"_f{i}")
            for i, p in enumerate((0.25, 0.5, 0.75), 1)
        ],
        *[
            F.percentile("monetary", p).alias(f"_m{i}")
            for i, p in enumerate((0.25, 0.5, 0.75), 1)
        ],
    )
    lower_better = lambda x, pre: (  # noqa: E731
        F.lit(1)
        + sum(
            (F.col(x) < F.col(f"{pre}{i}")).cast("int") for i in (1, 2, 3)
        )
    ).cast("int")
    higher_better = lambda x, pre: (  # noqa: E731
        F.lit(1)
        + sum(
            (F.col(x) > F.col(f"{pre}{i}")).cast("int") for i in (1, 2, 3)
        )
    ).cast("int")
    scored = pu.crossJoin(F.broadcast(q)).select(
        user_col,
        "recency_days",
        "frequency",
        F.round(F.col("monetary"), 4).alias("monetary"),
        lower_better("recency_days", "_r").alias("r_score"),
        higher_better("frequency", "_f").alias("f_score"),
        higher_better("monetary", "_m").alias("m_score"),
    )
    return scored.select(
        "*",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    window_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    event_type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch conversion attribution: for every conversion event,
    the touch events by the same user in the preceding ``window_hours``,
    with the three standard credit models side by side — first-touch
    (1.0 to the earliest touch), last-touch (1.0 to the latest touch at
    or before the conversion), and linear (1/n to each).

    Returns (conversion_id, conversion_ts, user_id, touch_id, touch_ts,
    n_touches, credit_first, credit_last, credit_linear) — one row per
    (conversion, touch) pair; conversions with zero touches in window are
    absent (join-based attribution reports credited touches, not
    uncredited conversions — count those with an anti-join upstream).
    Linear credit is ONE IEEE division of exact integers (1/n), so every
    credit value replays bit-identically cross-engine.  Touch order is
    total: (ts, id) — coincident touches rank deterministically; a touch
    AT the conversion timestamp is in-window (<=), mirroring the as-of
    family's boundary rule.

    Plan shape: conversions and touches are two filtered projections of
    ONE events scan; the pairing is a USER-keyed equi-join (per-user
    histories bound each probe — never a time-bucket cross product, the
    same shape as the funnel family) filtered by the window predicate;
    the per-conversion rank/count windows then run over each
    conversion's own touch set (bounded by touches-per-user-per-window).
    One user shuffle + one conversion-keyed window pass.
    """
    conv = events.filter(F.col(event_type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
    )
    touch = events.filter(
        F.col(event_type_col).isin(list(touch_types))
    ).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
    )
    lo = F.col("conversion_ts") - F.expr(f"INTERVAL {window_hours} HOURS")
    paired = conv.join(touch, "_u").filter(
        (F.col("touch_ts") <= F.col("conversion_ts"))
        & (F.col("touch_ts") > lo)
    )
    w = Window.partitionBy("conversion_id")
    asc = w.orderBy(F.asc("touch_ts"), F.asc("touch_id"))
    desc = w.orderBy(F.desc("touch_ts"), F.desc("touch_id"))
    return paired.select(
        "conversion_id",
        "conversion_ts",
        F.col("_u").alias(user_col),
        "touch_id",
        "touch_ts",
        F.count("*").over(w).cast("int").alias("n_touches"),
        F.when(F.row_number().over(asc) == 1, 1.0)
        .otherwise(0.0)
        .alias("credit_first"),
        F.when(F.row_number().over(desc) == 1, 1.0)
        .otherwise(0.0)
        .alias("credit_last"),
        (F.lit(1.0) / F.count("*").over(w)).alias("credit_linear"),
    )


def ohlc_bars(
    df: DataFrame,
    bucket_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """OHLC downsample bars per ``bucket_cols`` group: ``open_val`` (value
    at the earliest (ts, id)), ``high_val`` / ``low_val`` (extremes),
    ``close_val`` (value at the latest (ts, id)), ``n_events``.

    The scale-correct plan for "first/last per bucket" is ONE aggregate
    with partial-aggregating ``min_by``/``max_by`` on the (ts, id)
    struct — partials combine map-side, so a whale bucket never
    concentrates its rows on one task the way the row_number window
    formulation would.  (The struct ordering key has no mutable hash
    buffer, so Spark picks SortAggregate — a per-partition sort by the
    GROUP key, still partial+final, plan-asserted in
    test_plan_shapes.py.)  ``id_col`` makes the ordering total: ts ties
    break deterministically, matching the engine-wide tiebreak contract.
    """
    tie = F.struct(F.col(ts_col), F.col(id_col))
    return df.groupBy(*bucket_cols).agg(
        F.min_by(value_col, tie).alias("open_val"),
        F.max(value_col).alias("high_val"),
        F.min(value_col).alias("low_val"),
        F.max_by(value_col, tie).alias("close_val"),
        F.count("*").cast("bigint").alias("n_events"),
    )


def pareto_frontier(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-group Pareto frontier (skyline) on (``ts_col``, ``value_col``),
    both maximized: a row survives iff no other row in its group weakly
    dominates it (>= on both axes, > on at least one).

    The naive spec is the quadratic all-pairs dominance test (the
    oracle's NOT EXISTS).  The engine's plan is the O(n log n) sweep:
    collapse to the per-ts max, then one ts-descending window keeps rows
    strictly above the running max of all later rows — ONE group-keyed
    shuffle, no self-join, no cartesian.  Equal-value ties resolve to the
    latest ts (weak dominance removes the earlier duplicates).
    """
    keys = list(group_cols)
    m = df.groupBy(*keys, ts_col).agg(F.max(value_col).alias(value_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        m.withColumn("_lm", F.max(value_col).over(w))
        .filter(F.col("_lm").isNull() | (F.col(value_col) > F.col("_lm")))
        .select(*keys, ts_col, value_col)
    )


def event_ngram_counts(
    df: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Counts of length-``n`` consecutive event-type paths per the
    engine-wide (ts, id) total order within each user's stream —
    sequential pattern mining's frequency floor (event_transitions is
    the n=2 member).

    Plan: ``n - 1`` leads over ONE user-keyed shuffle build the n-gram
    stream in place (no self-joins, no explode), then a domain-bounded
    aggregate: at most |types|^n groups regardless of input size.
    Columns: e1..eN, n_paths.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cols = [F.col(type_col).alias("e1")] + [
        F.lead(type_col, k).over(w).alias(f"e{k + 1}")
        for k in range(1, n)
    ]
    seq = df.select(*cols)
    keep = seq
    for k in range(2, n + 1):
        keep = keep.filter(F.col(f"e{k}").isNotNull())
    names = [f"e{k}" for k in range(1, n + 1)]
    return keep.groupBy(*names).agg(
        F.count("*").cast("bigint").alias("n_paths")
    )


def cohort_value_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Cohort LTV matrix — the value-weighted twin of
    :func:`cohort_retention`: per (first-seen cohort week x weeks-since)
    cell, exact event-value sums plus the cumulative LTV curve along
    each cohort row.

    First-seen is a MIN window over ONE user-keyed shuffle (no join);
    week offsets are exact because both endpoints are week-truncated
    (datediff is always a multiple of 7).  The cell aggregate partial-
    aggregates map-side and the cumulative window runs on the
    POST-AGGREGATION frame (cohort x offset cells, metadata-scale),
    never the event stream — plan-asserted in test_plan_shapes.py.
    NULL-user rows are dropped (they have no cohort; the SQL replay's
    equi-join drops them implicitly — made explicit here so both
    mechanisms agree by construction).
    Output: ``cohort_week``, ``week_offset``, ``n_events``,
    ``week_value``, ``cumulative_value``.
    """
    flat = (
        df.filter(F.col(user_col).isNotNull())
        .withColumn(
            "_first_ts", F.min(ts_col).over(Window.partitionBy(user_col))
        )
        .filter(F.col(value_col).isNotNull())
        .select(
            F.date_trunc("week", "_first_ts").cast("date")
            .alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", ts_col).cast("date"),
                    F.date_trunc("week", "_first_ts").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            F.col(value_col).cast("string").cast("decimal(18,6)")
            .alias("_dv"),
        )
    )
    cell = flat.groupBy("cohort_week", "week_offset").agg(
        F.sum("_dv").alias("_wk"), F.count("*").alias("n_events")
    )
    cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cell.select(
        "cohort_week",
        "week_offset",
        "n_events",
        F.round(F.col("_wk").cast("double"), 6).alias("week_value"),
        F.round(F.sum("_wk").over(cum).cast("double"), 6)
        .alias("cumulative_value"),
    )


def type_cooccurrence_lift(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Market-basket affinity between event types: for every unordered
    type pair, how many users did BOTH, and the lift
    ``P(a and b) / (P(a) * P(b))`` = ``n_both * n_users / (n_a * n_b)``
    — the association-rule statistic behind "users who X also Y".
    Lift > 1 means the pair co-occurs more than independence predicts.

    Numerators and denominators are exact integer products; the only
    float op is one cast-and-divide (rounded to 9 digits).  Plan: ONE
    user-keyed shuffle builds the distinct (user, type) frame and the
    self-join pairs over the SAME partitioning (no second fact
    exchange); the per-type counts and the 1-row user total are
    metadata-scale broadcast joins.  Pair keys are canonicalized
    ``t1 < t2`` so each pair appears once.  Output: ``t1``, ``t2``,
    ``n_both``, ``lift``.
    """
    u = (
        df.filter(F.col(type_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("_u"), F.col(type_col).alias("_t"))
        .distinct()
    )
    pairs = (
        u.alias("a")
        .join(
            u.alias("b"),
            (F.col("a._u") == F.col("b._u"))
            & (F.col("a._t") < F.col("b._t")),
        )
        .groupBy(
            F.col("a._t").alias("t1"), F.col("b._t").alias("t2")
        )
        .agg(F.count("*").alias("n_both"))
    )
    tc = u.groupBy(F.col("_t")).agg(F.count("*").alias("n_t"))
    tot = u.select("_u").distinct().agg(F.count("*").alias("n_users"))
    return (
        pairs.join(
            F.broadcast(tc.select(F.col("_t").alias("t1"),
                                  F.col("n_t").alias("n1"))), "t1"
        )
        .join(
            F.broadcast(tc.select(F.col("_t").alias("t2"),
                                  F.col("n_t").alias("n2"))), "t2"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("n_users")).cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                9,
            ).alias("lift"),
        )
    )


def longest_streak(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-day activity streak per user — the engagement
    metric on the CALENDAR lattice (vs the sessionizer's seconds-gap
    islands): distinct active days, the day-minus-dense_rank island key
    (consecutive days share it), island sizes, per-user max with the
    EARLIEST start breaking equal-length ties.

    All integers; ONE fact-sized user-keyed shuffle carries the
    distinct and the rank window (the island aggregate re-keys the
    already-shrunk distinct-days frame).  Output: ``user_col``,
    ``longest_streak``, ``streak_start``, ``active_days``.
    """
    d = df.select(
        user_col, F.to_date(ts_col).alias("day")
    ).distinct()
    i = d.select(
        user_col,
        "day",
        F.date_sub(
            "day",
            F.dense_rank()
            .over(Window.partitionBy(user_col).orderBy("day"))
            .cast("int"),
        ).alias("island"),
    )
    runs = i.groupBy(user_col, "island").agg(
        F.count("*").alias("len"), F.min("day").alias("streak_start")
    )
    return runs.groupBy(user_col).agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.min_by(
            "streak_start",
            F.struct((-F.col("len")).alias("neg"), F.col("streak_start")),
        ).alias("streak_start"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


def new_vs_returning(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily new-vs-returning split — the acquisition/engagement
    decomposition every growth dashboard leads with: of the users
    active each day, how many are seen for the FIRST time, how many
    came back, and the running total of distinct users ever seen.

    All exact integers.  Plan: ONE fact-sized user-keyed shuffle
    carries the (user, day) distinct and the first-day MIN window; the
    day rollup and the cumulative-users running sum operate on the
    post-aggregation day frame (metadata scale — the global-order
    window never sees the event stream).  Output: ``day``,
    ``n_active``, ``n_new``, ``n_returning``, ``cum_users``.
    """
    d = df.select(
        F.col(user_col).alias("_u"), F.to_date(ts_col).alias("day")
    ).distinct()
    first = F.min("day").over(Window.partitionBy("_u"))
    stamped = d.select("_u", "day", (F.col("day") == first).alias("_is_new"))
    per_day = stamped.groupBy("day").agg(
        F.count("*").alias("n_active"),
        F.count_if(F.col("_is_new")).alias("n_new"),
        F.count_if(~F.col("_is_new")).alias("n_returning"),
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "n_active",
        "n_new",
        "n_returning",
        F.sum("n_new").over(cum).alias("cum_users"),
    )


def transition_smoothed(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Laplace-smoothed Markov transition probabilities — the add-one
    estimator ``P(dst | src) = (n_ab + 1) / (n_a + V)`` that a
    sequence model actually consumes: unlike the raw empirical shares
    of :func:`event_transitions`, every probability is strictly
    positive and each source row sums to 1 over the FULL vocabulary
    (observed pairs emitted; the unobserved remainder is implicit at
    ``1/(n_a + V)`` each).

    ``n_ab``/``n_a`` are exact transition counts off the same pair
    frame as :func:`event_transitions`; ``V`` is the distinct type
    vocabulary.  One double division of exact BIGINTs, rounded to 9 —
    engine-stable.

    Plan: the pair frame costs ONE user-keyed shuffle of the stream
    (the lead window); the (src, dst) rollup, the per-src totals
    window, and the 1-row vocabulary broadcast all operate at
    |types|^2 / metadata scale.  Output: ``src``, ``dst``,
    ``n_transitions``, ``n_src_total``, ``vocab``, ``smoothed_prob``.
    """
    pairs = event_transitions(
        events, user_col, type_col, ts_col, order_cols
    ).select("src", "dst", "n_transitions")
    vocab = events.agg(
        F.count_distinct(F.col(type_col)).alias("vocab")
    )
    w = Window.partitionBy("src")
    return (
        pairs.withColumn(
            "n_src_total", F.sum("n_transitions").over(w)
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "src",
            "dst",
            "n_transitions",
            "n_src_total",
            "vocab",
            F.round(
                (F.col("n_transitions") + 1).cast("double")
                / (F.col("n_src_total") + F.col("vocab")).cast("double"),
                9,
            ).alias("smoothed_prob"),
        )
    )


def churn_labels(
    events: DataFrame,
    cutoff: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    purchase_type: str = "purchase",
) -> DataFrame:
    """Churn-model training frame: per-user observation-window features
    plus the did-they-come-back label — the standard supervised-churn
    data-prep step, built without a self-join.

    ``cutoff`` (an ISO timestamp string) splits each user's history: the
    OBSERVATION window (ts < cutoff) supplies features, the LABEL window
    (ts >= cutoff) supplies the outcome; ``churned`` is true when the
    label window is empty.  Users with zero observation events are
    excluded (nothing to featurize — they'd leak the label).

    Features: ``n_events``, ``n_purchases``, ``obs_value`` (exact
    decimal sum), ``active_days`` (distinct observation days),
    ``recency_hours`` (whole hours from last observation event to the
    cutoff — exact integer division of micros).

    Plan: ONE user-keyed partial-aggregated shuffle with conditional
    aggregates — label and features ride the same pass; no join between
    the two windows, no window function.  At 100 TB this is the minimal
    shape: every metric is map-side combinable.
    """
    cut = F.lit(cutoff).cast("timestamp")
    in_obs = F.col(ts_col) < cut
    g = (
        events.groupBy(user_col)
        .agg(
            F.count_if(in_obs).alias("n_events"),
            F.count_if(
                in_obs & (F.col(type_col) == purchase_type)
            ).alias("n_purchases"),
            F.sum(
                F.when(
                    in_obs,
                    F.col(value_col).cast("string").cast("decimal(18,6)"),
                )
            ).cast("decimal(18,6)").cast("double").alias("obs_value"),
            F.count_distinct(
                F.when(in_obs, F.to_date(F.col(ts_col)))
            ).alias("active_days"),
            F.max(F.when(in_obs, F.col(ts_col))).alias("_last_obs"),
            F.count_if(~in_obs).alias("_n_label"),
        )
        .filter(F.col("n_events") > 0)
    )
    return (
        g.withColumn(
            "_diff_us",
            F.unix_micros(cut) - F.unix_micros(F.col("_last_obs")),
        )
        # exact BIGINT floor division — a double quotient truncated back
        # to int can land one bucket off when the true ratio sits within
        # an ulp of an integer boundary
        .withColumn("recency_hours", F.expr("_diff_us div 3600000000"))
        .select(
            user_col,
            "n_events",
            "n_purchases",
            "obs_value",
            "active_days",
            "recency_hours",
            (F.col("_n_label") == 0).alias("churned"),
        )
    )


def time_to_convert(
    events: DataFrame,
    from_type: str,
    to_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Distribution of the first-touch -> first-conversion delay: how
    long after their first ``from_type`` do users take to reach their
    first subsequent ``to_type``?

    Earliest-entry semantics as in :func:`funnel`; the delay is bucketed
    to whole hours by EXACT integer division of the micros difference,
    so the histogram is engine-portable.  Output: (hours_bucket,
    users, cum_users, cum_pct) ordered by bucket — cumulative share of
    all converters within each delay.

    Plan: two partial-aggregated user-keyed passes stitched by one
    shuffle-hash join (the funnel join-chain shape — whale-safe, no
    per-user window sort), then a metadata-scale bucket aggregation;
    the cumulative window runs over the bucket frame only.
    """
    first_from = (
        events.filter(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
    )
    first_to = (
        events.filter(F.col(type_col) == to_type)
        .join(first_from.hint("shuffle_hash"), user_col)
        .filter(F.col(ts_col) > F.col("_t0"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"), F.min("_t0").alias("_t0m"))
    )
    per_bucket = (
        first_to.withColumn(
            "_diff_us",
            F.unix_micros(F.col("_t1")) - F.unix_micros(F.col("_t0m")),
        )
        # exact BIGINT floor division (see churn_labels note)
        .select(F.expr("_diff_us div 3600000000").alias("hours_bucket"))
        .groupBy("hours_bucket")
        .agg(F.count("*").alias("users"))
    )
    w_cum = (
        Window.orderBy("hours_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy()
    return per_bucket.select(
        "hours_bucket",
        "users",
        F.sum("users").over(w_cum).alias("cum_users"),
        F.round(
            F.lit(100.0)
            * F.sum("users").over(w_cum).cast("double")
            / F.sum("users").over(w_tot).cast("double"),
            9,
        ).alias("cum_pct"),
    )


def dau_wau_stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """DAU / trailing-WAU stickiness per day — the engagement ratio
    (what share of this week's actives showed up today) product teams
    track, computed EXACTLY.

    Trailing distinct users are NOT decomposable (you cannot sum or
    max per-day distincts into a window), so the operator uses the
    coverage-explode form: each distinct (user, day) activity row is
    exploded into the ``window_days`` trailing report days it covers,
    re-distinctef per (user, report_day), and counted — exact at a cost
    of window_days x the daily-distinct frame, all equi-keyed, no
    sliding-window state.  Report days are restricted to OBSERVED
    activity days (no synthetic calendar spine), and the leading
    ``window_days - 1`` days are emitted with their partial windows —
    callers wanting only full windows filter on ``day``.

    Output per day: (day, dau, wau, stickiness_pct) where
    ``stickiness_pct = 100 * dau / wau`` — one division of exact
    BIGINTs.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    ud = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            F.to_date(F.col(ts_col)).alias("_d"),
        )
        .distinct()
    )
    dau = ud.groupBy(F.col("_d").alias("day")).agg(
        F.count("*").alias("dau")
    )
    covered = (
        ud.select(
            "_u",
            F.explode(
                F.sequence(
                    F.col("_d"),
                    F.date_add(F.col("_d"), window_days - 1),
                )
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return (
        dau.join(covered, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                (F.col("dau") * F.lit(100)).cast("double")
                / F.col("wau").cast("double"),
                9,
            ).alias("stickiness_pct"),
        )
    )


def session_funnel(
    events: DataFrame,
    stages: Sequence[str],
    gap_minutes: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Within-SESSION ordered funnel: conversion counted per session
    (gap-based sessionization, same islands rule as the sessionize
    operator), stages strictly ordered INSIDE the session — the form
    "did this visit convert?" questions actually mean, which the
    user-lifetime funnel overstates (a view today + purchase next month
    counts there, not here).

    Returns (stage, stage_name, sessions, conversion_pct) — sessions
    reaching each stage, pct vs stage-1 sessions (round 2).

    Plan: ONE user-keyed exchange serves everything — the lag/island
    windows AND the per-(user, session) stage windows (hash(user)
    already co-locates (user, session), so Spark adds sorts, not
    shuffles), then a metadata-scale 1-row count aggregate.
    """
    if not stages:
        raise ValueError("need at least one funnel stage")
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w_ord = Window.partitionBy(user_col).orderBy("_ts", "_id")
    prev = F.lag("_ts").over(w_ord)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("_ts")) - F.unix_micros(prev)) > gap_us),
        1,
    ).otherwise(0)
    cur = events.select(
        user_col,
        F.col(type_col).alias("_type"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    ).withColumn(
        "_sid",
        F.sum(is_new.cast("bigint")).over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy(user_col, "_sid")
    entry_cols = [f"_entry_{i}" for i in range(len(stages))]
    prev_entry = None
    for i, stage_type in enumerate(stages):
        qualifies = F.col("_type") == stage_type
        if prev_entry is not None:
            qualifies = qualifies & (F.col("_ts") > F.col(prev_entry))
        cur = cur.withColumn(
            entry_cols[i],
            F.min(F.when(qualifies, F.col("_ts"))).over(w_sess),
        )
        prev_entry = entry_cols[i]
    one_per_session = cur.groupBy(user_col, "_sid").agg(
        *[F.max(F.col(c).isNotNull()).alias(c) for c in entry_cols]
    )
    counts = one_per_session.agg(
        *[
            F.coalesce(F.sum(F.col(c).cast("bigint")), F.lit(0)).alias(
                f"_sessions_{i}"
            )
            for i, c in enumerate(entry_cols)
        ]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(stage_type).alias("stage_name"),
                F.col(f"_sessions_{i}").alias("sessions"),
            )
            for i, stage_type in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(stage_rows).alias("s"), F.col("_sessions_0"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_name").alias("stage_name"),
            F.col("s.sessions").alias("sessions"),
            F.round(
                F.lit(100.0)
                * F.col("s.sessions")
                / F.nullif(F.col("_sessions_0"), F.lit(0)),
                2,
            ).alias("conversion_pct"),
        )
    )


def rate_limit_violations(
    events: DataFrame,
    window_hours: int = 24,
    threshold: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Events whose trailing-window same-key count reaches ``threshold``
    — the abuse/bot/rate-limit detector ("more than N requests in the
    last H hours"), exact rather than bucket-approximated (a fixed
    hourly bucket misses bursts straddling the boundary).

    The trailing count is a RANGE-frame window over the key's
    micros-ordered stream: ``RANGE (H*3600e6 - 1) PRECEDING`` — the
    half-open window ``(t - H, t]`` in exact integer micros, so
    boundary events resolve identically in any engine; simultaneous
    events (ties) all carry the same count, per RANGE semantics.

    Plan: ONE user-keyed window shuffle, map-side violation filter —
    output is violations only, typically a vanishing share of input.
    Whale caveat: like every per-key window, a bot key sorts in one
    task — which is fine here, because bots are exactly what the
    operator exists to surface.

    Output: (event_id, user_id, ts, trailing_count).
    """
    if window_hours < 1:
        raise ValueError(f"window_hours must be >= 1, got {window_hours}")
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    span = int(window_hours) * 3_600_000_000 - 1
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-span, Window.currentRow)
    )
    return (
        events.select(
            F.col(id_col).alias("event_id"),
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.count("*").over(w).alias("trailing_count"),
        )
        .filter(F.col("trailing_count") >= threshold)
    )


def entropy_rate(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order Markov entropy rate of the event stream — the
    sequence-predictability number over the empirical transition matrix
    (:func:`event_transitions`): per source state the conditional
    entropy ``H(dst | src) = -sum_dst p(dst|src) log2 p(dst|src)``, and
    the corpus rate ``H = sum_src p(src) H(dst | src)`` with ``p(src)``
    the observed source share of all transitions.  ~0 bits means the
    next event type is determined by the current one; log2(k) bits
    means it is uniform noise.

    Transcendental log2 terms ride the quantized-term contract
    (mleval.ndcg_at_k): per-(src, dst) entropy terms AND per-src rate
    contributions are rounded to 12 digits and summed as
    DECIMAL(28,12); closings round to 9.

    Plan: the ONE user-keyed window shuffle of event_transitions, then
    everything runs on the |types|^2 matrix frame — per-src totals
    broadcast-join back onto it, the grand total rides a 1-row
    broadcast.  Output per source state: (src, n_src, n_dst_distinct,
    h_bits, src_share, rate_contrib, entropy_rate_bits) with the corpus
    rate replicated per row (the PSI output shape).
    """
    tm = event_transitions(
        events, user_col=user_col, type_col=type_col, ts_col=ts_col,
        order_cols=order_cols,
    ).select("src", "dst", F.col("n_transitions").alias("_n"))
    src_tot = tm.groupBy("src").agg(
        F.sum("_n").cast("bigint").alias("_ns"),
        F.count("*").cast("bigint").alias("n_dst_distinct"),
    )
    j = tm.join(F.broadcast(src_tot), "src")
    p = F.col("_n").cast("double") / F.col("_ns").cast("double")
    term = F.round(-p * F.log2(p), 12).cast("decimal(28,12)")
    per_src = (
        j.select("src", "_ns", "n_dst_distinct", term.alias("_t"))
        .groupBy("src")
        .agg(
            F.max("_ns").alias("n_src"),
            F.max("n_dst_distinct").alias("n_dst_distinct"),
            F.sum("_t").cast("double").alias("_h"),
        )
    )
    grand = per_src.agg(F.sum("n_src").cast("bigint").alias("_tot"))
    w = per_src.crossJoin(F.broadcast(grand))
    share = F.col("n_src").cast("double") / F.col("_tot").cast("double")
    contrib = F.round(share * F.col("_h"), 12).cast("decimal(28,12)")
    rows = w.select(
        "src",
        "n_src",
        "n_dst_distinct",
        F.col("_h").alias("_hd"),
        F.round(share, 9).alias("src_share"),
        contrib.alias("_c"),
    )
    total = rows.agg(F.sum("_c").cast("double").alias("_rate"))
    return rows.crossJoin(F.broadcast(total)).select(
        "src",
        "n_src",
        "n_dst_distinct",
        F.round(F.col("_hd"), 9).alias("h_bits"),
        "src_share",
        F.round(F.col("_c").cast("double"), 9).alias("rate_contrib"),
        F.round(F.col("_rate"), 9).alias("entropy_rate_bits"),
    )
