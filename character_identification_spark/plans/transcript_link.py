"""Scene-scoped deterministic mention linking for transcript corpora.

This is the engine's answer to the reference's character-identification
task proper (reference: latest/system.py — mention clustering + linking
within scene-scoped documents): given gold mention SPANS (the standard
coref-eval contract, and exactly what the reference system consumes), link
each mention to a character using only deterministic, data-derivable
signals, all expressed as DataFrame ops:

  p1/ppl   first-person pronouns → the utterance's speaker
           (reference analog: the speaker feature, features.py:160)
  p2       second-person pronouns → closest previous distinct speaker,
           falling back to the next distinct speaker — the reference's
           closest-previous-speaker prior (re-derived from
           baseline/tools/ioutils.py:139-151 semantics)
  p3m/p3f  third-person pronouns → nearest preceding cast-name mention
           with a compatible gender hint that is NOT the current speaker
           (functions/lexicon.py — the C8 gender-distribution analog;
           strategy selected by measurement, see P3_MODES and the sweep
           table in BASELINE.md); fallback: nearest preceding name of
           unknown/compatible gender that isn't the current speaker;
           final fallback: a per-scene gender pool (all unresolved "he"
           of a scene co-refer — the scene's discourse topic)
  name     surface matched against the cast (distinct utterance speakers)
           by exact norm, unique token-containment ("ross" ⊆ "ross
           geller"), then unique first-token prefix ("rach" → "rachel
           green") — the alias families of operators/scoring.py applied
           to a broadcast-sized dimension
  other    singleton (gold #other#/#general# mentions never co-refer)

Clusters are scene-scoped, mirroring the reference's blocking unit
(latest/system.py:46). Scale notes: every per-scene window carries at most
one scene of structs (scenes are bounded, the transcript analog of the
bounded url-context in operators/context.py), the cast join is a broadcast
of a tiny dimension, and there are NO Python UDFs — the whole plan is
JVM-side expressions.

Round 3 adds the LEARNED antecedent scorer (plans/coref_scorer.py +
models/coref_params.py — the reference's M2 pairwise ranking model as a
deterministic logistic head): default p2_mode="learned" /
p3_mode="learned_pool", dev-selected (sweep argmax, BASELINE.md), with
pseudo-label clustering for cast-unmatched names and a NOMINAL mention
class ("honey"/"my dad"/"the guy" resolve like pronouns through their
own trained head, never through cast-surface matching). Measured on the
reference corpus (tests/test_transcript.py): pairwise F1 0.7604 dev /
0.7203 tst at scene blocking keys (rules-only round 2: 0.7430/0.7028) —
see BASELINE.md for the honest gap to the 0.99 aspiration.

Round 4 adds the M5 LEARNED plural membership gate (coref_scorer.
learned_members — reference linking_joint.py:71-91): plural pronouns'
auto_refs = {speaker, prev speaker} ∪ every real candidate whose
per-label sigmoid clears τ_ppl (0.925, dev argmax; multi-membership
pairwise F1 0.8083 → 0.8202 dev, split-half-CV-positive), plus the
lexical-context plumbing (ctx_emb/ctx_toks per mention, ctx per naming
event, epi_prior_refs) whose features the PPL head uses — the singular
heads keep them masked (the BASELINE.md round-4 ablation table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from character_identification_spark.functions.lexicon import (
    label_gender,
    nominal_class,
    nominal_gender,
    nominal_head,
    pronoun_class,
)
from character_identification_spark.functions.strings import norm_text


def speaker_context(utterances: DataFrame) -> DataFrame:
    """Per utterance: normalized speaker + closest previous / next DISTINCT
    speaker within the scene (the W6 closest-previous-speaker operator,
    generalized to a same-scene bounded window)."""
    u = utterances.select(
        "scene_id",
        "utterance_id",
        "utt_idx",
        norm_text(F.try_element_at("speakers", F.lit(1))).alias("spk"),
    )
    w = Window.partitionBy("scene_id").orderBy("utt_idx")
    hist = F.collect_list(F.struct("utt_idx", "spk")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    fut = F.collect_list(F.struct("utt_idx", "spk")).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    cur = F.col("spk")
    prev_d = F.try_element_at(
        F.filter(F.reverse(hist), lambda x: x["spk"].isNotNull() & (x["spk"] != cur)),
        F.lit(1),
    )["spk"]
    next_d = F.try_element_at(
        F.filter(fut, lambda x: x["spk"].isNotNull() & (x["spk"] != cur)), F.lit(1)
    )["spk"]
    prev_all = F.array_distinct(
        F.filter(
            F.transform(hist, lambda x: x["spk"]), lambda s: s.isNotNull()
        )
    )
    return u.select(
        "scene_id",
        "utterance_id",
        "utt_idx",
        "spk",
        prev_d.alias("prev_spk"),
        next_d.alias("next_spk"),
        prev_all.alias("prev_spks"),
    )


def cast_table(utterances: DataFrame) -> DataFrame:
    """Distinct normalized speakers = the corpus cast dimension."""
    return (
        utterances.select(
            norm_text(F.try_element_at("speakers", F.lit(1))).alias("cast_norm")
        )
        .filter(F.col("cast_norm").isNotNull() & (F.col("cast_norm") != ""))
        .distinct()
    )


def match_names_to_cast(name_mentions: DataFrame, cast: DataFrame) -> DataFrame:
    """(mention_uid, norm) × cast → (mention_uid, cast_ref or null).

    Four alias families in strict precedence, each applied only when it
    is UNIQUE (ambiguity stays unresolved, never guessed):
      1. exact norm equality
      2. token containment: mention tokens ⊆ cast-name tokens
      3. single-token prefix (≥3 chars) of the cast first name
      4. single-token fuzzy: levenshtein ≤ 1 to the cast first name
         (≥5 chars — the nickname family: "phoebs" → "phoebe buffay"),
         the transcript analog of the web scorer's edit-similarity blend;
         the ≥5 floor is measured (4-char fuzzes cost test-split F1)
    The cast is broadcast (tiny dim); candidates come from a broadcast
    nested-loop join bounded by |mentions| × |cast|."""
    m = name_mentions.select("mention_uid", "norm").distinct()
    joined = m.crossJoin(F.broadcast(cast))
    mt = F.split("norm", " ")
    ct = F.split("cast_norm", " ")
    exact = F.col("norm") == F.col("cast_norm")
    contained = F.size(F.array_except(mt, ct)) == 0
    prefix = (
        (F.size(mt) == 1)
        & (F.length("norm") >= 3)
        & F.element_at(ct, 1).startswith(F.col("norm"))
    )
    fuzzy = (
        (F.size(mt) == 1)
        & (F.length("norm") >= 5)
        & (F.levenshtein(F.col("norm"), F.element_at(ct, 1)) <= 1)
    )
    cand = joined.select(
        "mention_uid",
        "cast_norm",
        exact.alias("is_exact"),
        contained.alias("is_cont"),
        prefix.alias("is_pre"),
        fuzzy.alias("is_fuz"),
    ).filter(F.col("is_exact") | F.col("is_cont") | F.col("is_pre") | F.col("is_fuz"))
    agg = cand.groupBy("mention_uid").agg(
        F.max(F.when(F.col("is_exact"), F.col("cast_norm"))).alias("exact_ref"),
        F.count_distinct(F.when(F.col("is_cont"), F.col("cast_norm"))).alias("cont_n"),
        F.min(F.when(F.col("is_cont"), F.col("cast_norm"))).alias("cont_ref"),
        F.count_distinct(F.when(F.col("is_pre"), F.col("cast_norm"))).alias("pre_n"),
        F.min(F.when(F.col("is_pre"), F.col("cast_norm"))).alias("pre_ref"),
        F.count_distinct(F.when(F.col("is_fuz"), F.col("cast_norm"))).alias("fuz_n"),
        F.min(F.when(F.col("is_fuz"), F.col("cast_norm"))).alias("fuz_ref"),
    )
    return agg.select(
        "mention_uid",
        F.coalesce(
            F.col("exact_ref"),
            F.when(F.col("cont_n") == 1, F.col("cont_ref")),
            F.when(F.col("pre_n") == 1, F.col("pre_ref")),
            F.when(F.col("fuz_n") == 1, F.col("fuz_ref")),
        ).alias("cast_ref"),
    )


#: selectable third-person strategies (tools/measure_transcript_rules.py
#: measures each on the reference dev set; the default is the measured
#: best — see BASELINE.md for the sweep table)
P3_MODES = (
    "near_gender_pool",        # nearest preceding gender-match, any-gender fallback
    "near_gender_xspk_pool",   # … with the current speaker excluded from gendered cands
    "near_gender_xboth_pool",  # … current AND previous speaker excluded
    "freq_gender_pool",        # most FREQUENT preceding gender-match (scene topic prior)
    "near_gender_cata_pool",   # … plus cataphora fallback (nearest following name)
    "learned_pool",            # logistic antecedent scorer (plans/coref_scorer.py),
                               # τ-thresholded, any-gender-rule then pool fallback
)

#: second-person strategies (same sweep discipline)
P2_MODES = ("prev", "vocative", "learned")

#: document order of mentions within a scene — shared by the rule windows,
#: the learned-scorer event windows, and the trainer
_MENTION_ORDER = ("utt_idx", "sent_idx", "begin", "mention_uid")


def with_antecedent_candidates(m: DataFrame, event_scope: str = "scene") -> DataFrame:
    """Enriched mention table → + (midx, prior_events, cands).

    prior_events = recency-reversed preceding NAMING EVENTS of the scene:
    cast-matched name mentions (src 0), first-person pronouns resolved
    to their speaker (src 1 — 97%-accurate self-references, so "I …
    he" chains get an antecedent even when nobody says the name), and
    cast-UNMATCHED name mentions under their normalized surface as a
    PSEUDO-label (src 2 — "mr heckles" never speaks and matches no cast
    row, but pronouns can still cluster with his name mentions; the
    measured candidate-coverage ceiling without src 2 is 39% of
    third-person golds). cands = the scored candidate array of
    plans/coref_scorer.py. Shared by the learned linker modes and
    tools/train_coref_scorer.py so the trainer sees byte-identical
    features.

    ``event_scope="episode"`` widens the EVENT windows to the whole
    episode (scene ids sort chronologically within an episode:
    sNN_eNN_cNN) — clustering stays scene-scoped, but antecedent
    evidence carries across scene boundaries, attacking the measured
    47% within-scene candidate-coverage ceiling for third-person golds.
    Utterance distances then use an episode-wide dense utterance rank
    (utt_idx resets per scene).
    """
    from character_identification_spark.plans.coref_scorer import candidate_array

    if event_scope not in ("scene", "episode"):
        raise ValueError(f"event_scope {event_scope!r}")
    # episode key always exists: the cross-scene PRIOR features (epi_freq /
    # epi_named) read earlier-scene namings even in scene scope — scene ids
    # sort chronologically within an episode (sNN_eNN_cNN)
    m = m.withColumn("_epi", F.regexp_replace(F.col("scene_id"), r"_c\d+$", ""))
    epi_order = Window.partitionBy("_epi").orderBy("scene_id", *_MENTION_ORDER)
    if event_scope == "episode":
        order = epi_order
        gutt_w = Window.partitionBy("_epi").orderBy("scene_id", "utt_idx")
        m = m.withColumn("_gutt", F.dense_rank().over(gutt_w))
    else:
        order = Window.partitionBy("scene_id").orderBy(*_MENTION_ORDER)
        m = m.withColumn("_gutt", F.col("utt_idx"))
    m = m.withColumn("midx", F.row_number().over(order))
    if "mg" not in m.columns:
        m = m.withColumn("mg", _mention_gender())
    # each naming event carries its own ±4-token context embedding (ctx)
    # so the scorer can compare the pronoun's lexical context to the
    # context the candidate was last named in — the reference CNN's
    # window-embedding input as two deterministic vectors + a cosine
    def _ev(ref: Column, src: int) -> Column:
        return F.struct(
            ref.alias("ref"),
            F.col("_gutt").alias("utt_idx"),
            F.col("midx").alias("midx"),
            F.col("spk").alias("spk"),
            F.lit(src).alias("src"),
            F.col("ctx_emb").alias("ctx"),
        )

    event = F.when(
        (F.col("kind") == "name") & F.col("cast_ref").isNotNull(),
        _ev(F.col("cast_ref"), 0),
    ).when(
        (F.col("kind") == "p1") & F.col("spk").isNotNull(),
        _ev(F.col("spk"), 1),
    ).when(
        (F.col("kind") == "name")
        & F.col("cast_ref").isNull()
        & (F.col("norm") != ""),
        _ev(F.col("norm"), 2),
    )
    m = m.withColumn(
        "prior_events",
        F.reverse(
            F.collect_list(event).over(
                order.rowsBetween(Window.unboundedPreceding, -1)
            )
        ),
    ).withColumn(
        # cataphora signal: FOLLOWING events, nearest first (not reversed).
        # The rule-mode cataphora fallback raised p3 accuracy but lost F1
        # to over-merging (BASELINE.md sweep); as scored FEATURES the
        # model learns when a future naming is trustworthy.
        "next_events",
        F.collect_list(event).over(
            order.rowsBetween(1, Window.unboundedFollowing)
        ),
    )
    # cross-scene PRIOR (VERDICT r3 #6): labels of REAL namings (src<2)
    # from EARLIER SCENES of the episode — candidate labels stay
    # scene-derived (episode-wide candidate widening was measured and
    # rejected, BASELINE.md), but the scorer can now see that a candidate
    # was active earlier in the episode. Ref strings only (no structs /
    # vectors), so the episode-wide window stays light.
    epi_event = F.when(
        event.isNotNull() & (event["src"] < 2),
        F.struct(F.col("scene_id").alias("sc"), event["ref"].alias("ref")),
    )
    m = m.withColumn(
        "epi_prior_refs",
        F.transform(
            F.filter(
                F.collect_list(epi_event).over(
                    epi_order.rowsBetween(Window.unboundedPreceding, -1)
                ),
                lambda x: x["sc"] != F.col("scene_id"),
            ),
            lambda x: x["ref"],
        ),
    )
    return m.withColumn("cands", candidate_array(utt_idx_col="_gutt"))


def enriched_mention_table(utterances: DataFrame, mentions: DataFrame) -> DataFrame:
    """mentions + speaker context + pronoun kind + cast match + lexical
    context embedding — the common front half of the rule linker, the
    learned scorer, and tools/train_coref_scorer.py (the trainer must see
    byte-identical inputs to the inference path).

    ctx_emb is the 16-dim hash-shingle embedding (functions/vectors.py)
    of the mention's ±4-token window, span excluded — the engine's
    deterministic analog of the reference CNN's word-embedding context
    input (latest/model/coref.py:40-70 consuming the token windows of
    component/features.py:113-127). NULL when the window is empty, so
    downstream cosines go NULL→0 instead of dividing a zero norm."""
    from character_identification_spark.functions.vectors import hash_embedding
    from character_identification_spark.operators.textwindow import (
        token_window_features,
    )

    ctx = speaker_context(utterances)
    cast = cast_table(utterances)
    have_ctx = "end" in mentions.columns and "tokens" in utterances.columns
    m = (
        mentions.select(
            "mention_uid",
            "utterance_id",
            "sent_idx",
            "begin",
            *(["end"] if have_ctx else []),
            F.col("block_key").alias("scene_id"),
            norm_text(F.col("surface")).alias("norm"),
        )
        .join(
            ctx.select(
                "utterance_id", "utt_idx", "spk", "prev_spk", "next_spk", "prev_spks"
            ),
            "utterance_id",
        )
        .withColumn(
            # pronouns → p1/p2/p3m/p3f/ppl; relational common nouns
            # ("honey", "my dad", "the guy") → 'nom' (cast-surface
            # matching can never resolve these — they resolve like
            # pronouns, via context antecedents); everything else → name
            "kind",
            F.coalesce(pronoun_class("norm"), nominal_class("norm"), F.lit("name")),
        )
    )
    # ±4-token window (W1, operators/textwindow.py) → one deterministic
    # context embedding per mention; the (utterance_id, sent_idx) sentence
    # join is the document-structure equi-join, skew bounded by
    # mentions-per-sentence. Fixtures without token arrays / span ends
    # (toy unit scenes) degrade to NULL ctx_emb — every downstream
    # consumer is null-safe.
    if have_ctx:
        win = token_window_features(
            m.select("mention_uid", "utterance_id", "sent_idx", "begin", "end"),
            utterances,
            k=4,
        ).select(
            "mention_uid",
            F.concat("prev_tokens", "next_tokens").alias("_wtoks"),
        )
        m = (
            m.join(win, "mention_uid", "left")
            .withColumn(
                "ctx_emb",
                F.when(
                    F.size("_wtoks") > 0,
                    hash_embedding(norm_text(F.array_join("_wtoks", " "))),
                ),
            )
            .withColumn(
                # normalized window TOKENS — the win_has_name scorer
                # feature tests candidate-name membership directly
                "ctx_toks",
                F.filter(
                    F.transform(F.col("_wtoks"), lambda t: norm_text(t)),
                    lambda t: t != "",
                ),
            )
            .drop("_wtoks")
        )
    else:
        m = m.withColumn(
            "ctx_emb", F.lit(None).cast("array<double>")
        ).withColumn("ctx_toks", F.lit(None).cast("array<string>"))
    named = match_names_to_cast(m.filter(F.col("kind") == "name"), cast)
    return m.join(named, "mention_uid", "left")


def _mention_gender():
    """m/f gender hint: third-person pronoun class, else the nominal
    head's lexicon gender ('the guy' → m)."""
    return (
        F.when(F.col("kind") == "p3m", "m")
        .when(F.col("kind") == "p3f", "f")
        .when(F.col("kind") == "nom", nominal_gender("norm"))
    )


def link_transcript_mentions(
    utterances: DataFrame,
    mentions: DataFrame,
    label_vocab: tuple[str, ...] | None = None,
    p3_mode: str = "learned_pool",
    p2_vocative: bool = False,
    p2_mode: str = "learned",
    p2_tau: float | None = None,
    p3_tau: float | None = None,
    nom_tau: float | None = None,
    ppl_tau: float | None = None,
    p2m_tau: float | None = None,
    event_scope: str = "scene",
    pool_anchor: bool | float = False,
) -> DataFrame:
    """mentions(mention_uid, utterance_id, utt_idx, sent_idx, begin,
    surface, block_key=scene_id) + utterances → assignments
    (mention_uid, cluster_id, auto_ref, auto_refs, kind).

    auto_ref is the predicted character label (null when the mention
    resolves to no character — it then gets a deterministic singleton /
    pool cluster). cluster_id is scene-scoped. ``label_vocab`` applies F4
    linking-label coarsening (functions/lexicon.coarsen_to_vocab): a
    predicted label outside the vocabulary collapses to '#other#'."""
    m = enriched_mention_table(utterances, mentions)

    if p2_vocative:
        p2_mode = "vocative"
    if p2_mode not in P2_MODES:
        raise ValueError(f"p2_mode {p2_mode!r} not in {P2_MODES}")
    learned_needed = p3_mode == "learned_pool" or p2_mode == "learned"
    if learned_needed:
        from character_identification_spark.models import coref_params as _cp
        from character_identification_spark.models.coref_params import (
            NOM_TAU,
            NOM_WEIGHTS,
            P2_TAU,
            P2_WEIGHTS,
            P3_TAU,
            P3_WEIGHTS,
        )
        from character_identification_spark.plans.coref_scorer import (
            learned_best,
            learned_members,
        )

        PPL_WEIGHTS = getattr(_cp, "PPL_WEIGHTS", None)
        PPL_TAU = ppl_tau if ppl_tau is not None else getattr(_cp, "PPL_TAU", None)
        P2M_TAU = p2m_tau if p2m_tau is not None else getattr(_cp, "P2M_TAU", None)

        # τ defaults come from the committed params; overrides exist for
        # the dev-F1 sweep (tools/measure_transcript_rules.py) — the
        # committed value must be the sweep argmax (CLAUDE.md discipline)
        P2_TAU = P2_TAU if p2_tau is None else p2_tau
        P3_TAU = P3_TAU if p3_tau is None else p3_tau
        NOM_TAU = NOM_TAU if nom_tau is None else nom_tau
        m = with_antecedent_candidates(m, event_scope=event_scope)

    if p2_mode == "vocative":
        # vocative prior: a UNIQUE cast-name mention inside the same
        # utterance that isn't the speaker names the addressee
        # ("Joey, you …" → you = joey). MEASURED AND REJECTED as the
        # default: dev p2 accuracy drops 655→635/885 (F1 0.7430→0.7302) —
        # a name inside your own utterance is the TOPIC more often than
        # the addressee ("did you see Ross?"). Kept selectable for the
        # sweep harness.
        voc = (
            m.filter((F.col("kind") == "name") & F.col("cast_ref").isNotNull())
            .groupBy("utterance_id")
            .agg(
                F.count_distinct("cast_ref").alias("_vn"),
                F.min("cast_ref").alias("_vref"),
            )
            .filter(F.col("_vn") == 1)
            .select("utterance_id", F.col("_vref").alias("vref"))
        )
        m = m.join(voc, "utterance_id", "left")
        p2_ref = F.coalesce(
            F.when(F.col("vref") != F.col("spk"), F.col("vref")),
            F.col("prev_spk"),
            F.col("next_spk"),
        )
    elif p2_mode == "learned":
        # logistic antecedent scorer for "you": τ-passing argmax, falling
        # back to the 76%-accurate previous-distinct-speaker rule. A
        # pseudo (unmatched-name) pick clusters without predicting a
        # character label — recorded in _pseudo2, consumed by the key.
        p2_best = learned_best("cands", P2_WEIGHTS, P2_TAU)
        m = m.withColumn(
            "_pseudo2",
            F.when(
                (F.col("kind") == "p2") & (p2_best["pseudo"] == 1.0),
                p2_best["ref"],
            ),
        )
        p2_ref = F.when(
            p2_best.isNull(), F.coalesce(F.col("prev_spk"), F.col("next_spk"))
        ).otherwise(F.when(p2_best["pseudo"] == 0.0, p2_best["ref"]))
    else:
        p2_ref = F.coalesce("prev_spk", "next_spk")
    if "_pseudo2" not in m.columns:
        m = m.withColumn("_pseudo2", F.lit(None).cast("string"))

    # first pass: speaker-derivable references
    ref0 = (
        F.when(F.col("kind").isin("p1", "ppl"), F.col("spk"))
        .when(F.col("kind") == "p2", p2_ref)
        .when(F.col("kind") == "name", F.col("cast_ref"))
    )
    m = m.withColumn("ref0", ref0).withColumn("mg", _mention_gender())

    # second pass: third-person antecedents from preceding NAME mentions
    # (document order within the scene; one scene of structs per window)
    if p3_mode not in P3_MODES:
        raise ValueError(f"p3_mode {p3_mode!r} not in {P3_MODES}")
    order = Window.partitionBy("scene_id").orderBy(
        "utt_idx", "sent_idx", "begin", "mention_uid"
    )
    name_struct = F.when(
        (F.col("kind") == "name") & F.col("ref0").isNotNull(),
        F.struct(F.col("ref0").alias("ref"), label_gender("ref0").alias("g")),
    )
    prior_names = F.collect_list(name_struct).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    m = m.withColumn("prior_names", F.reverse(prior_names))
    if p3_mode == "near_gender_cata_pool":
        m = m.withColumn(
            "next_names",
            F.collect_list(name_struct).over(
                order.rowsBetween(1, Window.unboundedFollowing)
            ),
        )
    mg, spk = F.col("mg"), F.col("spk")
    gendered = F.filter("prior_names", lambda x: x["g"] == mg)
    cand_gender = F.try_element_at(gendered, F.lit(1))["ref"]
    cand_any = F.try_element_at(
        F.filter(
            "prior_names",
            lambda x: (x["g"].isNull() | (x["g"] == mg)) & (x["ref"] != spk),
        ),
        F.lit(1),
    )["ref"]
    if p3_mode in ("near_gender_xspk_pool", "near_gender_xboth_pool"):
        # "he"/"she" rarely refers to a conversation participant: skip
        # gendered antecedents equal to the current (and for xboth the
        # previous) speaker — null-safe, a null speaker excludes nothing
        prev = F.col("prev_spk")
        excl = (
            (lambda x: F.coalesce(x["ref"] != spk, F.lit(True))
             & F.coalesce(x["ref"] != prev, F.lit(True)))
            if p3_mode == "near_gender_xboth_pool"
            else (lambda x: F.coalesce(x["ref"] != spk, F.lit(True)))
        )
        primary = F.try_element_at(
            F.filter("prior_names", lambda x: (x["g"] == mg) & excl(x)),
            F.lit(1),
        )["ref"]
        p3_ref = F.coalesce(primary, cand_any)
    elif p3_mode == "freq_gender_pool":
        # scene-topic prior: the most FREQUENTLY named gender-match so far;
        # ties break to the most recent (smallest first-occurrence index in
        # the recency-ordered list)
        refs = F.transform(gendered, lambda x: x["ref"])
        best = F.array_max(
            F.transform(
                F.array_distinct(refs),
                lambda r: F.struct(
                    F.size(F.filter(refs, lambda y: y == r)).alias("cnt"),
                    (-F.array_position(refs, r)).alias("recency"),
                    r.alias("ref"),
                ),
            )
        )["ref"]
        p3_ref = F.coalesce(best, cand_any)
    elif p3_mode == "near_gender_cata_pool":
        cand_fut = F.try_element_at(
            F.filter("next_names", lambda x: x["g"] == mg), F.lit(1)
        )["ref"]
        p3_ref = F.coalesce(cand_gender, cand_any, cand_fut)
    elif p3_mode == "learned_pool":
        # logistic antecedent scorer (plans/coref_scorer.py): τ-passing
        # argmax over the candidate array; below τ, the deterministic
        # any-gender rule then the per-scene gender pool take over. A
        # pseudo (unmatched-name) pick clusters without predicting a
        # character label (_pseudo3 → the "n:" cluster key).
        p3_best = learned_best("cands", P3_WEIGHTS, P3_TAU)
        m = m.withColumn(
            "_pseudo3",
            F.when(
                F.col("kind").isin("p3m", "p3f") & (p3_best["pseudo"] == 1.0),
                p3_best["ref"],
            ),
        )
        p3_ref = F.when(p3_best.isNull(), cand_any).otherwise(
            F.when(p3_best["pseudo"] == 0.0, p3_best["ref"])
        )
    else:  # near_gender_pool
        p3_ref = F.coalesce(cand_gender, cand_any)
    if "_pseudo3" not in m.columns:
        m = m.withColumn("_pseudo3", F.lit(None).cast("string"))
    # nominal mentions ("honey", "the guy") resolve through the SAME
    # learned antecedent scorer (their own trained head) in learned mode;
    # without it they stay unresolved and fall to the gender-pool /
    # same-head cluster keys below
    if learned_needed:
        nom_best = learned_best("cands", NOM_WEIGHTS, NOM_TAU)
        m = m.withColumn(
            "_pseudoN",
            F.when(
                (F.col("kind") == "nom") & (nom_best["pseudo"] == 1.0),
                nom_best["ref"],
            ),
        )
        nom_ref = F.when(nom_best["pseudo"] == 0.0, nom_best["ref"])
    else:
        m = m.withColumn("_pseudoN", F.lit(None).cast("string"))
        nom_ref = F.lit(None).cast("string")
    m = m.withColumn(
        "auto_ref",
        F.when(F.col("kind").isin("p3m", "p3f"), p3_ref)
        .when(F.col("kind") == "nom", nom_ref)
        .otherwise(F.col("ref0")),
    )
    # F4 coarsening applies to the LINKING label only (the reference
    # coarsens the refs fed to its linking classifier, system.py:189-193);
    # the clustering key keeps the raw resolved referent — two mentions of
    # the same out-of-vocab character still co-refer.
    m = m.withColumn("ref_raw", F.col("auto_ref"))
    if pool_anchor:
        # STRUCTURAL cross-scene route (round-5 sweep, VERDICT r4 #7):
        # a scene's unresolved third-person pool re-labels to the most
        # salient gender-matching character of EARLIER scenes of the
        # episode — pure joins over speaker/cast-name events (speakers
        # are global labels across scenes), no model. Attacks the 53% of
        # p3 singular golds never named/speaking in-scene, which
        # feature-level episode priors (epi_freq/epi_named, round 4)
        # could not reach. Selectable via the sweep ':pa' suffix; the
        # default stays the sweep argmax (CLAUDE.md discipline).
        _pseudo_any0 = F.coalesce(
            F.col("_pseudo3"), F.col("_pseudo2"), F.col("_pseudoN")
        )
        epi = F.regexp_replace(F.col("scene_id"), r"_c\d+$", "")
        ev = (
            m.select(
                epi.alias("_aepi"),
                "scene_id",
                F.when(
                    (F.col("kind") == "name") & F.col("cast_ref").isNotNull(),
                    F.col("cast_ref"),
                )
                .otherwise(F.when(F.col("kind") == "p1", F.col("spk")))
                .alias("ref"),
            )
            .filter(F.col("ref").isNotNull())
            .groupBy("_aepi", "scene_id", "ref")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # full (scene × episode-ref) grid so scenes with no events still
        # get an anchor from earlier scenes — both sides episode-bounded
        scenes = m.select(epi.alias("_aepi"), "scene_id").distinct()
        refs = ev.select("_aepi", "ref").distinct()
        cells = (
            scenes.join(refs, "_aepi")
            .join(ev, ["_aepi", "scene_id", "ref"], "left")
            .select(
                "_aepi", "scene_id", "ref",
                F.coalesce("cnt", F.lit(0)).alias("cnt"),
            )
        )
        # order scenes by the NUMERIC index of the _c suffix, not the raw
        # scene_id string: lexicographic order silently misorders '_c2'
        # vs '_c10' (unpadded ids, or episodes with ≥100 scenes)
        # nullif guards ANSI: a suffix-less scene_id extracts '' and a
        # bare ''→int cast would throw; NULL sorts first instead
        sidx = F.nullif(
            F.regexp_extract("scene_id", r"_c(\d+)$", 1), F.lit("")
        ).cast("int")
        cells = cells.withColumn("_sidx", sidx)
        wprior = Window.partitionBy("_aepi", "ref").orderBy("_sidx").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cand = (
            cells.withColumn(
                "prior_cnt", F.coalesce(F.sum("cnt").over(wprior), F.lit(0))
            )
            .withColumn(
                "last_seen",
                F.max(F.when(F.col("cnt") > 0, F.col("_sidx"))).over(wprior),
            )
            .filter(F.col("prior_cnt") > 0)
            .withColumn("g", label_gender("ref"))
            .filter(F.col("g").isNotNull())
        )
        wpick = Window.partitionBy("scene_id", "g").orderBy(
            F.desc("prior_cnt"), F.desc("last_seen"), F.asc("ref")
        )
        # dominance gate: pool_anchor may be a float τ — only anchor
        # when the winner holds ≥ τ of the scene's earlier gendered
        # event mass (a non-dominant winner is a coin flip that costs
        # precision; measured in the BASELINE.md round-5 sweep)
        dom_tau = 0.0 if pool_anchor is True else float(pool_anchor)
        wtot = Window.partitionBy("scene_id", "g")
        anchors = (
            cand.withColumn("_rk", F.row_number().over(wpick))
            .withColumn(
                "_share", F.col("prior_cnt") / F.sum("prior_cnt").over(wtot)
            )
            .filter((F.col("_rk") == 1) & (F.col("_share") >= dom_tau))
            .select(
                "scene_id", F.col("g").alias("mg"),
                F.col("ref").alias("_pool_anchor"),
            )
        )
        m = m.join(F.broadcast(anchors), ["scene_id", "mg"], "left")
        is_pool = (
            F.col("ref_raw").isNull()
            & _pseudo_any0.isNull()
            & F.col("kind").isin("p3m", "p3f")
            & F.col("_pool_anchor").isNotNull()
        )
        m = m.withColumn(
            "auto_ref", F.when(is_pool, F.col("_pool_anchor")).otherwise(F.col("auto_ref"))
        ).withColumn(
            "ref_raw", F.when(is_pool, F.col("_pool_anchor")).otherwise(F.col("ref_raw"))
        )
    if label_vocab is not None:
        from character_identification_spark.functions.lexicon import coarsen_to_vocab

        m = m.withColumn("auto_ref", coarsen_to_vocab("auto_ref", label_vocab))

    # Cluster key precedence: resolved referent → pseudo "n:<surface>"
    # key (learned modes: a pronoun whose best antecedent is a
    # cast-UNMATCHED name clusters with that name's mentions; the
    # unmatched NAME mentions themselves key by their own norm so the
    # pair actually forms — standalone same-norm clustering without
    # pronoun attachment was measured at −0.0005 dev F1, but WITH
    # attachment the sweep selects it) → per-scene gender pool →
    # singleton.
    _pseudo_any = F.coalesce(F.col("_pseudo3"), F.col("_pseudo2"), F.col("_pseudoN"))
    pseudo_key = F.when(
        _pseudo_any.isNotNull(), F.concat(F.lit("n:"), _pseudo_any)
    )
    name_norm_key = (
        F.when(
            (F.col("kind") == "name") & (F.col("norm") != ""),
            F.concat(F.lit("n:"), F.col("norm")),
        ).when(
            # unresolved nominals cluster by their HEAD within the scene
            # ("my dad" ∪ "dad" — usually the same dad; "nm:" prefix so a
            # person literally NAMED Guy never merges with "the guy").
            # Joining the shared g: pools instead was measured and
            # rejected on dev (see BASELINE.md round-3 notes).
            F.col("kind") == "nom",
            F.concat(F.lit("nm:"), nominal_head("norm")),
        )
        if learned_needed
        else F.lit(None).cast("string")
    )
    key = F.coalesce(
        F.col("ref_raw"),
        pseudo_key,
        name_norm_key,
        F.when(
            (F.col("kind") != "nom") & F.col("mg").isNotNull(),
            F.concat(F.lit("g:"), F.col("mg")),
        ),
        F.concat(F.lit("u:"), F.col("mention_uid").cast("string")),
    )
    # M5 multi-membership: a plural mention refers to a label SET — "we"
    # covers the speaker AND the addressee (reference keeps a referent
    # list per mention, state.py:14,31-37). auto_ref stays the primary
    # (speaker, the reference's closest-previous-speaker pick for plurals,
    # baseline/tools/ioutils.py:139-151); auto_refs carries the full set.
    ppl_set = F.array_distinct(
        F.filter(
            F.array(F.col("spk"), F.col("prev_spk")), lambda x: x.isNotNull()
        )
    )
    if learned_needed and PPL_WEIGHTS is not None and PPL_TAU is not None:
        # M5 LEARNED multi-label gate (reference linking_joint.py:71-91):
        # per-candidate sigmoid membership, UNIONED with the rule set —
        # the gate gap-fills participants the speaker/prev-speaker rule
        # cannot see ("they" = two characters named earlier in the scene)
        ppl_set = F.array_distinct(
            F.concat(
                ppl_set,
                F.coalesce(
                    learned_members("cands", PPL_WEIGHTS, PPL_TAU),
                    F.array().cast("array<string>"),
                ),
            )
        )
    single_set = F.when(
        F.col("auto_ref").isNotNull(), F.array(F.col("auto_ref"))
    ).otherwise(F.array().cast("array<string>"))
    auto_refs = F.when(F.col("kind") == "ppl", ppl_set).otherwise(single_set)
    if learned_needed and P2_WEIGHTS is not None and P2M_TAU is not None:
        # "you" is NUMBER-AMBIGUOUS: 96 of dev's 415 plural golds sit on
        # second-person mentions that the single-label decode can only
        # give one referent. The SAME trained P2 head (its training rows
        # are membership labels — y = ref ∈ gold_refs, plural included)
        # gates extra members at a HIGHER threshold τ_p2m, unioned with
        # the argmax pick (reference joint model analog,
        # linking_joint.py:71-91).
        auto_refs = F.when(
            F.col("kind") == "p2",
            F.array_distinct(
                F.concat(
                    single_set,
                    F.coalesce(
                        learned_members("cands", P2_WEIGHTS, P2M_TAU),
                        F.array().cast("array<string>"),
                    ),
                )
            ),
        ).otherwise(auto_refs)
    if label_vocab is not None:  # F4 applies to every linking label
        auto_refs = F.array_distinct(
            F.transform(
                auto_refs,
                lambda x: F.when(x.isin(*label_vocab), x).otherwise(
                    F.lit("#other#")
                ),
            )
        )
    return m.select(
        "mention_uid",
        F.concat(F.col("scene_id"), F.lit("|"), key).alias("cluster_id"),
        "auto_ref",
        auto_refs.alias("auto_refs"),
        "kind",
        F.col("scene_id").alias("block_key"),
    )


def membership_rows(assign: DataFrame) -> DataFrame:
    """Linker output → membership rows (mention_uid, block_key,
    cluster_id), one row PER label in auto_refs (scene-scoped label
    clusters); mentions with no resolved label keep their singleton/pool
    cluster row. This is the M5 multi-membership table that
    evaluation.pairf1.pairwise_f1_multi / b_cubed_multi consume."""
    from character_identification_spark.evaluation.pairf1 import AMBIGUOUS

    linkable = F.filter(
        "auto_refs", lambda x: ~x.isin(*AMBIGUOUS)
    )  # ambiguous labels never co-refer — no cluster membership from them
    withl = assign.withColumn("linkable", linkable)
    multi = (
        withl.filter(F.size("linkable") > 0)
        .select("mention_uid", "block_key", F.explode("linkable").alias("ref"))
        .select(
            "mention_uid",
            "block_key",
            F.concat("block_key", F.lit("|"), F.col("ref")).alias("cluster_id"),
        )
    )
    single = withl.filter(F.size("linkable") == 0).select(
        "mention_uid", "block_key", "cluster_id"
    )
    return multi.unionByName(single)
